#!/bin/bash
# Round-4 hardware queue #2 — after the Mosaic block-spec fix to the
# fused resize+CE kernel (pad-H/tiled-output/g-outside rewrite).
# Sequential (tracing/lowering is local on the 1-core host).
cd /root/repo
echo "=== tunnel probe ==="
if ! timeout 90 python -c "import jax; print(len(jax.devices()))"; then
  echo "TUNNEL DOWN — aborting queue"
  exit 7
fi
echo "=== fused-CE Mosaic smoke (fixed kernel) ==="
timeout 1800 python scripts/smoke_fused_ce_tpu.py 2>&1 | tee /tmp/r4_smoke_fused2.log
echo "=== seg fused A/B (fixed kernel) ==="
timeout 2400 python scripts/bench_seg_fused.py 2>&1 | tee /tmp/r4_seg_fused2.log
echo "=== composed-graph anomaly probes (site multiplicity L/M/N) ==="
timeout 2400 python scripts/microbench_resize_ce.py 2>&1 | tee /tmp/r4_resize_ce.log
echo "=== detection stage isolation re-measure (r2 numbers untrusted) ==="
timeout 2400 python scripts/profile_det_stages.py 2>&1 | tee /tmp/r4_det_stages.log
echo "=== queue2 done ==="
