#!/bin/bash
# Round-4 hardware queue #3 — after setting precision=HIGHEST on the
# fused resize+CE kernel's five dot sites (the first on-chip smoke
# showed bf16-truncation-scale errors: grad rel err 0.3-0.7%).
# Sequential (tracing/lowering is local on the 1-core host).
cd /root/repo
echo "=== tunnel probe ==="
if ! timeout 90 python -c "import jax; print(len(jax.devices()))"; then
  echo "TUNNEL DOWN — aborting queue"
  exit 7
fi
echo "=== fused-CE Mosaic smoke (HIGHEST precision) ==="
timeout 1800 python scripts/smoke_fused_ce_tpu.py 2>&1 | tee /tmp/r4_smoke_fused3.log
echo "=== seg fused A/B (HIGHEST precision) ==="
timeout 2400 python scripts/bench_seg_fused.py 2>&1 | tee /tmp/r4_seg_fused3.log
echo "=== alfa batch scaling (import fixed) ==="
timeout 2400 python scripts/alfa_batch_scaling.py 2>&1 | tee /tmp/r4_alfa_scaling2.log
echo "=== full bench (final kernel) ==="
timeout 2400 python bench.py 2>&1 | tee /tmp/r4_bench2.log
echo "=== queue3 done ==="
