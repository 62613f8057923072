#!/bin/bash
# Round-4 hardware work queue — run when the axon tunnel is up.
# Sequential (tracing/lowering is local on the 1-core host).
cd /root/repo
echo "=== tunnel probe ==="
if ! timeout 90 python -c "import jax; print(len(jax.devices()))"; then
  echo "TUNNEL DOWN — aborting queue"
  exit 7
fi
echo "=== fused-CE Mosaic smoke ==="
timeout 1200 python scripts/smoke_fused_ce_tpu.py 2>&1 | tee /tmp/r4_smoke_fused.log
echo "=== seg fused A/B ==="
timeout 2400 python scripts/bench_seg_fused.py 2>&1 | tee /tmp/r4_seg_fused.log
echo "=== full bench ==="
timeout 2400 python bench.py 2>&1 | tee /tmp/r4_bench.log
echo "=== alfa batch scaling ==="
timeout 2400 python scripts/alfa_batch_scaling.py 2>&1 | tee /tmp/r4_alfa_scaling.log
echo "=== nms kernel ==="
timeout 1200 python scripts/bench_nms.py 2>&1 | tee /tmp/r4_nms.log
echo "=== queue done ==="
