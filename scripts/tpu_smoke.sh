#!/bin/bash
# Standing on-chip kernel smoke (VERDICT r4 #3): run at the TOP of every
# hardware window, BEFORE any perf work. Validates through real Mosaic:
#   1. the fused resize+CE kernel — compile + fwd/grad parity on all six
#      recipe geometries (scripts/smoke_fused_ce_tpu.py, all_ok line);
#   2. the Pallas NMS kernel — exact-parity vs the jax reference at
#      n=12000 (tests/test_kernels.py golden covers CPU interpret mode;
#      this covers the TPU lowering).
# Appends a dated PASS/FAIL line to results/tpu_smoke_log.txt so every
# hardware session leaves a committed record. Exit nonzero on failure —
# a Mosaic compile regression must be loud (the CLI FallbackStep would
# otherwise hide it as a silent ~1.7x seg slowdown).
#
# Run: bash scripts/tpu_smoke.sh   (~6 min warm; needs the axon tunnel)
set -u
cd "$(dirname "$0")/.."
mkdir -p results
STAMP=$(date -u +"%Y-%m-%dT%H:%M:%SZ")
LOG=results/tpu_smoke_log.txt

# fast tunnel probe (a dead tunnel HANGS device queries; bound it)
if ! timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "$STAMP TUNNEL-DOWN (probe timed out/failed; smoke not run)" >> "$LOG"
  echo "tpu_smoke: tunnel down" >&2
  exit 2
fi

# capture stderr too: on a Mosaic compile regression the traceback IS
# the diagnostic — a bare fused_ce_ok=false record would force the next
# hardware session to re-run by hand (round-5 code review)
FUSED_OUT=$(timeout 1800 python scripts/smoke_fused_ce_tpu.py 2>&1)
FUSED_RC=$?
FUSED_OK=false
echo "$FUSED_OUT"
if [ $FUSED_RC -eq 0 ] && echo "$FUSED_OUT" | grep -q '"all_ok": true'; then
  FUSED_OK=true
fi

NMS_OUT=$(timeout 1200 python scripts/bench_nms.py --smoke 2>&1)
NMS_RC=$?
NMS_OK=false
echo "$NMS_OUT" | tail -4
if [ $NMS_RC -eq 0 ] && echo "$NMS_OUT" | grep -q "parity ok"; then
  NMS_OK=true
fi

if $FUSED_OK && $NMS_OK; then
  echo "$STAMP PASS fused_ce=all_ok nms=parity_ok" >> "$LOG"
  echo "tpu_smoke: PASS"
  exit 0
else
  echo "$STAMP FAIL fused_ce_ok=$FUSED_OK nms_ok=$NMS_OK" >> "$LOG"
  echo "tpu_smoke: FAIL (fused_ce_ok=$FUSED_OK nms_ok=$NMS_OK)" >&2
  exit 1
fi
