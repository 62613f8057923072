"""Detection batch-scaling curve on the real TPU (ROADMAP candidate #2).

The reference trains Faster R-CNN with ``--batch_size=8`` through an
``nn.DataParallel`` wrapper (`Detection/sh/voc2007/clean50/
090_final_setting1.sh:22-24`, `Detection/train_aug_final.py:28,35`), so
its per-device batch is 8/#GPUs — 8 on one GPU, 4 on two (the script
parameterizes ``CUDA_VISIBLE_DEVICES=${1}``). The parity-relevant
per-chip operating points are therefore b4-b8; bench.py's flagship line
uses b2 as a latency point. This script measures the flagship step at
b1/b2/b4/b8 to answer: where is the per-chip envelope, and what TF/s
does the chip reach at the reference's actual operating point? Mirrors
scripts/alfa_batch_scaling.py (VERDICT r3 #5 pattern).

Timing methodology (ROADMAP.md): steps chain through the donated
TrainState, one loss fetch per window, min over windows. Compile once
and reuse the compiled object (remote-compile double-compile hang).
The ~35 ms tunnel RTT of the per-window value fetch is measured
directly (`afan.utils.timing.measure_rtt`: first-fetches of fresh tiny
arrays — NOT a re-fetch of an already-pulled buffer, which jax serves
from its per-Array host cache at ~0 cost) and subtracted from each
window, and iters are scaled so the residual is <1% at every batch
size (ADVICE r4; probe fixed by the round-5 code review).

Run: python scripts/det_batch_scaling.py   (~20-30 min: 3-4 flagship
compiles at distinct batch shapes)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from afan.models.frcnn import FRCNNConfig, FasterRCNN
from afan.train.detect_loop import (DetAfanConfig, detection_tx,
                                    make_afan_det_step)
from afan.train.loop import TrainState
from afan.utils.timing import measure_rtt, time_chained_windows

H, W = 608, 1008
PEAK_TFS = 197e12  # v5e bf16

model = FasterRCNN(cfg=FRCNNConfig(backbone="resnet50", num_classes=21),
                   dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
key = jax.random.PRNGKey(0)
tx = detection_tx(lambda c: 0.001)


def batch_inputs(b):
    images = jnp.asarray(rng.rand(b, H, W, 3), jnp.float32)
    boxes = jnp.tile(jnp.asarray([[[100.0, 100, 400, 300],
                                   [50.0, 200, 250, 500]]]), (b, 1, 1))
    labels = jnp.ones((b, 2), jnp.int32)
    valid = jnp.ones((b, 2), bool)
    return images, boxes, labels, valid


images1, boxes1, labels1, valid1 = batch_inputs(1)
variables = model.init({"params": key}, images1, boxes1, labels1, valid1,
                       jax.random.PRNGKey(1), method=model.losses)
step = make_afan_det_step(model, tx, DetAfanConfig())


def run(b, iters=None, windows=3):
    # Scale iters so the per-window fetch RTT (~35 ms) is <1% of the
    # window even before subtraction (ADVICE r4: at b1/iters=10 the RTT
    # inflated the step ~7%).
    if iters is None:
        iters = {1: 40, 2: 20}.get(b, 10)
    images, boxes, labels, valid = batch_inputs(b)
    state = TrainState.create(variables, tx)
    try:
        compiled = step.lower(state, images, boxes, labels, valid,
                              key).compile()
    except Exception as e:  # OOM at large b: record and move on
        print(f"b{b}: compile failed ({type(e).__name__}: {e})",
              flush=True)
        return
    fl = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass
    holder = {"s": TrainState.create(variables, tx), "i": 0}

    def one():
        holder["i"] += 1
        holder["s"], holder["m"] = compiled(
            holder["s"], images, boxes, labels, valid,
            jax.random.fold_in(key, holder["i"]))

    try:
        one(); one(); _ = float(holder["m"]["loss"])
    except Exception as e:
        print(f"b{b}: execution failed ({type(e).__name__})", flush=True)
        return
    # Tunnel RTT probe: first-fetches of FRESH tiny arrays (re-fetching
    # an already-pulled buffer is a jax host-value cache hit reading ~0,
    # not a transfer — round-5 code-review catch), subtracted per window.
    rtt = measure_rtt()
    best, _med = time_chained_windows(
        one, lambda: float(holder["m"]["loss"]), iters, windows, rtt)
    if fl is not None:
        tfs = fl / best / 1e12
        flop_txt = (f"{fl/1e9:.0f} GFLOP ({fl/max(b,1)/1e9:.0f}/img), "
                    f"{tfs:.1f} TF/s "
                    f"({tfs*1e12/PEAK_TFS*100:.0f}% of bf16 peak)")
    else:
        flop_txt = "flops unavailable (cost_analysis failed)"
    print(f"b{b}: {best*1e3:.1f} ms/step, {b/best:.2f} imgs/s, "
          f"{flop_txt} [rtt {rtt*1e3:.0f} ms subtracted, iters={iters}]",
          flush=True)


for b in (1, 2, 4, 8):
    run(b)
print("done", flush=True)
