"""Detection batch-scaling curve on the real TPU (ROADMAP candidate #2).

The reference trains Faster R-CNN at b2 per GPU (`Detection/sh/voc2007/
clean50/090_final_setting1.sh` uses 2 imgs/GPU); bench.py reports the
flagship A-FAN step at that geometry. This script measures the flagship
step at b1/b2/b4(/b8 if it fits) to answer: is b2 latency-bound on the
v5e (i.e. does imgs/s/chip keep rising with batch), and what is the
envelope TF/s the chip reaches on this workload?  Mirrors
scripts/alfa_batch_scaling.py (VERDICT r3 #5 pattern).

Timing methodology (ROADMAP.md): steps chain through the donated
TrainState, one loss fetch per window, min over windows. Compile once
and reuse the compiled object (remote-compile double-compile hang).

Run: python scripts/det_batch_scaling.py   (~20-30 min: 3-4 flagship
compiles at distinct batch shapes)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from afan.models.frcnn import FRCNNConfig, FasterRCNN
from afan.train.detect_loop import (DetAfanConfig, detection_tx,
                                    make_afan_det_step)
from afan.train.loop import TrainState

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


def run(b, iters=10, windows=3):
    images, boxes, labels, valid = batch_inputs(b)
    state = TrainState.create(variables, tx)
    try:
        compiled = step.lower(state, images, boxes, labels, valid,
                              key).compile()
    except Exception as e:  # OOM at large b: record and move on
        print(f"b{b}: compile failed ({type(e).__name__}: {e})",
              flush=True)
        return
    fl = 0.0
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = float(cost.get("flops", 0.0))
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
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            one()
        _ = float(holder["m"]["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    tfs = fl / best / 1e12 if fl else 0.0
    print(f"b{b}: {best*1e3:.1f} ms/step, {b/best:.2f} imgs/s, "
          f"{fl/1e9:.0f} GFLOP ({fl/max(b,1)/1e9:.0f}/img), "
          f"{tfs:.1f} TF/s ({tfs*1e12/PEAK_TFS*100:.0f}% of bf16 peak)",
          flush=True)


for b in (1, 2, 4, 8):
    run(b)
print("done", flush=True)
