"""Flagship + baseline detection step: honest chained timing + XLA cost
analysis (FLOPs, bytes, achieved TF/s vs the v5e bf16 peak).

Methodology: steps are chained through the donated TrainState and synced
by fetching the final loss value (see ROADMAP.md on why block_until_ready
and independent dispatches both mis-time on this runtime). Stage-level
(non-chained) timings live in profile_det_stages.py.

Run: python scripts/profile_det.py   (~25 min incl. 3 flagship compiles)
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
                                    make_afan_det_step,
                                    make_baseline_det_step)
from afan.train.loop import TrainState

B, H, W = 2, 608, 1008
model = FasterRCNN(cfg=FRCNNConfig(backbone="resnet50", num_classes=21),
                   dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
images = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
boxes = jnp.tile(jnp.asarray([[[100.0, 100, 400, 300],
                               [50.0, 200, 250, 500]]]), (B, 1, 1))
labels = jnp.ones((B, 2), jnp.int32)
valid = jnp.ones((B, 2), bool)
key = jax.random.PRNGKey(0)
variables = model.init({"params": key}, images[:1], boxes[:1], labels[:1],
                       valid[:1], jax.random.PRNGKey(1), method=model.losses)
tx = detection_tx(lambda c: 0.001)


def run(step, label, iters=10):
    state = TrainState.create(variables, tx)
    # Compile ONCE and reuse the compiled object for both cost analysis
    # and the timed calls — calling the jitted fn after lower().compile()
    # recompiles the identical program, the documented remote-compile
    # hang mode (CLAUDE.md; profile_seg.py carries the same fix).
    compiled = step.lower(state, images, boxes, labels, valid,
                          key).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = float(cost.get("flops", 0.0))
        by = float(cost.get("bytes accessed", 0.0))
        print(f"{label}: {fl/1e9:.1f} GFLOP, {by/1e9:.2f} GB accessed")
    except Exception as e:
        print(f"{label}: no cost analysis ({type(e).__name__})")
        fl = 0
    holder = {"s": TrainState.create(variables, tx), "i": 0}

    def one():
        holder["i"] += 1
        holder["s"], holder["m"] = compiled(
            holder["s"], images, boxes, labels, valid,
            jax.random.fold_in(key, holder["i"]))

    one(); one(); _ = float(holder["m"]["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            one()
        _ = float(holder["m"]["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label}: {best*1e3:.1f} ms/step"
          + (f" -> {fl/best/1e12:.1f} TF/s achieved "
             f"({fl/best/197e12*100:.0f}% of peak)" if fl else ""))


run(make_baseline_det_step(model, tx), "baseline")
# share_proposals=True is the DEFAULT; the reference-exact resampling
# trajectory is the share_proposals=False ablation (PARITY.md div. 8).
run(make_afan_det_step(model, tx, DetAfanConfig(share_proposals=False)),
    "flagship (reference-exact resampling)")
run(make_afan_det_step(model, tx, DetAfanConfig()),
    "flagship+share (stock defaults)")
