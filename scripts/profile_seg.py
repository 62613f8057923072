"""A-FAN segmentation step: honest chained timing + XLA cost analysis.

Same methodology as profile_det.py (chained donated-state steps, value
fetch, cost_analysis FLOPs → achieved TF/s vs the v5e bf16 peak). Also
probes the baseline (non-A-FAN) step and an output_stride-16 vs -8
comparison, since dilated convolutions are the usual MXU-efficiency
suspect in DeepLab.

Run: python scripts/profile_seg.py   (~15 min incl. compiles)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from afan.models.deeplab.modeling import build_model
from afan.train.loop import TrainState
from afan.train.segment_loop import (SegAfanConfig, make_afan_seg_step,
                                     make_seg_base_step, segmentation_tx)

V5E_PEAK = 197e12


def run(step, variables, tx, images, labels, label, iters=20):
    state = TrainState.create(variables, tx)
    key = jax.random.PRNGKey(0)
    try:
        cost = step.lower(state, images, labels, key).compile(
        ).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = float(cost.get("flops", 0.0))
        by = float(cost.get("bytes accessed", 0.0))
        print(f"{label}: {fl/1e9:.1f} GFLOP, {by/1e9:.2f} GB accessed",
              flush=True)
    except Exception as e:
        print(f"{label}: no cost analysis ({type(e).__name__})", flush=True)
        fl = 0
    holder = {"s": TrainState.create(variables, tx), "i": 0}

    def one():
        holder["i"] += 1
        holder["s"], holder["m"] = step(holder["s"], images, labels,
                                        jax.random.fold_in(key, holder["i"]))

    one(); one(); _ = float(holder["m"]["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            one()
        _ = float(holder["m"]["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    msg = f"{label}: {best*1e3:.1f} ms/step"
    if fl:
        msg += (f" -> {fl/best/1e12:.1f} TF/s achieved "
                f"({fl/best/V5E_PEAK*100:.0f}% of peak)")
    print(msg, flush=True)


def main():
    batch, crop, ncls = 4, 512, 19
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, crop, crop, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, ncls, (batch, crop, crop)),
                         jnp.int32)
    key = jax.random.PRNGKey(0)
    tx = segmentation_tx(lambda c: 0.1)

    for os_ in (16, 8):
        model = build_model("deeplabv3plus_resnet50", ncls, os_,
                            jnp.bfloat16)
        variables = model.init({"params": key, "dropout": key},
                               images[:1], False)
        run(make_seg_base_step(model, tx), variables, tx, images,
            labels, f"baseline os{os_}")
        if os_ == 16:
            run(make_afan_seg_step(model, tx, SegAfanConfig()), variables,
                tx, images, labels, f"afan     os{os_}")


if __name__ == "__main__":
    main()
