"""Selective backbone-remat sweep for the seg A-FAN step at 768 crop.

Hypothesis (ROADMAP "768 regression"): the composed 768-crop step drops
from 29 to 22 TF/s while its isolated convs get FASTER per FLOP — i.e.
the regression is HBM pressure (spills / worse layouts), not kernel
efficiency. Selective remat — rematerialize only the early stages, whose
activations are the largest per FLOP (layer1 at stride 4 holds 9x the
pixels of layer4 at 16x fewer channels-FLOPs) — should recover most of
remat's memory cut at a fraction of its recompute.

Sweeps remat masks over layer1..4 at the city-final config
(`Segmentation/sh/city/clean50/091_city_final01.sh` geometry: b4, 768,
os16, mix_sd + AFN mask 001) and prints XLA's memory_analysis next to
the honest chained step time.

Run: python scripts/seg_remat_sweep.py   (~15 min incl. compiles)
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
                                     segmentation_tx)

V5E_PEAK = 197e12


def time_mask(remat, images, labels, ncls, iters=10):
    tx = segmentation_tx(lambda c: 0.1)
    model = build_model("deeplabv3plus_resnet50", ncls, 16, jnp.bfloat16,
                        backbone_remat=remat)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           images[:1], False)
    step = make_afan_seg_step(model, tx, SegAfanConfig(
        mix_mask=(0, 0, 1), mix_sd=True))
    state = TrainState.create(variables, tx)
    compiled = step.lower(state, images, labels, key).compile()
    label = f"remat={remat!s:18s}"
    fl = 0.0
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = float(cost.get("flops", 0.0))
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        print(f"{label}: temp {mem.temp_size_in_bytes/2**30:.2f} GiB, "
              f"args {mem.argument_size_in_bytes/2**30:.2f} GiB, "
              f"flops {fl/1e9:.0f} G", flush=True)
    except Exception as e:
        print(f"{label}: no memory analysis ({type(e).__name__})",
              flush=True)
    holder = {"s": TrainState.create(variables, tx), "i": 0}

    def one():
        holder["i"] += 1
        holder["s"], holder["m"] = compiled(
            holder["s"], images, labels, jax.random.fold_in(key, holder["i"]))

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
        msg += (f" -> {fl/best/1e12:.1f} TF/s ({fl/best/V5E_PEAK*100:.0f}%"
                f" of peak)")
    print(msg, flush=True)
    # free the compiled program + state before the next variant
    del compiled, holder, state
    return best


def main(crop=768, batch=4, ncls=19):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, crop, crop, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, ncls, (batch, crop, crop)),
                         jnp.int32)
    print(f"=== seg A-FAN city-final, crop {crop} b{batch} ===", flush=True)
    for remat in [False, True,
                  (True, False, False, False),
                  (True, True, False, False),
                  (True, True, True, False)]:
        time_mask(remat, images, labels, ncls)


if __name__ == "__main__":
    main()
