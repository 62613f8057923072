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
    # compile ONCE via lower().compile() and call the compiled object —
    # calling the jitted fn after a separate lower() used to trigger a
    # second remote compile, which intermittently hangs the axon runtime
    compiled = step.lower(state, images, labels, key).compile()
    try:
        cost = compiled.cost_analysis()
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
        holder["s"], holder["m"] = compiled(holder["s"], images, labels,
                                            jax.random.fold_in(key,
                                                               holder["i"]))

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


def make_frozen_bn_step(model, tx):
    """Clean step with EVAL-mode BN (running averages, no stat update):
    isolates the cost of train-mode BN (batch mean/var reductions after
    every conv) from the conv work itself."""
    from afan.train.loop import _apply_updates
    from afan.train.segment_loop import seg_cross_entropy

    def step_fn(state, images, labels, rng):
        def loss_fn(params):
            vs = {"params": params, "batch_stats": state.batch_stats}
            logits = model.apply(vs, images, False)
            return seg_cross_entropy(logits, labels), {}

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_params, new_opt = _apply_updates(tx, state, grads)
        return state.replace(params=new_params, opt_state=new_opt,
                             step=state.step + 1), {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,))


def battery(crop, ablations, batch=4, ncls=19, backbone_remat=True):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, crop, crop, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, ncls, (batch, crop, crop)),
                         jnp.int32)
    key = jax.random.PRNGKey(0)
    tx = segmentation_tx(lambda c: 0.1)
    model = build_model("deeplabv3plus_resnet50", ncls, 16, jnp.bfloat16,
                        backbone_remat=backbone_remat)
    variables = model.init({"params": key, "dropout": key},
                           images[:1], False)
    print(f"=== crop {crop} b{batch} os16 remat={backbone_remat} ===",
          flush=True)
    for name, mk in ablations:
        run(mk(model, tx), variables, tx, images, labels,
            f"{name:24s}", iters=10 if crop >= 768 else 20)


def main():
    afan = lambda m, tx: make_afan_seg_step(m, tx, SegAfanConfig())
    city = lambda m, tx: make_afan_seg_step(m, tx, SegAfanConfig(
        mix_mask=(0, 0, 1), mix_sd=True))  # city-final flags
    battery(512, [
        ("baseline", make_seg_base_step),
        ("frozen-bn baseline", make_frozen_bn_step),
        ("afan flagship", afan),
    ], backbone_remat=True)
    # the REAL tracked config 5 geometry (Cityscapes crop 768,
    # `Segmentation/sh/city/clean50/091_city_final01.sh`)
    battery(768, [
        ("baseline", make_seg_base_step),
        ("afan city-final", city),
    ], backbone_remat=True)
    battery(768, [
        ("afan city-final", city),
    ], backbone_remat=False)


if __name__ == "__main__":
    main()
