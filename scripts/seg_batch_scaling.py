"""Segmentation batch-scaling curve on the real TPU.

Completes the falsifiable-envelope trilogy (ALFA: alfa_batch_scaling,
detection: det_batch_scaling): the reference's tracked config 5 trains
DeepLabv3+ R50 at 768 crop with ``--batch_size 4``
(`Segmentation/sh/city/clean50/091_city_final01.sh:17`, single- or
dual-GPU DataParallel -> 2-4 imgs/device), so b4 IS the parity
operating point bench.py reports. This script asks: is b4 latency-bound
on the v5e (does imgs/s keep rising with batch), and what envelope TF/s
does the chip reach on the A-FAN seg step at 512/768 crops?

Methodology = det_batch_scaling.py post-ADVICE-r4: chained donated
TrainState, compile once and reuse, measured tunnel RTT
(`afan.utils.timing.measure_rtt` — first-fetches of fresh arrays, not
a cached re-fetch; probe fixed by the round-5 code review) subtracted
per window, iters scaled so the fetch residual is <1%. OOM at large b
is caught and reported (16 GB HBM; backbone remat is OFF by default in
the seg step).

Run (real TPU): python scripts/seg_batch_scaling.py  [--crop 768]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from afan.models.deeplab.modeling import build_model
from afan.train.loop import TrainState
from afan.train.segment_loop import (SegAfanConfig, make_afan_seg_step,
                                     segmentation_tx)
from afan.utils.timing import measure_rtt, time_chained_windows

PEAK_TFS = 197e12  # v5e bf16
NCLS = 19


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=768)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 2, 4, 8])
    args = ap.parse_args()
    crop = args.crop

    model = build_model("deeplabv3plus_resnet50", NCLS, 16, jnp.bfloat16)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    tx = segmentation_tx(lambda c: 0.1)
    x1 = jnp.asarray(rng.rand(1, crop, crop, 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, x1, False)
    # city-final flags (tracked config 5)
    step = make_afan_seg_step(model, tx, SegAfanConfig(
        mix_mask=(0, 0, 1), mix_sd=True))

    for b in args.batches:
        iters = {1: 40, 2: 20}.get(b, 10)
        images = jnp.asarray(rng.rand(b, crop, crop, 3), jnp.float32)
        labels = jnp.asarray(rng.randint(0, NCLS, (b, crop, crop)),
                             jnp.int32)
        state = TrainState.create(variables, tx)
        try:
            compiled = step.lower(state, images, labels, key).compile()
        except Exception as e:
            print(f"b{b}: compile failed ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            continue
        fl = None
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            fl = float(cost.get("flops", 0.0)) or None
        except Exception:
            pass
        holder = {"s": state, "i": 0}

        def one():
            holder["i"] += 1
            holder["s"], holder["m"] = compiled(
                holder["s"], images, labels,
                jax.random.fold_in(key, holder["i"]))

        try:
            one(); one(); _ = float(holder["m"]["loss"])
        except Exception as e:
            print(f"b{b}: execution failed ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            continue
        # Tunnel RTT probe: first-fetches of FRESH tiny arrays (re-fetching
        # an already-pulled buffer is a jax host-value cache hit reading
        # ~0, not a transfer — round-5 code-review catch).
        rtt = measure_rtt()
        best, _med = time_chained_windows(
            one, lambda: float(holder["m"]["loss"]), iters, 3, rtt)
        if fl is not None:
            tfs = fl / best / 1e12
            flop_txt = (f"{fl/1e9:.0f} GFLOP ({fl/b/1e9:.0f}/img), "
                        f"{tfs:.1f} TF/s "
                        f"({tfs*1e12/PEAK_TFS*100:.0f}% of bf16 peak)")
        else:
            flop_txt = "flops unavailable (cost_analysis failed)"
        print(f"crop{crop} b{b}: {best*1e3:.1f} ms/step, "
              f"{b/best:.2f} imgs/s, {flop_txt} "
              f"[rtt {rtt*1e3:.0f} ms subtracted, iters={iters}]",
              flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
