"""ALFA batch-scaling curve + op-level efficiency breakdown.

Answers VERDICT r3 weak #5: is the flagship ALFA step's ~15% MFU at the
reference batch (128) a latency/dispatch bound that a bigger batch would
lift, or the compute ceiling of ResNet-56s's tiny convs?

Two sections, each one JSON line per point:

  1. batch sweep b128..b2048 of the full ALFA step
     (`Classification/main_perturb.py` defaults) — imgs/s, ms/step, MFU
     from XLA cost analysis of the compiled program;
  2. ablations at b128 + the largest batch: plain clean fwd+bwd step vs
     the ALFA step — per-config TFLOP/s. If both run at the same TF/s,
     the attack machinery adds no inefficiency and the ceiling is the
     conv shapes themselves (CIFAR ResNet-56s channels are 16/32/64 —
     all below the 128-lane MXU width).

Timing per CLAUDE.md methodology: donated-state chaining (each step
consumes the previous step's state so dispatches can't overlap), one
value fetch per window, compiled object reused (a second compile of the
same program can hang the tunneled runtime).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from afan.models.resnet_s import resnet56
from afan.train.loop import (AlfaConfig, TrainState, make_alfa_step,
                             make_base_step)
from afan.train.optim import sgd

V5E_BF16_PEAK_FLOPS = 197e12


def _time_compiled(compiled, state, x, y, rng, iters, windows=3,
                   with_rng=True):
    holder = {"state": state, "i": 0}

    def run_one():
        holder["i"] += 1
        if with_rng:
            holder["state"], holder["m"] = compiled(
                holder["state"], x, y,
                jax.random.fold_in(rng, holder["i"]))
        else:
            holder["state"], holder["m"] = compiled(holder["state"], x, y)

    def sync():
        _ = float(holder["m"]["loss"])

    run_one(); run_one(); sync()   # warmup (post-compile)
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            run_one()
        sync()
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[0], times[len(times) // 2]


def _flops(compiled):
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def _setup(batch):
    model = resnet56(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(batch, 32, 32, 3),
                    jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randint(0, 10, batch))
    variables = model.init(rng, x[:2], 0, None, False)
    tx = sgd(lambda c: 0.1, momentum=0.9, weight_decay=5e-4)
    state = TrainState.create(variables, tx)
    return model, tx, state, x, y, rng


def bench_point(batch, kind="alfa", iters=50):
    model, tx, state, x, y, rng = _setup(batch)
    if kind == "alfa":
        step = make_alfa_step(model, tx, AlfaConfig())
        compiled = step.lower(state, x, y, rng).compile()
    else:
        step = make_base_step(model, tx)
        compiled = step.lower(state, x, y).compile()
    fl = _flops(compiled)
    mn, med = _time_compiled(compiled, state, x, y, rng, iters,
                             with_rng=kind == "alfa")
    rec = {"kind": kind, "batch": batch,
           "ms_per_step": round(med * 1e3, 3),
           "ms_min": round(mn * 1e3, 3),
           "imgs_per_sec": round(batch / med, 1)}
    if fl:
        rec["tflops_per_step"] = round(fl / 1e12, 4)
        rec["tf_per_sec"] = round(fl / med / 1e12, 2)
        rec["mfu_pct"] = round(fl / med / V5E_BF16_PEAK_FLOPS * 100, 2)
        rec["mfu_pct_min"] = round(fl / mn / V5E_BF16_PEAK_FLOPS * 100, 2)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    for batch in (128, 256, 512, 1024, 2048):
        bench_point(batch, "alfa", iters=50 if batch <= 512 else 20)
    for batch in (128, 2048):
        bench_point(batch, "base", iters=50 if batch <= 512 else 20)


if __name__ == "__main__":
    main()
