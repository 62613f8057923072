"""Measure the learnable-eta step's FLOPs via XLA's own HLO cost analysis.

bench.py's ``learnable_train_mfu_pct`` line needs the per-step FLOPs, but
on this TPU runtime neither of the usual routes works for THIS program:

* ``step.lower(...).compile()`` against the tunneled axon backend hung
  the remote compile >15 min (measured rc=124, round 5) even though the
  direct jitted call compiles the identical program fine;
* ``Lowered.cost_analysis()`` returns ``None`` on the axon backend (it
  works on CPU — verified).

So this script compiles the IDENTICAL program on the in-process CPU
backend (args committed to the CPU device pick the lowering platform;
no tunnel involved) and prints XLA's flops — the constant bench.py
embeds. Re-run it if the learnable step (afan/train/loop.py,
`Classification/main_learnable.py:202-253` parity) ever changes shape.

Measured 2026-08-19: lower 113s, compile 104s, flops 8.378e11 at b128
(= 6.5 GFLOP/img ~= 50 fwd-equivalents of ResNet-56's 0.13 GFLOP fwd,
consistent with the 9-head + 9x3-ascent + 9-scaled + clean structure).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from afan.models.resnet_s import resnet56
from afan.train.loop import LearnableConfig, TrainState, make_learnable_step
from afan.train.optim import learnable_tx


def main(batch=128):
    model = resnet56(init_weight_eta=1.0 / 9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(batch, 32, 32, 3),
                    jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randint(0, 10, batch))
    variables = model.init(rng, x[:2], 0, None, False)

    # identical construction to bench.py's (shared factory — the whole
    # point: the FLOP constant is only valid for the identical program)
    tx = learnable_tx(lambda c: 0.1)
    state = TrainState.create(variables, tx)
    step = make_learnable_step(model, tx, LearnableConfig())

    cpu = jax.devices("cpu")[0]
    args = jax.device_put((state, x, y, rng), cpu)
    t0 = time.perf_counter()
    low = step.lower(*args)
    t1 = time.perf_counter()
    comp = low.compile()
    t2 = time.perf_counter()
    cost = comp.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost["flops"])
    print(f"lower {t1 - t0:.1f}s compile {t2 - t1:.1f}s "
          f"flops {flops:.4e} at b{batch} "
          f"({flops / batch / 1e9:.2f} GFLOP/img)")


if __name__ == "__main__":
    main()
