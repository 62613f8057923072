"""Optimizers and LR schedules (optax), matching torch semantics.

The reference uses torch SGD(momentum, weight_decay) everywhere with three
schedules:

* MultiStepLR with a linear warmup over epoch 0
  (`Classification/main_perturb.py:76-78,288-293`);
* WarmUpMultiStepLR: lr * (factor + (1-factor) * min(step/num_iters, 1)),
  stepped per iteration (`Detection/extension/lr_scheduler.py:7-21`);
* PolyLR: lr * (1 - step/max_steps)^0.9 (`Segmentation/utils/scheduler.py:3-11`).

torch SGD applies weight decay by adding ``wd * param`` to the gradient
BEFORE the momentum buffer update; ``optax.chain(add_decayed_weights,
trace)`` reproduces this exactly (not decoupled AdamW-style decay).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def multistep_warmup_schedule(
    base_lr: float,
    milestones_steps: Sequence[int],
    gamma: float = 0.1,
    warmup_steps: int = 0,
) -> optax.Schedule:
    """Epoch-0 linear warmup + multi-step decay, in units of optimizer steps.

    Warmup parity with ``warmup_lr`` (`Classification/main_perturb.py:288-293`):
    ``lr = min(step * max_lr / (warmup_steps - 1), max_lr)`` for the first
    ``warmup_steps`` steps; thereafter the MultiStepLR staircase.
    """
    milestones = sorted(milestones_steps)

    def schedule(count):
        lr = jnp.asarray(base_lr, jnp.float32)
        for m in milestones:
            lr = jnp.where(count >= m, lr * gamma, lr)
        if warmup_steps > 1:
            warm = jnp.minimum(count * base_lr / (warmup_steps - 1), base_lr)
            lr = jnp.where(count < warmup_steps, warm, lr)
        return lr

    return schedule


def warmup_multistep_schedule(
    base_lr: float,
    milestones_steps: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 3.0,
    warmup_iters: int = 500,
) -> optax.Schedule:
    """Detection's WarmUpMultiStepLR (`Detection/extension/lr_scheduler.py:13-21`):
    ``lr * gamma^bisect(milestones, step) * (factor + (1-factor)*alpha)``
    where ``alpha = min(step / warmup_iters, 1)``."""
    milestones = sorted(milestones_steps)

    def schedule(count):
        lr = jnp.asarray(base_lr, jnp.float32)
        for m in milestones:
            lr = jnp.where(count >= m, lr * gamma, lr)
        alpha = jnp.minimum(count / max(warmup_iters, 1), 1.0)
        return lr * (warmup_factor + (1.0 - warmup_factor) * alpha)

    return schedule


def poly_schedule(base_lr: float, max_steps: int, power: float = 0.9,
                  min_lr: float = 1e-6) -> optax.Schedule:
    """Segmentation's per-iteration PolyLR (`Segmentation/utils/scheduler.py:8-11`),
    including its default ``min_lr=1e-6`` floor (`scheduler.py:4`) — only
    reachable in the last handful of iterations, but parity is parity."""

    def schedule(count):
        frac = jnp.clip(1.0 - count / max_steps, 0.0, 1.0)
        return jnp.maximum(base_lr * frac ** power, min_lr)

    return schedule


def sgd(
    schedule: optax.Schedule,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """torch.optim.SGD parity: grad += wd*param, then momentum trace."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def sgd_with_param_groups(
    schedule: optax.Schedule,
    label_fn,
    group_lr_scales: dict,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Per-parameter-group LR scaling (e.g. segmentation backbone lr x 0.1,
    `Segmentation/main_aug_final.py:79-82`).

    ``label_fn(params) -> pytree of labels``; each label maps to an lr scale.
    Weight decay and momentum apply uniformly, as in the reference where
    groups differ only in lr.
    """
    transforms = {
        label: sgd(lambda c, s=scale: schedule(c) * s,
                   momentum=momentum, weight_decay=weight_decay)
        for label, scale in group_lr_scales.items()
    }
    return optax.multi_transform(transforms, label_fn)


def learnable_tx(
    schedule: optax.Schedule,
    w_lr: float = 0.01,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
) -> optax.GradientTransformation:
    """The learnable-eta trainer's two-group optimizer
    (`Classification/main_learnable.py:202-253`): model params under
    SGD(schedule, momentum, wd); the eta vector ``w`` (the ResNetS
    top-level ``w`` param) under SGD(w_lr, momentum, wd=0).

    ONE construction shared by the CLI, bench.py, the multichip dryrun,
    and scripts/learnable_flops.py — bench.py's learnable MFU line embeds
    the FLOP count learnable_flops.py measures, which is only valid
    while all sites build the identical program (round-5 code review).
    """
    import jax

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "w" if path[0].key == "w" else "model", params)

    return optax.multi_transform(
        {"model": sgd(schedule, momentum, weight_decay),
         "w": sgd(lambda c: w_lr, momentum, 0.0)}, label_fn)
