"""Feature- and input-space PGD as pure, jit-compilable JAX functions.

The reference implements four near-identical PGD ascent loops — one per task
stack plus head variants (`Classification/attack_algo.py:38-58`,
`Detection/attack_algo.py:48-150`, `Segmentation/attack_algo.py:40-84`,
``adv_input``/``eval_PGD``): each runs a python loop of
``forward → grad → x += gamma * sign(grad) → [project]`` with
``torch.autograd.grad`` against a model re-forward.

Here there is exactly ONE ascent, :func:`pgd`, parameterized by a *loss
closure* ``loss_fn(x_adv) -> scalar``:

* classification ALFA: closure = CE of the tail forward from the tapped
  feature (`Classification/attack_algo.py:50-53`);
* detection SE: closure = sum of the 4 Faster R-CNN losses of the tail
  forward (`Detection/attack_algo.py:57-68`);
* detection SD ('roi'): closure = roi-only (or all-4) losses of the
  roi_tail forward (`Detection/attack_algo.py:92-111`);
* segmentation SE / decoder SD: closure = CE of the corresponding tail
  (`Segmentation/attack_algo.py:40-84`);
* input PGD: closure = full clean-forward loss (`adv_input``).

The loop body is a ``lax.scan`` so the whole k-step ascent traces once and
compiles into the surrounding train step; XLA fuses the sign-update and
projection into the backward pass of the tail (see
``afan.ops.kernels.pgd_step`` for the hand-fused Pallas variant of the
update used on large feature maps).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .project import linfball_proj

LossFn = Callable[[jnp.ndarray], jnp.ndarray]


def uniform_init(rng: jax.Array, shape, scale, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform noise in ``(-scale, scale)``.

    Matches the reference's rand-init ``(2*rand-1)*eps``
    (`Classification/attack_algo.py:43-45`) and the ``noise_sd`` injection
    (`Detection/train_aug_final.py:113-115`).
    """
    return (2.0 * jax.random.uniform(rng, shape, dtype=dtype) - 1.0) * scale


def pgd(
    loss_fn: LossFn,
    x: jnp.ndarray,
    *,
    steps: int,
    gamma: float,
    eps: Optional[float] = None,
    randinit: bool = False,
    clip: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """k-step sign-gradient ascent on ``x`` maximizing ``loss_fn``.

    ``x`` is treated as a constant (the reference detaches the tapped
    feature before attacking it); the returned adversarial tensor carries no
    gradient back to ``x``'s producer — callers should
    ``jax.lax.stop_gradient`` the input feature, as all drivers here do.

    Step order matches the reference exactly: grad → ``+= gamma * sign`` →
    optional L∞ projection onto the eps-ball around the ORIGINAL ``x``
    (`Classification/attack_algo.py:47-56`).
    """
    x0 = x
    if randinit:
        if rng is None:
            raise ValueError("randinit=True requires an rng key")
        if eps is None:
            raise ValueError("randinit=True requires eps")
        x0 = x0 + uniform_init(rng, x.shape, eps, x.dtype)

    grad_fn = jax.grad(loss_fn)

    def body(x_adv, _):
        g = grad_fn(x_adv)
        x_adv = x_adv + gamma * jnp.sign(g)
        if clip:
            if eps is None:
                raise ValueError("clip=True requires eps")
            x_adv = linfball_proj(x, eps, x_adv)
        return x_adv, None

    x_adv, _ = jax.lax.scan(body, x0, None, length=steps)
    return x_adv


def input_pgd(
    loss_fn: LossFn,
    x: jnp.ndarray,
    *,
    steps: int,
    gamma: float,
    eps: Optional[float] = None,
    randinit: bool = False,
    clip: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Input-space PGD: :func:`pgd` followed by a clamp to ``[0, 1]``.

    Reference: ``adv_input`` (`Detection/attack_algo.py:153-178`,
    `Segmentation/attack_algo.py:86-105`) and ``eval_PGD``
    (`Detection/attack_algo.py:207-233`, no final clamp there — use
    :func:`pgd` directly for that robustness-eval variant).
    """
    x_adv = pgd(loss_fn, x, steps=steps, gamma=gamma, eps=eps,
                randinit=randinit, clip=clip, rng=rng)
    return jnp.clip(x_adv, 0.0, 1.0)


def perturbation_norms(clean: jnp.ndarray, adv: jnp.ndarray):
    """Per-sample (L2, L∞) norms of ``adv - clean``, flattened per sample.

    Telemetry parity with `Classification/main_perturb.py:187-192`.
    Returns two ``(batch,)`` arrays.
    """
    delta = (adv - clean).reshape(clean.shape[0], -1)
    l2 = jnp.linalg.norm(delta, axis=1)
    linf = jnp.max(jnp.abs(delta), axis=1)
    return l2, linf
