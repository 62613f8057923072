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
    step_mode: str = "sign",
    random_steps: bool = False,
    bailout_tol: Optional[float] = None,
) -> jnp.ndarray:
    """k-step gradient ascent on ``x`` maximizing ``loss_fn``.

    ``x`` is treated as a constant (the reference detaches the tapped
    feature before attacking it); the returned adversarial tensor carries no
    gradient back to ``x``'s producer — callers should
    ``jax.lax.stop_gradient`` the input feature, as all drivers here do.

    Default step order matches the reference exactly: grad →
    ``+= gamma * sign`` → optional L∞ projection onto the eps-ball around
    the ORIGINAL ``x`` (`Classification/attack_algo.py:47-56`).

    Technique flags beyond the reference (both default OFF; see PAPERS.md):
    * ``step_mode='grad'`` — raw-gradient direction, normalized per sample
      to unit L∞ so the step magnitude stays comparable to sign steps
      ("Rethinking PGD Attack: Is Sign Function Necessary?",
      arxiv 2312.01260);
    * ``random_steps=True`` — per-step step size drawn uniformly from
      ``(0, 2*gamma)`` (mean ``gamma``; WITCHcraft, arxiv 1911.07989).
      Requires ``rng``.
    * ``bailout_tol=t`` — EVAL-ONLY early bailout ("Stop Walking in
      Circles!", arxiv 2503.19347, adapted to a TPU-static form): the
      ascent becomes a ``lax.while_loop`` that stops once the relative
      loss change between consecutive iterates drops to ``<= t`` (loss
      plateau — the batch-global proxy for the paper's per-sample cycle
      detection; a jitted loop cannot retire samples individually
      without dynamic shapes). Saves real wall-clock only for long
      attacks (robustness evals with tens of steps) — training recipes
      use 1-5 steps where the static ``scan`` is faster to compile and
      reverse-differentiable; ``while_loop`` is not, so this must stay
      off inside any loss being differentiated.
    """
    if step_mode not in ("sign", "grad"):
        raise ValueError(f"unknown step_mode {step_mode!r}")
    x0 = x
    if randinit:
        if rng is None:
            raise ValueError("randinit=True requires an rng key")
        if eps is None:
            raise ValueError("randinit=True requires eps")
        x0 = x0 + uniform_init(rng, x.shape, eps, x.dtype)

    grad_fn = jax.grad(loss_fn)

    if random_steps:
        if rng is None:
            raise ValueError("random_steps=True requires an rng key")
        gammas = 2.0 * gamma * jax.random.uniform(
            jax.random.fold_in(rng, 0x57C4), (steps,), x.dtype)
    else:
        gammas = jnp.full((steps,), gamma, x.dtype)

    def direction(g):
        if step_mode == "sign":
            return jnp.sign(g)
        flat = jnp.abs(g).reshape(g.shape[0], -1) if g.ndim > 1 else \
            jnp.abs(g).reshape(1, -1)
        gmax = jnp.max(flat, axis=1)
        gmax = gmax.reshape((-1,) + (1,) * (g.ndim - 1)) if g.ndim > 1 \
            else gmax
        return g / jnp.maximum(gmax, 1e-12)

    def body(x_adv, gamma_t):
        g = grad_fn(x_adv)
        x_adv = x_adv + gamma_t * direction(g)
        if clip:
            if eps is None:
                raise ValueError("clip=True requires eps")
            x_adv = linfball_proj(x, eps, x_adv)
        return x_adv, None

    if bailout_tol is None:
        x_adv, _ = jax.lax.scan(body, x0, gammas)
        return x_adv

    vg_fn = jax.value_and_grad(loss_fn)
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)

    def w_cond(carry):
        i, _, _, delta = carry
        return jnp.logical_and(i < steps, delta > bailout_tol)

    def w_body(carry):
        i, x_adv, prev, _ = carry
        loss, g = vg_fn(x_adv)
        x_adv = x_adv + gammas[i] * direction(g)
        if clip:
            if eps is None:
                raise ValueError("clip=True requires eps")
            x_adv = linfball_proj(x, eps, x_adv)
        loss = loss.astype(jnp.float32)
        delta = jnp.abs(loss - prev) / jnp.maximum(jnp.abs(loss), 1.0)
        return i + 1, x_adv, loss, delta

    _, x_adv, _, _ = jax.lax.while_loop(
        w_cond, w_body, (jnp.asarray(0), x0, big, big))
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
