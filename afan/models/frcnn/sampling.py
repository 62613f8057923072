"""Static-shape foreground/background sampling.

The reference samples training examples with dynamically-sized
``torch.randperm`` index lists (RPN: 256 anchors with fg capped at 128,
`Detection/rpn/region_proposal_network.py:84-96`; ROI head: 128 proposals
with fg capped at 32, `Detection/model.py:271-277`). TPU requires fixed
shapes, so sampling here fills a FIXED number of slots with a validity
mask: random priorities + ``top_k`` implement "uniformly sample up to K of
the marked items" — distributionally equivalent to randperm selection
(SURVEY.md §7.3).

Divergence note: the reference samples jointly across the batch
(fg cap = 128 * batch), letting one image donate unused fg quota to
another; we sample PER IMAGE (the original Faster R-CNN formulation, and
what the reference reduces to at batch_size=1, its TrainConfig default).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SampleResult(NamedTuple):
    indices: jnp.ndarray  # (num_total,) int32 — into the candidate axis
    valid: jnp.ndarray    # (num_total,) bool — slot actually filled
    is_fg: jnp.ndarray    # (num_total,) bool — slot holds a foreground


def sample_fg_bg(rng: jax.Array, fg_mask: jnp.ndarray, bg_mask: jnp.ndarray,
                 num_total: int, fg_cap: int) -> SampleResult:
    """Sample up to ``fg_cap`` foregrounds uniformly, then fill the
    remaining of ``num_total`` slots with uniform backgrounds.

    Matches the reference flow: ``fg = perm(fg)[:min(|fg|, cap)]``,
    ``bg = perm(bg)[:num_total - |fg|]``. Slots beyond available candidates
    are marked invalid (the reference would just yield a shorter list).
    """
    n = fg_mask.shape[0]
    kf, kb = jax.random.split(rng)
    u_fg = jax.random.uniform(kf, (n,))
    u_bg = jax.random.uniform(kb, (n,))

    fg_pri = jnp.where(fg_mask, u_fg, -jnp.inf)
    bg_pri = jnp.where(bg_mask, u_bg, -jnp.inf)

    n_fg_avail = jnp.sum(fg_mask)
    n_fg = jnp.minimum(n_fg_avail, fg_cap)

    k_fg = min(fg_cap, n)
    fg_val, fg_idx = jax.lax.top_k(fg_pri, k_fg)
    fg_take = jnp.arange(k_fg) < n_fg

    k_bg = min(num_total, n)
    bg_val, bg_idx = jax.lax.top_k(bg_pri, k_bg)
    n_bg_avail = jnp.sum(bg_mask)
    n_bg = jnp.minimum(num_total - n_fg, n_bg_avail)
    bg_take = jnp.arange(k_bg) < n_bg

    idx = jnp.concatenate([fg_idx, bg_idx]).astype(jnp.int32)
    take = jnp.concatenate([fg_take, bg_take])
    fg_flag = jnp.concatenate([jnp.ones((k_fg,), bool),
                               jnp.zeros((k_bg,), bool)])

    # compact taken slots to the front, preserving fg-then-bg order
    order = jnp.argsort(~take, stable=True)
    idx = idx[order][:num_total]
    valid = take[order][:num_total]
    is_fg = fg_flag[order][:num_total] & valid
    return SampleResult(indices=idx, valid=valid, is_fg=is_fg)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over masked entries; 0 when the mask is empty (the reference
    would NaN on an empty foreground set — we substitute the safe 0, which
    contributes no gradient, and document the divergence)."""
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, values, 0.0)) / denom


def beta_smooth_l1(input: jnp.ndarray, target: jnp.ndarray, beta: float,
                   mask: jnp.ndarray) -> jnp.ndarray:
    """Masked beta smooth-L1 (`Detection/extension/functional.py:6-10`):
    elementwise huber summed over elements / count(+eps). ``mask`` is
    per-row; each row has input.shape[-1] elements."""
    diff = jnp.abs(input - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)
    per_row = jnp.sum(jnp.where(mask[..., None], loss, 0.0), axis=-1)
    numel = jnp.sum(mask) * input.shape[-1]
    return jnp.sum(per_row) / (numel + 1e-8)
