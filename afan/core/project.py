"""Norm-ball projections.

Functional JAX ports of the reference's in-place torch projections
(`/root/reference/Detection/attack_algo.py:9-45`, identical copies in the
Classification and Segmentation stacks). All functions are pure and
jit/vmap/grad compatible.
"""
from __future__ import annotations

import jax.numpy as jnp


def tensor_clamp(t: jnp.ndarray, min: jnp.ndarray, max: jnp.ndarray) -> jnp.ndarray:
    """Elementwise clamp of ``t`` into ``[min, max]`` (arrays, not scalars).

    Reference: ``tensor_clamp`` at `Detection/attack_algo.py:9-19` (an
    in-place masked assignment there; a pure ``jnp.clip`` here).
    """
    return jnp.clip(t, min, max)


def linfball_proj(center: jnp.ndarray, radius, t: jnp.ndarray) -> jnp.ndarray:
    """Project ``t`` onto the L-inf ball of ``radius`` around ``center``.

    Reference: `Detection/attack_algo.py:44-45`.
    """
    return tensor_clamp(t, center - radius, center + radius)


def l2ball_proj(center: jnp.ndarray, radius, t: jnp.ndarray) -> jnp.ndarray:
    """Per-sample radial projection of ``t`` onto the L2 ball around ``center``.

    ``t`` and ``center`` have a leading batch axis; each sample's offset
    direction is rescaled so its L2 norm is at most ``radius``.

    Reference: `Detection/attack_algo.py:30-42`. The reference normalizes the
    direction then multiplies by ``min(dist, radius)``; we express the same
    thing as a single scale factor, avoiding the 0/0 of a zero direction
    (the reference would produce NaNs there; we return ``center`` instead,
    which is the mathematically correct projection).
    """
    direction = t - center
    bsz = direction.shape[0]
    flat = direction.reshape(bsz, -1)
    dist = jnp.linalg.norm(flat, axis=1, keepdims=True)
    scale = jnp.where(dist > radius, radius / jnp.maximum(dist, 1e-12), 1.0)
    flat = flat * scale
    return center + flat.reshape(direction.shape)
