"""Fused PGD update kernel: ``x + gamma * sign(g)`` + optional L-inf
projection in a single VMEM pass.

This is the elementwise half of the A-FAN hot loop (the reference runs it
as separate CUDA kernels via torch ops: sign, mul, add_, then the masked
clamp of ``linfball_proj`` — 4+ kernel launches and 4x HBM traffic,
`Classification/attack_algo.py:52-56`). One Pallas kernel reads
``x_adv``/``grad``/``center`` once and writes once — minimum possible HBM
bandwidth for the update, which matters at the large feature-map taps
(e.g. detection layer1: B x 150 x 250 x 256 floats).

The wrapper falls back to pure jnp off-TPU (CPU tests run the kernel in
interpreter mode explicitly).

STATUS — retained exemplar, not wired into the production attack path.
Measured on 1x v5e (round 1): the jitted ALFA step with plain-jnp updates
and the pallas variant are within noise of each other, because XLA already
fuses the sign/mul/add/clamp chain into the preceding backward pass; the
standalone kernel only wins when the update is dispatched UNFUSED (the
torch situation). We keep exactly one elementwise Pallas kernel in-tree as
the documented template for future sequential-logic kernels (see
`nms_kernel.py` for one that does pay off).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8
_BLOCK_ROWS = 512  # rows of 128 lanes per grid step


def _update_kernel(x_ref, g_ref, out_ref, *, gamma):
    out_ref[:] = x_ref[:] + gamma * jnp.sign(g_ref[:])


def _update_clip_kernel(x_ref, g_ref, c_ref, out_ref, *, gamma, eps):
    stepped = x_ref[:] + gamma * jnp.sign(g_ref[:])
    out_ref[:] = jnp.clip(stepped, c_ref[:] - eps, c_ref[:] + eps)


def _pad_to_2d(x: jnp.ndarray):
    """Flatten to (rows, 128) with zero padding; return (arr2d, orig_size)."""
    n = x.size
    rows = -(-n // _LANE)
    rows_padded = -(-rows // _SUBLANE) * _SUBLANE
    flat = jnp.ravel(x)
    flat = jnp.pad(flat, (0, rows_padded * _LANE - n))
    return flat.reshape(rows_padded, _LANE), n


def pgd_update_pallas(x_adv: jnp.ndarray, grad: jnp.ndarray,
                      center: Optional[jnp.ndarray] = None,
                      *, gamma: float, eps: Optional[float] = None,
                      clip: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused sign-step (+projection). Shapes are free-form; internally the
    tensor is viewed as (rows, 128) lanes."""
    x2, n = _pad_to_2d(x_adv)
    g2, _ = _pad_to_2d(grad)
    rows = x2.shape[0]
    block = min(_BLOCK_ROWS, rows)
    grid = (pl.cdiv(rows, block),)
    spec = pl.BlockSpec((block, _LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    if clip:
        if eps is None or center is None:
            raise ValueError("clip=True requires center and eps")
        c2, _ = _pad_to_2d(center)
        out2 = pl.pallas_call(
            functools.partial(_update_clip_kernel, gamma=gamma, eps=eps),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            grid=grid, in_specs=[spec, spec, spec], out_specs=spec,
            interpret=interpret,
        )(x2, g2, c2)
    else:
        out2 = pl.pallas_call(
            functools.partial(_update_kernel, gamma=gamma),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            grid=grid, in_specs=[spec, spec], out_specs=spec,
            interpret=interpret,
        )(x2, g2)
    return out2.reshape(-1)[:n].reshape(x_adv.shape)


def pgd_update_reference(x_adv: jnp.ndarray, grad: jnp.ndarray,
                         center: Optional[jnp.ndarray] = None,
                         *, gamma: float, eps: Optional[float] = None,
                         clip: bool = False) -> jnp.ndarray:
    """Pure-jnp semantics oracle (and the off-TPU fallback)."""
    out = x_adv + gamma * jnp.sign(grad)
    if clip:
        out = jnp.clip(out, center - eps, center + eps)
    return out


def pgd_update(x_adv, grad, center=None, *, gamma, eps=None, clip=False):
    """Dispatch: Pallas on TPU, jnp elsewhere."""
    if jax.default_backend() == "tpu":
        return pgd_update_pallas(x_adv, grad, center, gamma=gamma, eps=eps,
                                 clip=clip)
    return pgd_update_reference(x_adv, grad, center, gamma=gamma, eps=eps,
                                clip=clip)
