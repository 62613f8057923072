"""Fused AFN (mix_feature) kernel: channel-axis statistics + re-statistics
matching in one VMEM pass.

The reference computes mean/var of BOTH tensors, two sqrt tensors, and the
normalized mix as ~8 separate torch kernels (`Detection/attack_algo.py:
254-265`), i.e. ~8x HBM round-trips over the feature map. Here a single
Pallas kernel reads clean+adv once per tile, reduces per-row (channel axis)
statistics on the VPU, and writes the mixed feature once.

Layout: rows = flattened (batch * spatial) positions, lanes = channels.
Statistics are per ROW (the reference's per-sample per-spatial-position
channel stats), with torch's unbiased variance.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_BLOCK_ROWS = 256


def _afn_kernel(clean_ref, adv_ref, out_ref, *, channels):
    c = channels
    clean = clean_ref[:]
    adv = adv_ref[:]
    # row stats over the real channel extent; padding lanes are zero and
    # masked out of the sums
    lane = jax.lax.broadcasted_iota(jnp.int32, clean.shape, 1)
    mask = lane < c
    cnt = jnp.float32(c)
    mean_cl = jnp.sum(jnp.where(mask, clean, 0.0), 1, keepdims=True) / cnt
    mean_adv = jnp.sum(jnp.where(mask, adv, 0.0), 1, keepdims=True) / cnt
    d_cl = jnp.where(mask, clean - mean_cl, 0.0)
    d_adv = jnp.where(mask, adv - mean_adv, 0.0)
    # torch unbiased variance (ddof=1)
    var_cl = jnp.sum(d_cl * d_cl, 1, keepdims=True) / (cnt - 1.0)
    var_adv = jnp.sum(d_adv * d_adv, 1, keepdims=True) / (cnt - 1.0)
    inv_std_cl = jax.lax.rsqrt(var_cl + _EPS)
    std_adv = jnp.sqrt(var_adv + _EPS)
    out_ref[:] = d_cl * inv_std_cl * std_adv + mean_adv


def mix_feature_pallas(clean: jnp.ndarray, adv: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused mix_feature for channel-last tensors of any rank >= 2."""
    c = clean.shape[-1]
    rows = clean.size // c
    c_pad = -(-c // 128) * 128
    x = clean.reshape(rows, c)
    y = adv.reshape(rows, c)
    if c_pad != c:
        x = jnp.pad(x, ((0, 0), (0, c_pad - c)))
        y = jnp.pad(y, ((0, 0), (0, c_pad - c)))
    rows_pad = -(-rows // 8) * 8
    if rows_pad != rows:
        x = jnp.pad(x, ((0, rows_pad - rows), (0, 0)))
        y = jnp.pad(y, ((0, rows_pad - rows), (0, 0)))
    block = min(_BLOCK_ROWS, rows_pad)
    spec = pl.BlockSpec((block, c_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_afn_kernel, channels=c),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(pl.cdiv(rows_pad, block),),
        in_specs=[spec, spec], out_specs=spec,
        interpret=interpret,
    )(x, y)
    return out[:rows, :c].reshape(clean.shape)


def mix_feature_fused(clean: jnp.ndarray, adv: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas on TPU (channel-last), jnp reference elsewhere."""
    from ...core.afn import mix_feature
    if jax.default_backend() == "tpu" and clean.ndim >= 2:
        return mix_feature_pallas(clean, adv)
    return mix_feature(clean, adv)
