"""Fused bilinear-upsample + cross-entropy Pallas kernel.

THE segmentation hot op: every loss site in the A-FAN seg step ends with
``resize_bilinear(logits, (H, W))`` followed by a masked cross-entropy
(`Segmentation/network/utils.py:22-30` upsample + the trainers'
``nn.CrossEntropyLoss(ignore_index=255)``). In the composed XLA graph
each such site costs ~30 ms at city-768 geometry (b4) even though the
isolated op pair costs 0.5 ms (scripts/microbench_resize_ce.py;
optimization barriers, einsum resweeps, layout changes all measured
no-ops) — the (B, H, W, C) tensor and its cotangent dominate HBM
scheduling. This kernel never materializes it:

* H-axis upsample runs as a plain XLA einsum to a (B, H, C, w)
  float32 intermediate (~22 MB at 768 — 16x smaller than the full
  tensor in f32);
* the Pallas kernel W-upsamples one (TH, C, w) row-tile at a time on
  the MXU (``(TH*C, w) @ (w, W)``), computes the masked NLL on the
  VPU in f32, and accumulates per-batch-entry loss SUMS — compatible
  with `afan.train.segment_loop._per_entry_loss_sums` semantics;
* the custom-VJP backward recomputes the tile, forms
  ``g * mask * (softmax - onehot)`` in-register and contracts it
  straight back to the w-axis — the full-resolution cotangent never
  exists either.

Weights follow torch's ``align_corners=False`` convention, identical to
``jax.image.resize(..., 'linear')`` (parity-tested to float tolerance).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IGNORE = 255

# All dots/einsums in this op run f32 multi-pass on the MXU. Default
# (single-pass) truncates f32 multiplicands to bf16, which the first
# on-chip smoke measured at ~0.3-0.7% relative gradient error vs the
# XLA resize+CE path (itself f32-exact — XLA lowers the bilinear resize
# to elementwise gathers, not MXU dots). HIGHEST restores exact parity
# (grad rel err <=1.1e-5 across all six recipe geometries on-chip) for a
# measured ~5% of the fused seg step (768 crop: 179.2 -> 189.6 ms;
# 512: 72.1 -> 75.0 ms — both still ~1.7x the XLA path's 316/129 ms).
_PREC = jax.lax.Precision.HIGHEST


def bilinear_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Dense (n_out, n_in) align_corners=False bilinear weights — the
    exact map computed by `jax.image.resize(..., 'linear')` and torch
    `F.interpolate(..., 'bilinear', align_corners=False)`."""
    scale = n_out / n_in
    out = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        src = (i + 0.5) / scale - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        for tap, wt in ((lo, 1.0 - frac), (lo + 1, frac)):
            t = min(max(tap, 0), n_in - 1)
            out[i, t] += wt
    return out


@functools.lru_cache(maxsize=None)
def _mats_np(n_out: int, n_in: int):
    m = bilinear_matrix(n_out, n_in)
    return m, np.ascontiguousarray(m.T)


def _mats(n_out: int, n_in: int):
    # NOTE: cache numpy, convert per use — caching jnp arrays here leaks
    # them across jit traces (UnexpectedTracerError under a mesh).
    m, mt = _mats_np(n_out, n_in)
    return jnp.asarray(m), jnp.asarray(mt)


# Mosaic requires the last two dims of every block to be divisible by
# (8, 128) or equal to the full array dims. The H axis is tiled, so it
# must pad to the 8-row tile (odd geometries like VOC's 513 otherwise
# force TH=1, which Mosaic rejects); padded rows carry IGNORE labels and
# contribute exactly 0 to both the loss sums and the gradient.
TH = 8


def _pad_h(H: int) -> int:
    return -(-H // TH) * TH


def _fwd_kernel(up_ref, rwt_ref, lab_ref, out_ref, *, focal):
    """One (TH, C, w) row-tile -> partial masked-loss sum for entry b.
    ``focal``: None for plain NLL, else the (alpha, gamma) of
    `segment_loop.seg_focal_loss`."""
    a = up_ref[0].astype(jnp.float32)                      # (TH, C, w)
    th, C, w = a.shape
    hi = jnp.dot(a.reshape(th * C, w), rwt_ref[:], precision=_PREC,
                 preferred_element_type=jnp.float32)       # (TH*C, W)
    hi = hi.reshape(th, C, -1)
    m = jnp.max(hi, axis=1)                                # (TH, W)
    e = jnp.exp(hi - m[:, None, :])
    lse = m + jnp.log(jnp.sum(e, axis=1))
    lab = lab_ref[0]                                       # (TH, W)
    pick = jnp.zeros_like(lse)
    for c in range(C):
        pick += jnp.where(lab == c, hi[:, c, :], 0.0)
    ce = lse - pick
    if focal is not None:
        alpha, gamma = focal
        ce = alpha * (1.0 - jnp.exp(-ce)) ** gamma * ce
    nll = jnp.where(lab != IGNORE, ce, 0.0)
    # The per-entry sum lives replicated across an (8, 128) VMEM tile
    # (a (B, 1) SMEM scalar output violates Mosaic's last-two-dims
    # tiling rule); the host reads [:, 0, 0].
    partial = jnp.sum(nll)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0] = jnp.full((8, 128), partial, jnp.float32)

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[0] = out_ref[0] + partial


def _bwd_kernel(up_ref, rwt_ref, rw_ref, lab_ref, dup_ref, *, focal):
    """grad wrt the (TH, C, w) tile: contract
    d(loss)/d(ce) * (softmax - onehot) back through the W-upsample
    (d(ce)/d(hi_c) = softmax_c - onehot_c). The upstream cotangent g is
    a per-entry SCALAR the whole gradient is linear in — it is applied
    to the small (B, h, w, C) dlo outside the kernel rather than shipped
    in as a (1, 1) block Mosaic would reject."""
    a = up_ref[0].astype(jnp.float32)
    th, C, w = a.shape
    hi = jnp.dot(a.reshape(th * C, w), rwt_ref[:], precision=_PREC,
                 preferred_element_type=jnp.float32)
    hi = hi.reshape(th, C, -1)
    m = jnp.max(hi, axis=1)
    e = jnp.exp(hi - m[:, None, :])
    s = jnp.sum(e, axis=1)                                 # (TH, W)
    lab = lab_ref[0]
    gmask = jnp.where(lab != IGNORE, 1.0, 0.0)             # (TH, W)
    soft = e / s[:, None, :]                               # (TH, C, W)
    onehot = jnp.stack([(lab == c).astype(jnp.float32)
                        for c in range(C)], axis=1)        # (TH, C, W)
    if focal is not None:
        alpha, gamma = focal
        lse = m + jnp.log(s)
        pick = jnp.sum(hi * onehot, axis=1)                # (TH, W)
        ce = lse - pick
        E = jnp.exp(-ce)
        omE = 1.0 - E
        # d[alpha * omE**gamma * ce]/d ce
        dfdce = alpha * (omE ** gamma
                         + ce * gamma * omE ** (gamma - 1.0) * E)
        gmask = gmask * dfdce
    ghi = (soft - onehot) * gmask[:, None, :]
    W = ghi.shape[-1]
    dup = jnp.dot(ghi.reshape(th * C, W), rw_ref[:], precision=_PREC,
                  preferred_element_type=jnp.float32)      # (TH*C, w)
    dup_ref[0] = dup.reshape(th, C, w)


def _pallas_sums(upT, rwt, labels, interpret: bool, focal):
    """upT/labels are H-padded to a TH multiple. Returns (B,) sums."""
    B, Hp, C, w = upT.shape
    W = labels.shape[2]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, focal=focal),
        grid=(B, Hp // TH),
        in_specs=[
            pl.BlockSpec((1, TH, C, w), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, W), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        interpret=interpret,
    )(upT, rwt, labels)
    return out[:, 0, 0]


def _pallas_grad(upT, rwt, rw, labels, interpret: bool, focal):
    B, Hp, C, w = upT.shape
    W = labels.shape[2]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, focal=focal),
        grid=(B, Hp // TH),
        in_specs=[
            pl.BlockSpec((1, TH, C, w), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, W), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, w), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, C, w), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, C, w), jnp.float32),
        interpret=interpret,
    )(upT, rwt, rw, labels)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_resize_nll_sums(lo, labels, out_size, interpret=False,
                          focal=None):
    """Per-batch-entry sums of the 255-masked NLL of
    ``resize_bilinear(lo, out_size)`` against ``labels`` — without
    materializing the upsampled tensor. Differentiable w.r.t. ``lo``.

    lo: (B, h, w, C) float logits; labels: (B, H, W) int32.
    ``focal``: None for plain CE, or the (alpha, gamma) tuple of
    `segment_loop.seg_focal_loss`.
    Returns (B,) float32. Interp + CE run in float32 regardless of the
    logits dtype (the reference's torch path is f32 end-to-end).
    """
    return _fwd_impl(lo, labels, out_size, interpret, focal)[0]


def _fwd_impl(lo, labels, out_size, interpret, focal):
    H, W = out_size
    B, h, w, C = lo.shape
    RH, _ = _mats(H, h)
    RW, RWT = _mats(W, w)
    up = jnp.einsum("Hp,bpqc->bHqc", RH, lo.astype(jnp.float32),
                    precision=_PREC)
    upT = jnp.transpose(up, (0, 1, 3, 2))            # (B, H, C, w)
    Hp = _pad_h(H)
    if Hp != H:
        upT = jnp.pad(upT, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, Hp - H), (0, 0)),
                         constant_values=IGNORE)
    sums = _pallas_sums(upT, RWT, labels, interpret, focal)
    return sums, (upT, labels)


def _fwd_rule(lo, labels, out_size, interpret, focal):
    sums, res = _fwd_impl(lo, labels, out_size, interpret, focal)
    return sums, (res[0], res[1], lo)


def _bwd_rule(out_size, interpret, focal, residuals, g):
    upT, labels, lo = residuals                      # upT/labels H-padded
    H, W = out_size
    RH, _ = _mats(H, lo.shape[1])
    RW, RWT = _mats(W, lo.shape[2])
    dupT = _pallas_grad(upT, RWT, RW, labels, interpret, focal)
    dup = jnp.transpose(dupT[:, :H], (0, 1, 3, 2))   # (B, H, w, C)
    dlo = jnp.einsum("Hp,bHqc->bpqc", RH, dup, precision=_PREC)
    dlo = dlo * g.astype(jnp.float32)[:, None, None, None]
    return dlo.astype(lo.dtype), None


fused_resize_nll_sums.defvjp(_fwd_rule, _bwd_rule)
