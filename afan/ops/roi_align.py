"""ROIAlign: bilinear gather-average pooling of box regions, TPU-native.

The reference ships CUDA forward/backward kernels
(`Detection/support/src/cuda/ROIAlign_cuda.cu:15-346`) and a forward-only
C++ CPU kernel (`src/cpu/ROIAlign_cpu.cpp`), wrapped by an autograd Function
(`support/layer/roi_align.py:12-47`) and used by the detection Pooler at
scale 1/16, output 14x14, then 2x2 max-pool → 7x7 (`roi/pooler.py:18-43`).

Here the forward is a pure-JAX gather-based bilinear formulation — XLA fuses
the 4 corner gathers and the interpolation weights into a single kernel and
AUTODIFFS it (the hand-written atomic-add backward of the CUDA version is
unnecessary: the VJP of gather is scatter-add, which XLA emits itself).

Sampling-ratio semantics: the reference uses ``sampling_ratio=0`` → an
adaptive ``ceil(roi_size / pooled_size)`` grid per ROI — a data-dependent
shape that cannot compile on TPU. We use a static ``sampling_ratio``
(default 2, the modern detectron2 standard). This is the one deliberate
divergence (SURVEY.md §7.3 "reference quirks"); the CPU oracle in
``native/`` implements BOTH so the divergence is quantified in tests.

Layout: NHWC features (TPU-native), boxes in corner format, absolute image
coordinates; ``batch_indices`` maps each ROI to its image.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, batch_idx: jnp.ndarray,
                     y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample ``feat`` (B,H,W,C) at fractional (y, x) per ROI.

    y/x: (R, P) sample coordinates; returns (R, P, C). Out-of-range samples
    return 0 (matching the reference kernel's boundary handling:
    `ROIAlign_cuda.cu` zeroes samples with y<-1 or y>H).
    """
    H, W = feat.shape[1], feat.shape[2]
    oob = (y < -1.0) | (y > H) | (x < -1.0) | (x > W)
    y = jnp.clip(y, 0.0, H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    hy, hx = 1.0 - ly, 1.0 - lx
    b = batch_idx[:, None]
    v00 = feat[b, y0, x0]
    v01 = feat[b, y0, x1]
    v10 = feat[b, y1, x0]
    v11 = feat[b, y1, x1]
    out = hy * hx * v00 + hy * lx * v01 + ly * hx * v10 + ly * lx * v11
    return jnp.where(oob[..., None], 0.0, out)


def _axis_weights(lo: jnp.ndarray, bin_size: jnp.ndarray, n_bins: int,
                  s: int, axis_len: int, axis_idx: jnp.ndarray
                  ) -> jnp.ndarray:
    """Separable bilinear-interpolation weights for one spatial axis.

    ``lo``: (R,) ROI start in feature coords; ``bin_size``: (R,);
    ``axis_len``: the image's extent on this axis; ``axis_idx``: (R, L)
    the LOCAL feature index of each output lane for each ROI (for the
    batch-concatenated y axis this is ``global_idx - b*H``, which makes
    lanes of other images fall outside [pos-1, pos+1] and get weight 0
    automatically).

    Returns (R, n_bins, L): the SAMPLE-AVERAGED weight of feature lane L
    on output bin i — i.e. mean over the ``s`` sample positions of
    ``max(0, 1 - |pos - idx|)``, with the reference kernel's semantics:
    positions clamped to [0, axis_len-1], positions outside (-1, axis_len)
    contribute zero (`ROIAlign_cuda.cu` boundary handling).
    """
    i = jnp.arange(n_bins, dtype=lo.dtype)
    j = (jnp.arange(s, dtype=lo.dtype) + 0.5) / s
    # (R, n_bins, s) sample positions in local feature coords
    pos = lo[:, None, None] + (i[None, :, None] + j[None, None, :]) \
        * bin_size[:, None, None]
    oob = (pos < -1.0) | (pos > float(axis_len))
    pos_c = jnp.clip(pos, 0.0, float(axis_len - 1))
    # (R, n_bins, s, L) triangle weights, zeroed for oob samples
    w = jnp.maximum(
        0.0, 1.0 - jnp.abs(pos_c[..., None]
                           - axis_idx[:, None, None, :].astype(lo.dtype)))
    w = jnp.where(oob[..., None], 0.0, w)
    return w.mean(axis=2)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "sampling_ratio"))
def roi_align_einsum(feat: jnp.ndarray, boxes: jnp.ndarray,
                     batch_indices: jnp.ndarray,
                     output_size: Tuple[int, int] = (14, 14),
                     spatial_scale: float = 1.0 / 16,
                     sampling_ratio: int = 2) -> jnp.ndarray:
    """ROIAlign as two dense contractions (the TPU-fast path).

    Bilinear sampling on a regular per-ROI grid is SEPARABLE: the pooled
    output is ``Wy[r] @ feat[b_r] @ Wx[r]^T`` where Wy (R, ph, H) and
    Wx (R, pw, W) are sample-averaged triangle-kernel weights. Both
    contractions are MXU matmuls (and so is the autodiff backward),
    replacing the gather formulation that XLA lowers to a slow row-loop
    (measured 29 ms -> ~2 ms for 256 ROIs on (2,38,63,1024) on v5e).

    Batch handling: images are concatenated along H (weights are
    evaluated at ``global_idx - b*H``, so lanes of other images get zero
    weight) — one einsum for the whole batch, no masking pass.

    Math parity with :func:`roi_align` (same clamp/oob semantics); exact
    equality tested in fp32.
    """
    ph, pw = output_size
    s = sampling_ratio
    B, H, W, C = feat.shape
    R = boxes.shape[0]
    f32 = jnp.float32

    x1 = boxes[:, 0].astype(f32) * spatial_scale
    y1 = boxes[:, 1].astype(f32) * spatial_scale
    x2 = boxes[:, 2].astype(f32) * spatial_scale
    y2 = boxes[:, 3].astype(f32) * spatial_scale
    bin_w = jnp.maximum(x2 - x1, 1.0) / pw
    bin_h = jnp.maximum(y2 - y1, 1.0) / ph

    # y axis against the batch-concatenated (B*H,) index space
    gy = jnp.arange(B * H, dtype=jnp.int32)[None, :] \
        - (batch_indices * H)[:, None]              # (R, B*H) local idx
    wy = _axis_weights(y1, bin_h, ph, s, H, gy)     # (R, ph, B*H)
    lx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (R, W))
    wx = _axis_weights(x1, bin_w, pw, s, W, lx)     # (R, pw, W)

    feat_cat = feat.reshape(B * H, W, C)
    wy = wy.astype(feat.dtype)
    wx = wx.astype(feat.dtype)
    # contract H first (the larger axis), then W
    t = jnp.einsum("rhH,HWc->rhWc", wy, feat_cat,
                   preferred_element_type=f32)      # (R, ph, W, C)
    out = jnp.einsum("rhWc,rwW->rhwc", t, wx.astype(f32),
                     preferred_element_type=f32)    # (R, ph, pw, C)
    return out.astype(feat.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "sampling_ratio",
                     "roi_chunk"))
def roi_align_gather(feat: jnp.ndarray, boxes: jnp.ndarray,
                     batch_indices: jnp.ndarray,
                     output_size: Tuple[int, int] = (14, 14),
                     spatial_scale: float = 1.0 / 16,
                     sampling_ratio: int = 2,
                     roi_chunk: int = 256) -> jnp.ndarray:
    """ROIAlign forward, gather formulation. feat (B,H,W,C) NHWC →
    (R, ph, pw, C).

    Math parity with `ROIAlign_cuda.cu:15-80` (legacy, non-aligned variant:
    no -0.5 half-pixel offset; ``roi_w = max(roi_w, 1)``), with a static
    sampling grid (see module docstring). Kept as the semantics oracle for
    :func:`roi_align_einsum`, which is the production path (XLA lowers
    this gather to a slow row-loop on TPU).
    """
    ph, pw = output_size
    s = sampling_ratio
    R = boxes.shape[0]

    def compute(chunk_boxes, chunk_bidx):
        r = chunk_boxes.shape[0]
        x1 = chunk_boxes[:, 0] * spatial_scale
        y1 = chunk_boxes[:, 1] * spatial_scale
        x2 = chunk_boxes[:, 2] * spatial_scale
        y2 = chunk_boxes[:, 3] * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        bin_w = roi_w / pw
        bin_h = roi_h / ph
        # sample coords: y1 + (pbin*bin + (i+.5)*bin/s)
        iy = (jnp.arange(ph)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s
              ).reshape(-1)  # (ph*s,)
        ix = (jnp.arange(pw)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s
              ).reshape(-1)
        ys = y1[:, None] + iy[None, :] * bin_h[:, None]       # (r, ph*s)
        xs = x1[:, None] + ix[None, :] * bin_w[:, None]       # (r, pw*s)
        yy = jnp.repeat(ys, pw * s, axis=1)                    # (r, ph*s*pw*s)
        xx = jnp.tile(xs, (1, ph * s))
        vals = _bilinear_gather(feat, chunk_bidx, yy, xx)      # (r, P, C)
        vals = vals.reshape(r, ph, s, pw, s, -1)
        return vals.mean(axis=(2, 4))

    if R <= roi_chunk:
        return compute(boxes, batch_indices)
    chunks = []
    pad = (-R) % roi_chunk
    pb = jnp.pad(boxes, ((0, pad), (0, 0)))
    pi = jnp.pad(batch_indices, (0, pad))
    for c in range(0, R + pad, roi_chunk):
        chunks.append(compute(pb[c:c + roi_chunk], pi[c:c + roi_chunk]))
    return jnp.concatenate(chunks, axis=0)[:R]


def roi_align(feat: jnp.ndarray, boxes: jnp.ndarray,
              batch_indices: jnp.ndarray,
              output_size: Tuple[int, int] = (14, 14),
              spatial_scale: float = 1.0 / 16,
              sampling_ratio: int = 2,
              roi_chunk: int = 256,
              method: str = "einsum") -> jnp.ndarray:
    """ROIAlign. ``method='einsum'`` (default, MXU contractions) or
    ``'gather'`` (the semantics oracle). Both produce the same values
    (exact in fp32; tested)."""
    if method == "einsum":
        return roi_align_einsum(feat, boxes, batch_indices, output_size,
                                spatial_scale, sampling_ratio)
    return roi_align_gather(feat, boxes, batch_indices, output_size,
                            spatial_scale, sampling_ratio, roi_chunk)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "samples"))
def roi_pool_max(feat: jnp.ndarray, boxes: jnp.ndarray,
                 batch_indices: jnp.ndarray,
                 output_size: Tuple[int, int] = (7, 7),
                 spatial_scale: float = 1.0 / 16,
                 samples: int = 12) -> jnp.ndarray:
    """The legacy POOLING mode (`roi/pooler.py:24-33`): integer crop of
    the ROI (round + clamp of the scaled corners) followed by adaptive max
    pooling to ``output_size``.

    The reference loops ROIs in python and calls adaptive_max_pool2d on
    dynamically-shaped crops; here each output bin takes the max over a
    STATIC grid of ``samples`` x ``samples`` nearest-neighbor taps spanning
    the bin. Exact equality holds whenever the bin side is <= ``samples``
    feature pixels (bin side = ceil(crop/7); crop <= 7*samples, i.e.
    images up to 16*7*12 = 1344 px at scale 1/16 — covers the VOC and COCO
    geometries); larger crops degrade gracefully to dense subsampling.
    """
    ph, pw = output_size
    K = samples
    H, W = feat.shape[1], feat.shape[2]

    def axis_positions(lo, size, n_bins):
        """(R, n_bins*K) nearest-sample indices for adaptive pooling bins
        [floor(i*size/n), ceil((i+1)*size/n))."""
        # epsilon guards: i*size/n is integer-valued for many (i, size)
        # pairs and float32 division noise (~1e-5) must not flip the
        # floor/ceil across the integer (bin fractions are multiples of
        # 1/n_bins, far above 1e-3)
        i = jnp.arange(n_bins, dtype=jnp.float32)
        bs = jnp.floor(i[None, :] * size[:, None] / n_bins + 1e-3)
        be = jnp.ceil((i[None, :] + 1.0) * size[:, None] / n_bins - 1e-3)
        t = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
        pos = bs[:, :, None] + t[None, None, :] * (be - bs)[:, :, None]
        idx = jnp.floor(pos)
        idx = jnp.minimum(idx, (be - 1.0)[:, :, None])
        return (lo[:, None, None] + idx).reshape(idx.shape[0], -1)

    # reference crop rule: round, clamp to the feature extent
    x1 = jnp.clip(jnp.round(boxes[:, 0] * spatial_scale), 0, W)
    y1 = jnp.clip(jnp.round(boxes[:, 1] * spatial_scale), 0, H)
    x2 = jnp.clip(jnp.round(boxes[:, 2] * spatial_scale), 0, W)
    y2 = jnp.clip(jnp.round(boxes[:, 3] * spatial_scale), 0, H)
    w = jnp.maximum(x2 - x1, 1.0)
    h = jnp.maximum(y2 - y1, 1.0)
    ys = axis_positions(y1, h, ph)               # (R, ph*K)
    xs = axis_positions(x1, w, pw)               # (R, pw*K)
    yi = jnp.clip(ys.astype(jnp.int32), 0, H - 1)
    xi = jnp.clip(xs.astype(jnp.int32), 0, W - 1)
    b = batch_indices[:, None, None]
    vals = feat[b, yi[:, :, None], xi[:, None, :]]   # (R, ph*K, pw*K, C)
    r = boxes.shape[0]
    vals = vals.reshape(r, ph, K, pw, K, -1)
    return vals.max(axis=(2, 4))


def pool_rois(feat: jnp.ndarray, boxes: jnp.ndarray,
              batch_indices: jnp.ndarray, mode: str = "align"
              ) -> jnp.ndarray:
    """The reference Pooler (`roi/pooler.py:18-43`): ALIGN = ROIAlign
    14x14 at scale 1/16 then 2x2/2 max pool → (R, 7, 7, C); POOLING =
    adaptive max pool of the integer ROI crop (:func:`roi_pool_max`)."""
    if mode == "pooling":
        return roi_pool_max(feat, boxes, batch_indices, (7, 7), 1.0 / 16)
    if mode != "align":
        raise ValueError(f"unknown pooler mode {mode!r}")
    x = roi_align(feat, boxes, batch_indices, (14, 14), 1.0 / 16, 2)
    r, h, w, c = x.shape
    return x.reshape(r, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))
