"""Box arithmetic for the detection stack.

Functional port of `Detection/bbox.py` (corner<->center conversions, delta
encode/decode, batched IoU, inside-test, clip). All functions are pure and
broadcast over arbitrary leading axes; boxes are [x1, y1, x2, y2] corner
format, float32, absolute pixel coordinates.
"""
from __future__ import annotations

import jax.numpy as jnp


def to_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """corner → (cx, cy, w, h) (`bbox.py:23-30`)."""
    return jnp.stack([
        (boxes[..., 0] + boxes[..., 2]) / 2,
        (boxes[..., 1] + boxes[..., 3]) / 2,
        boxes[..., 2] - boxes[..., 0],
        boxes[..., 3] - boxes[..., 1],
    ], axis=-1)


def from_center(cb: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) → corner (`bbox.py:32-39`)."""
    return jnp.stack([
        cb[..., 0] - cb[..., 2] / 2,
        cb[..., 1] - cb[..., 3] / 2,
        cb[..., 0] + cb[..., 2] / 2,
        cb[..., 1] + cb[..., 3] / 2,
    ], axis=-1)


def encode_deltas(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """calc_transformer (`bbox.py:41-52`): (dx/w, dy/h, log dw, log dh).

    Padded/degenerate dst boxes (w or h == 0) would produce -inf logs; we
    clamp the ratio to a tiny positive — callers mask those rows out of the
    loss anyway, but NaN-free math keeps grads clean under jit.
    """
    s, d = to_center(src), to_center(dst)
    sw = jnp.maximum(s[..., 2], 1e-6)
    sh = jnp.maximum(s[..., 3], 1e-6)
    return jnp.stack([
        (d[..., 0] - s[..., 0]) / sw,
        (d[..., 1] - s[..., 1]) / sh,
        jnp.log(jnp.maximum(d[..., 2] / sw, 1e-6)),
        jnp.log(jnp.maximum(d[..., 3] / sh, 1e-6)),
    ], axis=-1)


def decode_deltas(src: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """apply_transformer (`bbox.py:54-63`)."""
    s = to_center(src)
    return from_center(jnp.stack([
        deltas[..., 0] * s[..., 2] + s[..., 0],
        deltas[..., 1] * s[..., 3] + s[..., 1],
        jnp.exp(deltas[..., 2]) * s[..., 2],
        jnp.exp(deltas[..., 3]) * s[..., 3],
    ], axis=-1))


def iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched IoU (`bbox.py:65-81`): a (..., Na, 4), b (..., Nb, 4) →
    (..., Na, Nb). Standard convention (no +1; that is NMS-kernel-only)."""
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def inside(boxes: jnp.ndarray, left: float, top: float, right: float,
           bottom: float) -> jnp.ndarray:
    """Fully-inside-image test (`bbox.py:83-86`)."""
    return ((boxes[..., 0] >= left) & (boxes[..., 1] >= top)
            & (boxes[..., 2] <= right) & (boxes[..., 3] <= bottom))


def clip(boxes: jnp.ndarray, left: float, top: float, right: float,
         bottom: float) -> jnp.ndarray:
    """Clamp to image bounds (`bbox.py:88-93`; pure here, in-place there)."""
    x = jnp.clip(boxes[..., 0::2], left, right)
    y = jnp.clip(boxes[..., 1::2], top, bottom)
    out = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)
    return out


# delta normalization of the ROI head (`Detection/model.py:238-239`)
TRANSFORMER_NORMALIZE_MEAN = (0.0, 0.0, 0.0, 0.0)
TRANSFORMER_NORMALIZE_STD = (0.1, 0.1, 0.2, 0.2)
