"""Fixed-capacity greedy NMS for TPU.

The reference ships CUDA/C++ NMS kernels (`Detection/support/src/cpu/
nms_cpu.cpp:5-75`, `src/cuda/nms.cu:23-131`) that return a dynamically-sized
keep list. TPU/XLA requires static shapes, so this implementation returns a
fixed-size result: for each input slot a boolean *keep mask* (and optionally
the top-``max_output_size`` kept indices, padded with -1).

Algorithm: exact greedy suppression on score-descending order —
*blockwise*, mirroring the structure of the reference CUDA bitmask kernel
(64-thread tiles there; 128-lane tiles here): boxes are processed in tiles
of ``BLOCK``; within a tile suppression is resolved by a short sequential
``fori_loop`` over the tile (tiny vector ops), and each resolved tile
suppresses all later boxes with one vectorized mask update. This keeps the
sequential-step count at ``N + N/BLOCK`` tiny steps while all O(N^2) IoU
work is batched matrix arithmetic on the VPU.

IoU convention: the reference NMS kernels use the legacy "+1 pixel" area
(`nms_cpu.cpp:23,58-60`), while the training-time IoU (`Detection/bbox.py:
65-81`) does not — both are exposed here via ``plus_one``. Suppression is
``iou >= threshold`` (`nms_cpu.cpp:62`), strictly greater NOT used.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

BLOCK = 128


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, plus_one: bool = False
                 ) -> jnp.ndarray:
    """IoU matrix (Na, Nb) of corner-format boxes [x1, y1, x2, y2]."""
    off = 1.0 if plus_one else 0.0
    area_a = (a[:, 2] - a[:, 0] + off) * (a[:, 3] - a[:, 1] + off)
    area_b = (b[:, 2] - b[:, 0] + off) * (b[:, 3] - b[:, 1] + off)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt + off, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def _greedy_suppress(iou_sorted: jnp.ndarray, valid_sorted: jnp.ndarray,
                     threshold: float) -> jnp.ndarray:
    """Keep mask (in sorted order) of exact greedy NMS given a precomputed
    IoU matrix over score-sorted boxes."""
    n = iou_sorted.shape[0]
    suppress_mat = iou_sorted >= threshold
    num_blocks = -(-n // BLOCK)
    pad = num_blocks * BLOCK - n
    if pad:
        suppress_mat = jnp.pad(suppress_mat, ((0, pad), (0, pad)))
        valid_sorted = jnp.pad(valid_sorted, (0, pad))
    np_ = num_blocks * BLOCK

    tri = jnp.tril(jnp.ones((BLOCK, BLOCK), bool), k=-1)  # strictly-earlier

    def block_body(carry, blk):
        suppressed = carry  # (np_,) bool, includes effects of earlier blocks
        start = blk * BLOCK
        tile = jax.lax.dynamic_slice(suppress_mat, (start, start),
                                     (BLOCK, BLOCK))
        sup_in = jax.lax.dynamic_slice(suppressed, (start,), (BLOCK,))

        # sequential greedy within the tile: i kept iff not yet suppressed
        def inner(i, sup):
            kept_i = ~sup[i]
            row = tile[i] & tri.T[i]  # suppress j>i within tile
            return sup | (kept_i & row)

        sup_tile = jax.lax.fori_loop(0, BLOCK, inner, sup_in)
        kept_tile = ~sup_tile

        # vectorized suppression of ALL later boxes by this tile's keepers
        rows = jax.lax.dynamic_slice(suppress_mat, (start, 0), (BLOCK, np_))
        later = jax.lax.broadcasted_iota(jnp.int32, (np_,), 0) >= start + BLOCK
        hit = jnp.any(rows & kept_tile[:, None], axis=0) & later
        suppressed = jax.lax.dynamic_update_slice(suppressed, sup_tile,
                                                  (start,))
        suppressed = suppressed | hit
        return suppressed, None

    init = ~valid_sorted  # invalid slots start suppressed
    suppressed, _ = jax.lax.scan(block_body, init,
                                 jnp.arange(num_blocks, dtype=jnp.int32))
    keep = (~suppressed) & valid_sorted
    return keep[:n]


@functools.partial(jax.jit,
                   static_argnames=("threshold", "plus_one", "use_pallas"))
def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, threshold: float,
             valid: Optional[jnp.ndarray] = None, plus_one: bool = True,
             use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Exact greedy NMS; returns a keep mask aligned with the INPUT order.

    ``valid`` masks padded input slots (treated as absent). ``plus_one``
    selects the legacy +1 area convention of the reference kernels.

    Two exact implementations, same result (parity-tested):
    * the Pallas kernel (:mod:`afan.ops.kernels.nms_kernel`) — never
      materializes the N x N IoU matrix; the only option that compiles and
      runs at the 12k-anchor training scale. Default on TPU for N >= 1024.
    * the pure-JAX blockwise path below — used on CPU/small N.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and n >= 1024
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf))
    b = boxes[order]
    if use_pallas:
        from .kernels.nms_kernel import nms_sorted_mask_pallas
        keep_sorted = nms_sorted_mask_pallas(b, valid[order], threshold,
                                             plus_one=plus_one)
    else:
        iou = pairwise_iou(b, b, plus_one=plus_one)
        keep_sorted = _greedy_suppress(iou, valid[order], threshold)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def nms_mask_presorted(boxes_sorted: jnp.ndarray, threshold: float,
                       valid_sorted: Optional[jnp.ndarray] = None,
                       plus_one: bool = True,
                       use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Keep mask for boxes ALREADY in score-descending order.

    `lax.top_k` returns its values sorted, so callers that just top-k'd
    (the RPN proposal path) can skip :func:`nms_mask`'s argsort entirely —
    one of three sort-sized ops in the reference proposal pipeline
    (`region_proposal_network.py:246-258`), all materially expensive on
    TPU."""
    n = boxes_sorted.shape[0]
    if valid_sorted is None:
        valid_sorted = jnp.ones((n,), bool)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and n >= 1024
    if use_pallas:
        from .kernels.nms_kernel import nms_sorted_mask_pallas
        return nms_sorted_mask_pallas(boxes_sorted, valid_sorted, threshold,
                                      plus_one=plus_one)
    iou = pairwise_iou(boxes_sorted, boxes_sorted, plus_one=plus_one)
    return _greedy_suppress(iou, valid_sorted, threshold)


def nms_select_presorted(boxes_sorted: jnp.ndarray, threshold: float,
                         max_output_size: int, plus_one: bool = True,
                         valid_sorted: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NMS on score-sorted boxes → the first ``max_output_size`` kept
    boxes (still score-sorted, zero-padded) + validity mask.

    ``valid_sorted`` masks padded slots (absent boxes); when omitted, ALL
    input boxes participate as real boxes — callers passing padded inputs
    (e.g. zeroed (0,0,0,0) rows) must thread the mask.

    The rank of each kept box is a cumsum over the keep mask, so the
    selection is one O(N) scan + scatter instead of the extra
    ``top_k``-sized sort :func:`nms_padded` pays. Output is identical."""
    keep = nms_mask_presorted(boxes_sorted, threshold,
                              valid_sorted=valid_sorted, plus_one=plus_one)
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    sel = keep & (rank < max_output_size)
    tgt = jnp.where(sel, rank, max_output_size)   # overflow -> dump slot
    out = jnp.zeros((max_output_size + 1, 4),
                    boxes_sorted.dtype).at[tgt].set(boxes_sorted)
    valid = jnp.zeros((max_output_size + 1,), bool).at[tgt].set(sel)
    return out[:max_output_size], valid[:max_output_size]


def nms_padded(boxes: jnp.ndarray, scores: jnp.ndarray, threshold: float,
               max_output_size: int, valid: Optional[jnp.ndarray] = None,
               plus_one: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NMS with fixed-size output: ``(indices (K,), mask (K,))``.

    Indices are score-descending kept box indices, padded with -1 where
    fewer than ``max_output_size`` survive — the static-shape analog of the
    reference's dynamic keep list.
    """
    keep = nms_mask(boxes, scores, threshold, valid=valid, plus_one=plus_one)
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    k = min(max_output_size, boxes.shape[0])
    top_scores, idx = jax.lax.top_k(masked_scores, k)
    mask = top_scores > -jnp.inf
    idx = jnp.where(mask, idx, -1)
    if k < max_output_size:
        idx = jnp.pad(idx, (0, max_output_size - k), constant_values=-1)
        mask = jnp.pad(mask, (0, max_output_size - k))
    return idx, mask
