"""Pallas TPU greedy-NMS kernel — the analog of the reference's CUDA
bitmask kernel (`Detection/support/src/cuda/nms.cu:23-131`, 64-thread
tiles + host-side scan), redesigned for the TPU grid model:

* boxes arrive score-sorted in TWO layouts: a TRANSPOSED (4, N) row
  layout (each coordinate one lane-contiguous VMEM row — the *victim*
  side of every pairwise tile) and the natural (N, 4) column layout (the
  *suppressor* side — sublane-contiguous (BLOCK, 1) loads). Feeding both
  costs 2x input bytes but removes every in-kernel lane<->sublane
  transpose, which dominated the first version of this kernel;
* the full (N,) suppression vector and per-box areas live in VMEM
  scratch, which persists across the sequential TPU grid;
* grid step i resolves its ``BLOCK``-box tile by **convergence rounds**
  instead of a per-box sequential loop: each round finalizes every box
  with no surviving earlier suppressor (a vectorized (BLOCK, BLOCK)
  masked reduce) and removes everything those winners suppress. Real
  suppression graphs are shallow, so a handful of rounds replaces BLOCK
  data-dependent scalar iterations — this is what makes large tiles
  profitable. The rounds iteration is exact greedy NMS: a box is
  finalized only when every earlier potential suppressor is decided,
  which is precisely the greedy recurrence;
* the resolved tile then suppresses all later boxes with column-chunked
  (BLOCK, CHUNK) vectorized IoU tiles on the VPU — no N x N matrix ever
  exists and VMEM transients stay bounded. Suppressed tile boxes are
  made DEGENERATE on the suppressor side (x2' < x1), so the sweep needs
  no kept-mask multiply; chunks strictly after the tile skip the
  "later-box" iota mask; fully-suppressed chunks and kept-empty tiles
  skip entirely. The pure-JAX fallback in :mod:`afan.ops.nms`
  materializes the full matrix, which is fine for eval-sized N but does
  not scale to the 12k-anchor training path;
* suppression convention matches the reference kernels: ``iou >=
  threshold`` with the same ``inter / (area_a + area_b - inter)``
  float arithmetic (bit-compatible with the CPU oracle on boundary
  cases — a division-free rearrangement would not be), optional legacy
  +1 pixel areas.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes bound scoped VMEM: the sweep's (BLOCK, CHUNK) transients are
# the fat ones, and the kernel must also fit when embedded in a big
# vmapped/rematted train step (16 MB scoped-VMEM limit) — B512/C1024
# compiles standalone but OOMs inside the flagship detection step.
BLOCK = 256
CHUNK = 1024     # column-tile width for the suppress-later sweep
STATIC_ROUNDS = 6  # unconditional resolve rounds before the exact fallback


def _over(tx1, ty1, tx2, ty2, tarea, cx1, cy1, cx2, cy2, carea, threshold,
          off):
    """(BLOCK, W) IoU >= threshold mask of tile columns vs chunk rows."""
    jw = jnp.maximum(jnp.minimum(tx2, cx2) - jnp.maximum(tx1, cx1) + off, 0.0)
    jh = jnp.maximum(jnp.minimum(ty2, cy2) - jnp.maximum(ty1, cy1) + off, 0.0)
    jinter = jw * jh
    jiou = jinter / jnp.maximum(tarea + carea - jinter, 1e-12)
    return (jiou >= threshold).astype(jnp.float32)


def _nms_kernel(rows_ref, cols_ref, valid_ref, keep_ref, sup_ref, area_ref,
                mat_ref, tri_ref, *, n_pad: int, threshold: float,
                off: float):
    """One grid step. rows_ref: (4, n_pad) [x1;y1;x2;y2] score-sorted;
    cols_ref: (n_pad, 4) same boxes; valid/keep/sup/area: (1, n_pad)."""
    i = pl.program_id(0)
    start = pl.multiple_of(i * BLOCK, BLOCK)

    @pl.when(i == 0)
    def _():
        sup_ref[:] = 1.0 - valid_ref[:]   # invalid slots start suppressed
        area_ref[:] = ((rows_ref[2:3, :] - rows_ref[0:1, :] + off)
                       * (rows_ref[3:4, :] - rows_ref[1:2, :] + off))
        rids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
        cids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
        tri_ref[:] = (cids > rids).astype(jnp.float32)

    def vrow(r, lo, width):
        return rows_ref[r:r + 1, pl.ds(lo, width)]

    # my tile as native (BLOCK, 1) columns — no transposes
    tile = cols_ref[pl.ds(start, BLOCK), :]
    tx1 = tile[:, 0:1]
    ty1 = tile[:, 1:2]
    tx2 = tile[:, 2:3]
    ty2 = tile[:, 3:4]
    tarea = (tx2 - tx1 + off) * (ty2 - ty1 + off)

    # (1) within-tile pairwise suppression matrix S[j, i] ("row j suppresses
    # column i"), strictly j < i
    sup_mat = _over(tx1, ty1, tx2, ty2, tarea,
                    vrow(0, start, BLOCK), vrow(1, start, BLOCK),
                    vrow(2, start, BLOCK), vrow(3, start, BLOCK),
                    area_ref[0:1, pl.ds(start, BLOCK)], threshold, off)
    mat_ref[:] = sup_mat * tri_ref[:]

    # (2) greedy resolve by convergence rounds. alive = undecided boxes;
    # each round finalizes the frontier F (alive boxes with no alive
    # earlier suppressor — all greedy-kept) and removes their victims.
    # Terminates because the first undecided box is always in F.
    sup_tile0 = sup_ref[0:1, pl.ds(start, BLOCK)]
    alive0 = 1.0 - sup_tile0
    kept0 = jnp.zeros_like(alive0)

    def round_cond(state):
        alive, _ = state
        return jnp.sum(alive) > 0.0

    def round_body(state):
        alive, kept = state
        S = mat_ref[:]
        alive_col = alive.reshape(BLOCK, 1)
        sup_by_alive = jnp.max(S * alive_col, axis=0, keepdims=True)
        F = alive * (1.0 - sup_by_alive)           # finalized kept this round
        sup_by_F = jnp.max(S * F.reshape(BLOCK, 1), axis=0, keepdims=True)
        alive = alive * (1.0 - F) * (1.0 - sup_by_F)
        return alive, kept + F

    # Data-dependent predicates are the expensive thing on TPU (each is a
    # VPU -> scalar-unit sync); a while_loop pays one per round. So run
    # STATIC_ROUNDS unconditionally (converged rounds are arithmetic
    # no-ops: F == 0), then fall back to the exact while_loop only for the
    # rare tile whose suppression-chain depth exceeds them — one predicate
    # per tile instead of one per round. fori_loop (scalar trip count), NOT
    # a python unroll: unrolling materializes each round's (BLOCK, BLOCK)
    # transients separately and blows the 16 MB scoped-VMEM limit.
    state = jax.lax.fori_loop(0, STATIC_ROUNDS,
                              lambda _, st: round_body(st), (alive0, kept0))
    _, kept = jax.lax.cond(round_cond(state),
                           lambda st: jax.lax.while_loop(round_cond,
                                                         round_body, st),
                           lambda st: st, state)
    sup_ref[0:1, pl.ds(start, BLOCK)] = 1.0 - kept

    # degenerate suppressor-side coordinates for non-kept tile boxes:
    # x-extent becomes negative, so their sweep IoU rows are exactly 0 and
    # the sweep needs no kept-mask multiply.
    kept_col = kept.reshape(BLOCK, 1)
    dead = kept_col < 0.5
    kx1 = jnp.where(dead, 2.0, tx1)
    kx2 = jnp.where(dead, -2.0 - off, tx2)

    # (3) suppress all LATER boxes, chunked over columns to bound VMEM.
    # The boundary chunk (containing the tile itself) applies the
    # "strictly later" iota mask; every following chunk streams mask-free.
    # Real detection score distributions suppress heavily (the reference
    # golden case keeps 1934/6000), so late tiles are often FULLY
    # suppressed — skip their O(BLOCK x CHUNK) sweep, and skip
    # already-dead chunks.
    num_chunks = n_pad // CHUNK
    kept_any = jnp.sum(kept) > 0.0

    @pl.when(kept_any)
    def _():
        def chunk_hits(lo):
            return jnp.max(
                _over(kx1, ty1, kx2, ty2, tarea,
                      vrow(0, lo, CHUNK), vrow(1, lo, CHUNK),
                      vrow(2, lo, CHUNK), vrow(3, lo, CHUNK),
                      area_ref[0:1, pl.ds(lo, CHUNK)], threshold, off),
                axis=0, keepdims=True)

        # boundary chunk: mask to strictly-later columns
        blo = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
        gcol = blo + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        later = (gcol >= start + BLOCK).astype(jnp.float32)
        cur = sup_ref[0:1, pl.ds(blo, CHUNK)]
        sup_ref[0:1, pl.ds(blo, CHUNK)] = jnp.minimum(
            cur + chunk_hits(blo) * later, 1.0)

        def sweep(ci, _):
            lo = pl.multiple_of(ci * CHUNK, CHUNK)
            cur = sup_ref[0:1, pl.ds(lo, CHUNK)]
            # no dead-chunk skip: the predicate reduction would cost more
            # than the streamed VPU work it saves (measured)
            sup_ref[0:1, pl.ds(lo, CHUNK)] = jnp.minimum(
                cur + chunk_hits(lo), 1.0)
            return 0

        jax.lax.fori_loop(start // CHUNK + 1, num_chunks, sweep, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        keep_ref[:] = (1.0 - sup_ref[:]) * valid_ref[:]


def nms_sorted_mask_pallas(boxes_sorted: jnp.ndarray,
                           valid_sorted: jnp.ndarray, threshold: float,
                           plus_one: bool = True,
                           interpret: bool = False) -> jnp.ndarray:
    """Keep mask (in sorted order) for score-descending boxes (N, 4)."""
    n = boxes_sorted.shape[0]
    pad_to = max(BLOCK, CHUNK)
    n_pad = -(-n // pad_to) * pad_to
    bf = boxes_sorted.astype(jnp.float32)
    rows = jnp.pad(bf.T, ((0, 0), (0, n_pad - n)))      # (4, n_pad)
    cols = jnp.pad(bf, ((0, n_pad - n), (0, 0)))        # (n_pad, 4)
    v = jnp.pad(valid_sorted.astype(jnp.float32),
                (0, n_pad - n)).reshape(1, n_pad)
    keep = pl.pallas_call(
        functools.partial(_nms_kernel, n_pad=n_pad, threshold=threshold,
                          off=1.0 if plus_one else 0.0),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        grid=(n_pad // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32),
                        pltpu.VMEM((1, n_pad), jnp.float32),
                        pltpu.VMEM((BLOCK, BLOCK), jnp.float32),
                        pltpu.VMEM((BLOCK, BLOCK), jnp.float32)],
        interpret=interpret,
    )(rows, cols, v)
    return keep[0, :n] > 0.5
