"""Region Proposal Network — TPU-native port of
`Detection/rpn/region_proposal_network.py`.

Structure parity: 3x3 conv(512)+ReLU trunk, 1x1 heads for 9-anchor
objectness (2-way) and regression (`:19-36`); the trunk output is the
"rpn feature" tap for the SD-rpn attack (`return_type='head'/'tail'`,
`:106-170`).

Static-shape redesign (SURVEY.md §7.3):
* cross-boundary anchors are MASKED (label -1) instead of removed
  (`:62-67` removes them; identical label/sampling semantics since -1
  anchors are never sampled);
* fg/bg sampling is fixed-slot masked sampling (:mod:`.sampling`);
* proposal generation uses fixed-capacity top-k + padded NMS; the
  reference's softmax-over-the-anchor-axis scoring
  (`:246` — a quirk; softmax over ALL anchors of one image) is replaced by
  raw-logit ranking, which produces the identical ordering (monotonic map)
  and therefore identical proposals.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.nms import nms_select_presorted
from . import boxes as B
from .sampling import SampleResult, beta_smooth_l1, masked_mean, sample_fg_bg


class RPNHeads(nn.Module):
    """Trunk + prediction heads. Exposed separately so the SD-rpn attack
    can tap the trunk feature."""
    hidden_channels: int = 512
    num_anchors: int = 9
    dtype: Any = jnp.float32

    def setup(self):
        self.trunk_conv = nn.Conv(self.hidden_channels, (3, 3), padding=1,
                                  dtype=self.dtype, name="trunk")
        self.objectness_conv = nn.Conv(self.num_anchors * 2, (1, 1),
                                       dtype=self.dtype, name="objectness")
        self.transformer_conv = nn.Conv(self.num_anchors * 4, (1, 1),
                                        dtype=self.dtype, name="transformer")

    def trunk(self, features):
        """The SD-rpn tap point (`region_proposal_network.py:108-113`)."""
        return nn.relu(self.trunk_conv(features))

    def predict(self, trunk_feature):
        """(B,H,W,512) → objectness (B,A,2), deltas (B,A,4) with A=H*W*9.
        NHWC raster order matches the anchor grid's ys-major order."""
        b = trunk_feature.shape[0]
        obj = self.objectness_conv(trunk_feature).reshape(b, -1, 2)
        reg = self.transformer_conv(trunk_feature).reshape(b, -1, 4)
        return obj, reg

    def __call__(self, features):
        return self.predict(self.trunk(features))


class RPNTargets(NamedTuple):
    sample: SampleResult          # per-image sampled anchor slots
    gt_objectness: jnp.ndarray    # (S,) int32 0/1
    gt_deltas: jnp.ndarray        # (S, 4)


def label_anchors(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                  gt_valid: jnp.ndarray, image_width: int,
                  image_height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image anchor labeling (`region_proposal_network.py:69-83`):
    -1 ignore / 0 bg (max IoU < .3) / 1 fg (per-gt argmax with IoU > 0, or
    max IoU >= .7); cross-boundary anchors forced to -1 (masked analog of
    the reference's removal). Returns (labels (A,), assignment (A,))."""
    ious = B.iou(anchors, gt_boxes)                      # (A, G)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)      # mask padded gts
    anchor_max = jnp.max(ious, axis=1)
    assignment = jnp.argmax(ious, axis=1)
    gt_max = jnp.max(ious, axis=0)                       # (G,)

    labels = jnp.full(anchors.shape[0], -1, jnp.int32)
    labels = jnp.where(anchor_max < 0.3, 0, labels)
    additions = jnp.any((ious > 0) & (ious == gt_max[None, :])
                        & gt_valid[None, :], axis=1)
    labels = jnp.where(additions, 1, labels)
    labels = jnp.where(anchor_max >= 0.7, 1, labels)
    inside_mask = B.inside(anchors, 0, 0, image_width, image_height)
    labels = jnp.where(inside_mask, labels, -1)
    return labels, assignment


def rpn_targets(rng: jax.Array, anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                gt_valid: jnp.ndarray, image_width: int, image_height: int,
                num_samples: int = 256, fg_cap: int = 128) -> RPNTargets:
    """Label + sample one image's anchors; gather regression targets."""
    labels, assignment = label_anchors(anchors, gt_boxes, gt_valid,
                                       image_width, image_height)
    sample = sample_fg_bg(rng, labels == 1, labels == 0, num_samples, fg_cap)
    sel = sample.indices
    sel_anchors = anchors[sel]
    sel_gt = gt_boxes[assignment[sel]]
    gt_deltas = B.encode_deltas(sel_anchors, sel_gt)
    gt_obj = jnp.where(sample.is_fg, 1, 0).astype(jnp.int32)
    return RPNTargets(sample=sample, gt_objectness=gt_obj,
                      gt_deltas=gt_deltas)


def rpn_loss(objectness: jnp.ndarray, deltas: jnp.ndarray,
             targets: RPNTargets, beta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One image's (objectness CE, fg smooth-L1) — the reference computes
    these per image and returns batch vectors for DataParallel gathering
    (`region_proposal_network.py:175-198`); vmap this over the batch."""
    sel = targets.sample.indices
    obj_sel = objectness[sel]
    reg_sel = deltas[sel]
    logp = jax.nn.log_softmax(obj_sel, axis=-1)
    ce = -jnp.take_along_axis(logp, targets.gt_objectness[:, None],
                              axis=-1)[:, 0]
    ce = masked_mean(ce, targets.sample.valid)
    l1 = beta_smooth_l1(reg_sel, targets.gt_deltas, beta,
                        targets.sample.is_fg)
    return ce, l1


def generate_proposals(anchors: jnp.ndarray, objectness: jnp.ndarray,
                       deltas: jnp.ndarray, image_width: int,
                       image_height: int, pre_nms_top_n: int,
                       post_nms_top_n: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One image: decode → clip → top-k → NMS@0.7 → top post_nms_top_n.
    Returns (boxes (post_n, 4) zero-padded, valid (post_n,)) — the
    reference zero-pads short proposal lists identically
    (`region_proposal_network.py:257-270`). vmap over the batch."""
    proposals = B.decode_deltas(anchors, deltas)
    proposals = B.clip(proposals, 0, 0, image_width, image_height)
    scores = objectness[:, 1]  # raw logit; same ranking as the softmax quirk
    k = min(pre_nms_top_n, anchors.shape[0])
    _, top_idx = jax.lax.top_k(scores, k)   # top_k output is score-sorted
    top_boxes = proposals[top_idx]
    return nms_select_presorted(top_boxes, 0.7, post_nms_top_n,
                                plus_one=True)
