"""ROI detection head — TPU-native port of ``Model.Detection``
(`Detection/model.py:228-417`).

Flow parity: proposals labeled by IoU (>= .5 fg with the matched gt class),
per-image sampling of 128 slots / 32 fg cap (`:271-277`); ROIAlign pool →
"hidden" (the backbone's layer4) → global max pool → two linears (cls,
4*cls regression) (`:284-296`); per-image CE + class-selected
beta-smooth-L1 with delta targets normalized by std (.1,.1,.2,.2)
(`:354-379`); eval-time detection generation with per-class NMS@0.3
(`:381-417`).

SD tap: the "roi feature map" exported for the feature attack is the
GLOBAL-POOLED hidden vector ((R,1,1,2048) in the reference's NCHW view,
`model.py:298-335`); AFN channel statistics therefore reduce over the 2048
channel axis per sample.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.nms import nms_mask
from ...ops.roi_align import pool_rois
from . import boxes as B
from .sampling import SampleResult, beta_smooth_l1, masked_mean, sample_fg_bg


class RoiTargets(NamedTuple):
    sample: SampleResult        # (B, S) slots into the proposal axis (vmapped)
    boxes: jnp.ndarray          # (S, 4) sampled proposal boxes
    gt_classes: jnp.ndarray     # (S,) int32 (0 = background)
    gt_deltas: jnp.ndarray      # (S, 4) normalized regression targets


def roi_targets(rng: jax.Array, proposals: jnp.ndarray,
                gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                gt_valid: jnp.ndarray, num_samples: int = 128,
                fg_cap: int = 32) -> RoiTargets:
    """One image's proposal labeling + sampling (`model.py:263-283`).

    Zero-padded proposal slots have IoU 0 with every gt → background
    candidates, exactly as the reference's zero-padding behaves.
    """
    ious = B.iou(proposals, gt_boxes)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    max_iou = jnp.max(ious, axis=1)
    assignment = jnp.argmax(ious, axis=1)
    fg = max_iou >= 0.5
    bg = max_iou < 0.5  # label 0
    labels = jnp.where(fg, gt_classes[assignment], 0).astype(jnp.int32)

    sample = sample_fg_bg(rng, fg & (labels > 0), bg, num_samples, fg_cap)
    sel = sample.indices
    sel_boxes = proposals[sel]
    sel_gt_boxes = gt_boxes[assignment[sel]]
    sel_classes = jnp.where(sample.is_fg, labels[sel], 0)
    deltas = B.encode_deltas(sel_boxes, sel_gt_boxes)
    mean = jnp.asarray(B.TRANSFORMER_NORMALIZE_MEAN)
    std = jnp.asarray(B.TRANSFORMER_NORMALIZE_STD)
    deltas = (deltas - mean) / std
    return RoiTargets(sample=sample, boxes=sel_boxes, gt_classes=sel_classes,
                      gt_deltas=deltas)


class RoiPredictors(nn.Module):
    """The two linear heads on the pooled hidden vector
    (`model.py:235-236`)."""
    num_classes: int
    dtype: Any = jnp.float32

    def setup(self):
        self.cls = nn.Dense(self.num_classes, dtype=self.dtype,
                            name="proposal_class")
        self.reg = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                            name="proposal_transformer")

    def __call__(self, hidden_vec: jnp.ndarray):
        """(R, C_hidden) → ((R, classes), (R, classes*4))."""
        return self.cls(hidden_vec), self.reg(hidden_vec)


def roi_loss(class_logits: jnp.ndarray, reg_out: jnp.ndarray,
             targets: RoiTargets, beta: float, num_classes: int
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One image's (CE, smooth-L1) over its sampled slots
    (`model.py:354-379`): regression deltas are selected per sample at the
    GT class column; only fg (class > 0) rows contribute to L1."""
    logp = jax.nn.log_softmax(class_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets.gt_classes[:, None], axis=-1)[:, 0]
    ce = masked_mean(ce, targets.sample.valid)
    reg = reg_out.reshape(-1, num_classes, 4)
    reg_sel = jnp.take_along_axis(
        reg, targets.gt_classes[:, None, None].repeat(4, axis=2), axis=1
    )[:, 0, :]
    fg_mask = targets.sample.is_fg & (targets.gt_classes > 0)
    l1 = beta_smooth_l1(reg_sel, targets.gt_deltas, beta, fg_mask)
    return ce, l1


def generate_detections(proposals: jnp.ndarray, class_logits: jnp.ndarray,
                        reg_out: jnp.ndarray, image_width: int,
                        image_height: int, num_classes: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One image's eval-time detections (`model.py:381-417`).

    Returns (boxes (P, C, 4), probs (P, C), keep (P, C)) where keep is the
    per-class NMS@0.3 survival mask — the static-shape analog of the
    reference's concatenated per-class keep lists (host code applies the
    prob>0.05 filter and flattens, `evaluator.py:31-39`). vmap over batch.
    """
    reg = reg_out.reshape(-1, num_classes, 4)
    std = jnp.asarray(B.TRANSFORMER_NORMALIZE_STD)
    mean = jnp.asarray(B.TRANSFORMER_NORMALIZE_MEAN)
    reg = reg * std + mean
    boxes = B.decode_deltas(proposals[:, None, :].repeat(num_classes, 1), reg)
    boxes = B.clip(boxes, 0, 0, image_width, image_height)
    probs = jax.nn.softmax(class_logits, axis=-1)

    def per_class(c_boxes, c_probs):
        return nms_mask(c_boxes, c_probs, 0.3, plus_one=True)

    # classes 1..C-1 (skip background); keep axis layout (P, C) with
    # class 0 all-False.
    keep = jax.vmap(per_class, in_axes=(1, 1), out_axes=1)(
        boxes[:, 1:], probs[:, 1:])
    keep = jnp.concatenate(
        [jnp.zeros((boxes.shape[0], 1), bool), keep], axis=1)
    return boxes, probs, keep


def pool_and_hidden(features: jnp.ndarray, boxes: jnp.ndarray,
                    batch_indices: jnp.ndarray, hidden_fn,
                    mode: str = "align") -> jnp.ndarray:
    """Pooler → layer4 "hidden" → global max pool → (R, C_hidden) vector
    (`model.py:284-296`). ``hidden_fn`` runs the backbone's layer4;
    ``mode`` selects ALIGN or the legacy POOLING pooler."""
    pooled = pool_rois(features, boxes, batch_indices, mode)  # (R,7,7,C)
    hidden = hidden_fn(pooled)                               # (R,4,4,2048)
    return jnp.max(hidden, axis=(1, 2))                      # global max
