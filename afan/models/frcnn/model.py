"""Faster R-CNN composite model with SE/SD tap points — TPU-native port of
`Detection/model.py` (dict-dispatch ``Model.forward`` there; explicit
static methods here, one traced XLA program per tap configuration).

Mapping from the reference's input_dict modes:

| reference mode                      | method here                       |
|-------------------------------------|-----------------------------------|
| flag='head', out_idx=k              | :meth:`backbone_head`             |
| int out_idx + flag='tail'/'clean'   | :meth:`losses` (feature_tap/adv)  |
| out_idx='roi_head'                  | :meth:`roi_head_forward`          |
| out_idx='roi_tail'                  | :meth:`roi_tail_losses`           |
| out_idx='rpn_head'                  | :meth:`rpn_head_forward`          |
| out_idx='rpn_tail'                  | :meth:`rpn_tail_losses`           |
| eval clean                          | :meth:`detect`                    |

BN freeze parity: every backbone BatchNorm runs frozen
(`Detection/model.py:27-35`); its scale/bias get a zero-update optimizer
label, as do the stem+layer1 parameters
(`Detection/backbone/resnet50.py:36-38`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..resnet import NUM_FEATURES_OUT, ResNetTorso, from_name
from . import boxes as B
from .anchors import ANCHOR_RATIOS, ANCHOR_SIZES, generate_anchors
from .roi_head import (RoiPredictors, RoiTargets, generate_detections,
                       pool_and_hidden, roi_loss, roi_targets)
from .rpn import RPNHeads, generate_proposals, rpn_loss, rpn_targets


class DetectionLosses(NamedTuple):
    """The 4 per-image loss vectors of the reference forward
    (`Detection/model.py:58-75`); mean them as `compute_loss` does
    (`Detection/attack_algo.py:21-27`)."""
    anchor_objectness: jnp.ndarray
    anchor_transformer: jnp.ndarray
    proposal_class: jnp.ndarray
    proposal_transformer: jnp.ndarray

    def total(self) -> jnp.ndarray:
        return (self.anchor_objectness.mean()
                + self.anchor_transformer.mean()
                + self.proposal_class.mean()
                + self.proposal_transformer.mean())


@dataclasses.dataclass(frozen=True)
class FRCNNConfig:
    """TrainConfig/EvalConfig parity (`Detection/config/*.py`)."""
    backbone: str = "resnet50"
    num_classes: int = 21
    anchor_ratios: Sequence[Tuple[int, int]] = ANCHOR_RATIOS
    anchor_sizes: Sequence[int] = ANCHOR_SIZES
    train_pre_nms_top_n: int = 12000
    train_post_nms_top_n: int = 2000
    eval_pre_nms_top_n: int = 6000
    eval_post_nms_top_n: int = 300
    anchor_smooth_l1_beta: float = 1.0
    proposal_smooth_l1_beta: float = 1.0
    roi_samples: int = 128
    roi_fg_cap: int = 32
    rpn_samples: int = 256
    rpn_fg_cap: int = 128
    pooler_mode: str = "align"   # Config.POOLER_MODE: 'align' | 'pooling'


class FasterRCNN(nn.Module):
    cfg: FRCNNConfig = FRCNNConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone: ResNetTorso = from_name(
            self.cfg.backbone, frozen_bn=True, dtype=self.dtype)
        num_feat = NUM_FEATURES_OUT[self.cfg.backbone]
        self.rpn = RPNHeads(
            num_anchors=len(self.cfg.anchor_ratios) * len(self.cfg.anchor_sizes),
            dtype=self.dtype)
        self.roi_pred = RoiPredictors(num_classes=self.cfg.num_classes,
                                      dtype=self.dtype)

    # ---------- backbone taps (SE attack) ----------

    def backbone_head(self, images, tap: int, train: bool = False):
        """flag='head': input → backbone feature after layer``tap`` (1-3)
        (`resnet50_ori.py:203-236`)."""
        return self.backbone(images, 0, tap, train)

    def backbone_tail(self, feature, tap: int, train: bool = False):
        """Resume layer``tap``→layer3 from an (adversarial) feature."""
        return self.backbone(feature, tap, 3, train)

    def features_clean(self, images, train: bool = False):
        return self.backbone(images, 0, 3, train)

    # ---------- anchors ----------

    def _anchors(self, image_hw: Tuple[int, int],
                 feature_hw: Tuple[int, int]) -> jnp.ndarray:
        h, w = image_hw
        fh, fw = feature_hw
        a = generate_anchors(w, h, fw, fh, self.cfg.anchor_ratios,
                             self.cfg.anchor_sizes)
        return jnp.asarray(a)

    # ---------- training losses ----------

    def losses(self, images, gt_boxes, gt_classes, gt_valid, rng,
               feature_tap: Optional[int] = None,
               adv_feature: Optional[jnp.ndarray] = None,
               train: bool = True) -> DetectionLosses:
        """Full 4-loss forward: clean (`model.py:58-75`) when
        ``adv_feature`` is None, otherwise the SE tail forward resuming from
        the adversarial backbone feature at ``feature_tap``."""
        if adv_feature is not None:
            features = self.backbone_tail(adv_feature, feature_tap, train)
        else:
            features = self.features_clean(images, train)
        return self._losses_from_features(features, images.shape, gt_boxes,
                                          gt_classes, gt_valid, rng, train)

    def _losses_from_features(self, features, images_shape, gt_boxes,
                              gt_classes, gt_valid, rng, train: bool
                              ) -> DetectionLosses:
        bsz, ih, iw = images_shape[0], images_shape[1], images_shape[2]
        fh, fw = features.shape[1], features.shape[2]
        anchors = self._anchors((ih, iw), (fh, fw))
        obj, reg = self.rpn(features)

        rngs = jax.random.split(rng, 2 * bsz)
        rpn_tgts = jax.vmap(
            rpn_targets, in_axes=(0, None, 0, 0, None, None, None, None)
        )(rngs[:bsz], anchors, gt_boxes, gt_valid, iw, ih,
          self.cfg.rpn_samples, self.cfg.rpn_fg_cap)
        a_ce, a_l1 = jax.vmap(rpn_loss, in_axes=(0, 0, 0, None))(
            obj, reg, rpn_tgts, self.cfg.anchor_smooth_l1_beta)

        proposals, _ = jax.vmap(
            generate_proposals, in_axes=(None, 0, 0, None, None, None, None)
        )(anchors, jax.lax.stop_gradient(obj), jax.lax.stop_gradient(reg),
          iw, ih, self.cfg.train_pre_nms_top_n, self.cfg.train_post_nms_top_n)

        roi_tgts = jax.vmap(
            roi_targets, in_axes=(0, 0, 0, 0, 0, None, None)
        )(rngs[bsz:], proposals, gt_boxes, gt_classes, gt_valid,
          self.cfg.roi_samples, self.cfg.roi_fg_cap)

        p_ce, p_l1 = self._roi_losses_from_targets(features, roi_tgts, train)
        return DetectionLosses(a_ce, a_l1, p_ce, p_l1)

    def compute_targets(self, images, gt_boxes, gt_classes, gt_valid, rng,
                        train: bool = True):
        """One clean forward's worth of RPN targets + proposals + ROI
        targets, for reuse across multiple tail forwards (the
        ``share_proposals`` fast path — the reference resamples in every
        forward, which is random-noise-equivalent but costs a proposal
        NMS + labeling per forward)."""
        features = self.features_clean(images, train)
        bsz, ih, iw = images.shape[0], images.shape[1], images.shape[2]
        fh, fw = features.shape[1], features.shape[2]
        anchors = self._anchors((ih, iw), (fh, fw))
        obj, reg = self.rpn(features)
        rngs = jax.random.split(rng, 2 * bsz)
        rpn_tgts = jax.vmap(
            rpn_targets, in_axes=(0, None, 0, 0, None, None, None, None)
        )(rngs[:bsz], anchors, gt_boxes, gt_valid, iw, ih,
          self.cfg.rpn_samples, self.cfg.rpn_fg_cap)
        proposals, _ = jax.vmap(
            generate_proposals, in_axes=(None, 0, 0, None, None, None, None)
        )(anchors, jax.lax.stop_gradient(obj), jax.lax.stop_gradient(reg),
          iw, ih, self.cfg.train_pre_nms_top_n, self.cfg.train_post_nms_top_n)
        roi_tgts = jax.vmap(
            roi_targets, in_axes=(0, 0, 0, 0, 0, None, None)
        )(rngs[bsz:], proposals, gt_boxes, gt_classes, gt_valid,
          self.cfg.roi_samples, self.cfg.roi_fg_cap)
        return rpn_tgts, roi_tgts

    def losses_from_targets(self, images, rpn_tgts, roi_tgts, rng,
                            feature_tap: Optional[int] = None,
                            adv_feature: Optional[jnp.ndarray] = None,
                            train: bool = True) -> DetectionLosses:
        """Full 4-loss forward reusing precomputed targets: rpn losses on
        the fixed sampled anchors, roi losses pooling the fixed sampled
        boxes from THIS forward's features. No NMS/labeling inside."""
        if adv_feature is not None:
            features = self.backbone_tail(adv_feature, feature_tap, train)
        else:
            features = self.features_clean(images, train)
        obj, reg = self.rpn(features)
        a_ce, a_l1 = jax.vmap(rpn_loss, in_axes=(0, 0, 0, None))(
            obj, reg, rpn_tgts, self.cfg.anchor_smooth_l1_beta)
        p_ce, p_l1 = self._roi_losses_from_targets(features, roi_tgts, train)
        return DetectionLosses(a_ce, a_l1, p_ce, p_l1)

    def _roi_losses_from_targets(self, features, roi_tgts: RoiTargets,
                                 train: bool):
        bsz, s = roi_tgts.boxes.shape[0], roi_tgts.boxes.shape[1]
        flat_boxes = roi_tgts.boxes.reshape(-1, 4)
        bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), s)
        hidden_vec = self._hidden_vec(features, flat_boxes, bidx, train)
        cls, reg_o = self.roi_pred(hidden_vec)
        cls = cls.reshape(bsz, s, -1)
        reg_o = reg_o.reshape(bsz, s, -1)
        p_ce, p_l1 = jax.vmap(roi_loss, in_axes=(0, 0, 0, None, None))(
            cls, reg_o, roi_tgts, self.cfg.proposal_smooth_l1_beta,
            self.cfg.num_classes)
        return p_ce, p_l1

    def _hidden_vec(self, features, flat_boxes, bidx, train: bool):
        return pool_and_hidden(
            features, flat_boxes, bidx,
            hidden_fn=lambda x: self.backbone.run_stage(x, 3, train),
            mode=self.cfg.pooler_mode)

    # ---------- SD taps: ROI head (`model.py:115-150,298-351`) ----------

    def roi_head_forward(self, images, gt_boxes, gt_classes, gt_valid, rng,
                         train: bool = True) -> Dict[str, Any]:
        """out_idx='roi_head': full forward up to the pooled hidden vector;
        exports the SD attack dict (roi feature + frozen targets + the rpn
        losses computed on the clean pass)."""
        features = self.features_clean(images, train)
        bsz, ih, iw = images.shape[0], images.shape[1], images.shape[2]
        fh, fw = features.shape[1], features.shape[2]
        anchors = self._anchors((ih, iw), (fh, fw))
        obj, reg = self.rpn(features)
        rngs = jax.random.split(rng, 2 * bsz)
        rpn_tgts = jax.vmap(
            rpn_targets, in_axes=(0, None, 0, 0, None, None, None, None)
        )(rngs[:bsz], anchors, gt_boxes, gt_valid, iw, ih,
          self.cfg.rpn_samples, self.cfg.rpn_fg_cap)
        a_ce, a_l1 = jax.vmap(rpn_loss, in_axes=(0, 0, 0, None))(
            obj, reg, rpn_tgts, self.cfg.anchor_smooth_l1_beta)
        proposals, _ = jax.vmap(
            generate_proposals, in_axes=(None, 0, 0, None, None, None, None)
        )(anchors, jax.lax.stop_gradient(obj), jax.lax.stop_gradient(reg),
          iw, ih, self.cfg.train_pre_nms_top_n, self.cfg.train_post_nms_top_n)
        roi_tgts = jax.vmap(
            roi_targets, in_axes=(0, 0, 0, 0, 0, None, None)
        )(rngs[bsz:], proposals, gt_boxes, gt_classes, gt_valid,
          self.cfg.roi_samples, self.cfg.roi_fg_cap)
        bsz_s = bsz * roi_tgts.boxes.shape[1]
        flat_boxes = roi_tgts.boxes.reshape(-1, 4)
        bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32),
                          roi_tgts.boxes.shape[1])
        hidden_vec = self._hidden_vec(features, flat_boxes, bidx, train)
        return {
            "anchor_objectness_losses": a_ce,
            "anchor_transformer_losses": a_l1,
            "roi_feature_map": hidden_vec,   # (B*S, C_hidden) — the SD tap
            "roi_targets": roi_tgts,
        }

    def roi_tail_losses(self, roi_dict: Dict[str, Any],
                        roi_feature: Optional[jnp.ndarray] = None
                        ) -> DetectionLosses:
        """out_idx='roi_tail': resume from a (possibly adversarial) pooled
        roi feature → predictors → roi losses; rpn losses pass through from
        the head dict (`model.py:141-150,337-351`)."""
        hidden_vec = (roi_feature if roi_feature is not None
                      else roi_dict["roi_feature_map"])
        tgts: RoiTargets = roi_dict["roi_targets"]
        bsz, s = tgts.boxes.shape[0], tgts.boxes.shape[1]
        cls, reg_o = self.roi_pred(hidden_vec)
        cls = cls.reshape(bsz, s, -1)
        reg_o = reg_o.reshape(bsz, s, -1)
        p_ce, p_l1 = jax.vmap(roi_loss, in_axes=(0, 0, 0, None, None))(
            cls, reg_o, tgts, self.cfg.proposal_smooth_l1_beta,
            self.cfg.num_classes)
        return DetectionLosses(roi_dict["anchor_objectness_losses"],
                               roi_dict["anchor_transformer_losses"],
                               p_ce, p_l1)

    # ---------- SD taps: RPN trunk (`model.py:77-113`) ----------

    def rpn_head_forward(self, images, train: bool = True) -> Dict[str, Any]:
        """out_idx='rpn_head': backbone features + rpn trunk feature.
        NOTE: the reference's rpn-SD ascent is dead code (its update step is
        commented out, `Detection/attack_algo.py:133-145`); we implement the
        evidently-intended working version and document the divergence."""
        features = self.features_clean(images, train)
        rpn_feature = self.rpn.trunk(features)
        return {"features": features, "rpn_feature": rpn_feature}

    def rpn_tail_losses(self, rpn_dict: Dict[str, Any], images_shape,
                        gt_boxes, gt_classes, gt_valid, rng,
                        rpn_feature: Optional[jnp.ndarray] = None,
                        train: bool = True) -> DetectionLosses:
        """out_idx='rpn_tail': rpn predictions from a (possibly adversarial)
        trunk feature, then proposals + roi head on the CLEAN backbone
        features (`model.py:100-113`)."""
        features = rpn_dict["features"]
        trunk = (rpn_feature if rpn_feature is not None
                 else rpn_dict["rpn_feature"])
        bsz, ih, iw = images_shape[0], images_shape[1], images_shape[2]
        fh, fw = features.shape[1], features.shape[2]
        anchors = self._anchors((ih, iw), (fh, fw))
        obj, reg = self.rpn.predict(trunk)
        rngs = jax.random.split(rng, 2 * bsz)
        rpn_tgts = jax.vmap(
            rpn_targets, in_axes=(0, None, 0, 0, None, None, None, None)
        )(rngs[:bsz], anchors, gt_boxes, gt_valid, iw, ih,
          self.cfg.rpn_samples, self.cfg.rpn_fg_cap)
        a_ce, a_l1 = jax.vmap(rpn_loss, in_axes=(0, 0, 0, None))(
            obj, reg, rpn_tgts, self.cfg.anchor_smooth_l1_beta)
        proposals, _ = jax.vmap(
            generate_proposals, in_axes=(None, 0, 0, None, None, None, None)
        )(anchors, jax.lax.stop_gradient(obj), jax.lax.stop_gradient(reg),
          iw, ih, self.cfg.train_pre_nms_top_n, self.cfg.train_post_nms_top_n)
        roi_tgts = jax.vmap(
            roi_targets, in_axes=(0, 0, 0, 0, 0, None, None)
        )(rngs[bsz:], proposals, gt_boxes, gt_classes, gt_valid,
          self.cfg.roi_samples, self.cfg.roi_fg_cap)
        p_ce, p_l1 = self._roi_losses_from_targets(features, roi_tgts, train)
        return DetectionLosses(a_ce, a_l1, p_ce, p_l1)

    # ---------- eval (`model.py:164-180`) ----------

    def detect(self, images):
        """Eval clean forward → padded detections:
        boxes (B, P, C, 4), probs (B, P, C), keep (B, P, C) after per-class
        NMS@0.3; host code applies prob>0.05 and flattens
        (`evaluator.py:31-39`)."""
        features = self.features_clean(images, train=False)
        bsz, ih, iw = images.shape[0], images.shape[1], images.shape[2]
        fh, fw = features.shape[1], features.shape[2]
        anchors = self._anchors((ih, iw), (fh, fw))
        obj, reg = self.rpn(features)
        proposals, pvalid = jax.vmap(
            generate_proposals, in_axes=(None, 0, 0, None, None, None, None)
        )(anchors, obj, reg, iw, ih, self.cfg.eval_pre_nms_top_n,
          self.cfg.eval_post_nms_top_n)
        s = proposals.shape[1]
        flat_boxes = proposals.reshape(-1, 4)
        bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), s)
        hidden_vec = self._hidden_vec(features, flat_boxes, bidx, False)
        cls, reg_o = self.roi_pred(hidden_vec)
        cls = cls.reshape(bsz, s, -1)
        reg_o = reg_o.reshape(bsz, s, -1)
        boxes, probs, keep = jax.vmap(
            generate_detections, in_axes=(0, 0, 0, None, None, None)
        )(proposals, cls, reg_o, iw, ih, self.cfg.num_classes)
        keep = keep & pvalid[:, :, None]
        return boxes, probs, keep
