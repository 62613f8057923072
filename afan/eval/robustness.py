"""Robustness and analysis evaluations.

Ports of the reference's eval surface:

* input-PGD robustness eval — classification ``pgd_validate``
  (`Segmentation/args.py:223-255` / same pattern in Classification) and
  detection ``eval_PGD`` + ``Evaluator.ori_rob_evaluate``
  (`Detection/attack_algo.py:207-233`, `Detection/evaluator.py:90-133`);
* SAT-layer evaluation — mAP/accuracy when evaluating FROM an interpolated
  adversarial feature (`Detection/evaluator.py:135-183`
  ``sat_layer_evaluate``);
* weight-space perturbation probing for loss landscapes
  (`Detection/attack_algo.py:296-319` ``perturb_weight`` +
  `Detection/eval_loss_vis.py`).

NOTE: the reference also ships `eval_rob.py` calling ``untarget_PGD``,
which is commented out in its attack_algo (SURVEY.md §7.3 "broken
eval_rob") — the working equivalent here is :func:`robust_accuracy` /
:func:`detection_input_pgd` with the ``eval_PGD`` loss.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.attack import pgd


def make_robust_eval_step(model, num_classes: int, steps: int = 3,
                          gamma: float = 2.0 / 255, eps: float = 8.0 / 255,
                          randinit: bool = True, bailout_tol=None):
    """Classification robustness: input PGD against the eval-mode model,
    then top-1 on the adversarial inputs."""
    import optax

    def eval_fn(state, images, labels, rng):
        variables = state.variables()

        def loss_fn(x):
            logits = model.apply(variables, x, 0, None, False)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        adv = pgd(loss_fn, images, steps=steps, gamma=gamma, eps=eps,
                  randinit=randinit, rng=rng, bailout_tol=bailout_tol)
        logits = model.apply(variables, adv, 0, None, False)
        correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        return {"correct": correct,
                "count": jnp.asarray(labels.shape[0], jnp.int32)}

    return jax.jit(eval_fn)


def make_detection_pgd_fn(model, steps: int = 3, gamma: float = 2.0 / 255,
                          eps: float = 8.0 / 255, randinit: bool = False,
                          bailout_tol=None):
    """``eval_PGD`` parity (`Detection/attack_algo.py:207-233`): attack the
    input against the TRAIN-mode 4-loss sum, no final [0,1] clamp."""

    def attack(state, images, gt_boxes, gt_classes, gt_valid, rng):
        variables = state.variables()
        r_attack, r_init = jax.random.split(rng)

        def loss_fn(x):
            return model.apply(variables, x, gt_boxes, gt_classes, gt_valid,
                               r_attack, method=model.losses).total()

        return pgd(loss_fn, images, steps=steps, gamma=gamma, eps=eps,
                   randinit=randinit, rng=r_init, bailout_tol=bailout_tol)

    return jax.jit(attack)


def make_sat_layer_detect_fn(model, tap: int, alpha: float,
                             attack_steps: int = 1,
                             gamma: float = 0.9 / 255,
                             eps: float = 2.0 / 255,
                             mix: bool = False):
    """``sat_layer_evaluate`` (`Detection/evaluator.py:135-183`): build the
    adversarial feature at ``tap``, interpolate clean→adv by ``alpha``
    (``--sat_layer k`` of an N-point spectrum == alpha k/(N-1)), optionally
    AFN the interpolated feature with the CLEAN feature's statistics —
    the reference's ``--mix`` calls ``mix_feature(interp, feature_map)``
    with the arguments in that (reversed vs training) order
    (`evaluator.py:168-170`) — then run eval detection FROM that feature.
    Returns a jitted (state, images, gt...) → detections function."""

    def detect(state, images, gt_boxes, gt_classes, gt_valid, rng):
        variables = state.variables()
        feat = model.apply(variables, images, tap, False,
                           method=model.backbone_head)
        feat = jax.lax.stop_gradient(feat)

        def loss_fn(f):
            return model.apply(variables, images, gt_boxes, gt_classes,
                               gt_valid, rng, tap, f,
                               method=model.losses).total()

        adv = pgd(loss_fn, feat, steps=attack_steps, gamma=gamma, eps=eps)
        interp = feat + alpha * (adv - feat)
        if mix:
            from ..core.afn import mix_feature
            interp = mix_feature(interp, feat)
        # eval path from the interpolated feature: tail to layer3, then the
        # standard eval detection head
        features = model.apply(variables, interp, tap, False,
                               method=model.backbone_tail)
        return _detect_from_features(model, variables, features,
                                     images.shape)

    return jax.jit(detect)


def _detect_from_features(model, variables, features, images_shape):
    """Eval detection from precomputed backbone features (mirrors
    FasterRCNN.detect after the backbone)."""

    def run(mdl):
        bsz, ih, iw = images_shape[0], images_shape[1], images_shape[2]
        fh, fw = features.shape[1], features.shape[2]
        anchors = mdl._anchors((ih, iw), (fh, fw))
        obj, reg = mdl.rpn(features)
        from ..models.frcnn.rpn import generate_proposals
        from ..models.frcnn.roi_head import generate_detections
        proposals, pvalid = jax.vmap(
            generate_proposals, in_axes=(None, 0, 0, None, None, None, None)
        )(anchors, obj, reg, iw, ih, mdl.cfg.eval_pre_nms_top_n,
          mdl.cfg.eval_post_nms_top_n)
        s = proposals.shape[1]
        flat = proposals.reshape(-1, 4)
        bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), s)
        hidden_vec = mdl._hidden_vec(features, flat, bidx, False)
        cls, reg_o = mdl.roi_pred(hidden_vec)
        cls = cls.reshape(bsz, s, -1)
        reg_o = reg_o.reshape(bsz, s, -1)
        boxes, probs, keep = jax.vmap(
            generate_detections, in_axes=(0, 0, 0, None, None, None)
        )(proposals, cls, reg_o, iw, ih, mdl.cfg.num_classes)
        return boxes, probs, keep & pvalid[:, :, None]

    return model.apply(variables, method=lambda mdl: run(mdl))


def make_input_surface_fn(model, extent: float = 0.1, points: int = 40,
                          chunk: int = 16):
    """ALP input-space loss surface (`Detection/py/evaluator_alp_zzy.py:131-186`
    + `py/alp_utils_zzy.py:9-32`): probe the train-mode 4-loss sum on a
    ``points``x``points`` grid of images ``x*r1 + y*r2`` where ``r1`` is
    the sign of the input gradient and ``r2`` a Rademacher direction, each
    grid image min-max rescaled to [0,1].

    TPU-native: the reference runs the 1600 grid forwards sequentially;
    here the grid is batched with a chunked ``vmap`` (``lax.map`` with
    ``batch_size``) so the MXU sees ``chunk``-sized batches — one jitted
    program for the whole surface.

    Parity notes: the grid is ``arange(-extent, extent, 2*extent/points)``
    (upper endpoint excluded) and the center cell (x=y=0) rescales an
    all-zero image 0/0 → NaN loss, exactly as the reference's torch code
    does; callers should expect one NaN at [points//2, points//2].
    """

    def surface(state, images, gt_boxes, gt_classes, gt_valid, rng):
        variables = state.variables()

        def total_loss(x):
            return model.apply(variables, x, gt_boxes, gt_classes, gt_valid,
                               rng, method=model.losses).total()

        r1 = jnp.sign(jax.grad(total_loss)(images))
        # torch.where(rand > 0.5, -1, 1)  (alp_utils_zzy.py:9-15)
        r2 = jnp.where(jax.random.uniform(rng, images.shape) > 0.5,
                       -1.0, 1.0)
        step = 2.0 * extent / points
        xs = -extent + step * jnp.arange(points, dtype=jnp.float32)
        X, Y = jnp.meshgrid(xs, xs)
        xy = jnp.stack([X.reshape(-1), Y.reshape(-1)], -1)

        def one(pt):
            new = pt[0] * r1 + pt[1] * r2
            scaled = (new - new.min()) / (new.max() - new.min())
            return total_loss(scaled)

        Z = jax.lax.map(one, xy, batch_size=chunk)
        return Z.reshape(points, points)

    return jax.jit(surface)


def perturb_weight_directions(params, rng: np.random.RandomState):
    """``perturb_weight`` (`Detection/attack_algo.py:296-319`): one random
    direction per parameter, globally L2-normalized; 'normalize' layers
    excluded there — our input normalization is parameter-free, so every
    leaf participates."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    dirs = [rng.rand(*np.shape(l)).astype(np.float32) for l in leaves]
    norm = np.sqrt(sum(float((d ** 2).sum()) for d in dirs))
    dirs = [d / norm for d in dirs]
    return jax.tree_util.tree_unflatten(treedef, dirs)


def loss_landscape_probe(loss_fn: Callable, params, directions, scales):
    """`eval_loss_vis.py` semantics: loss at params + scale * direction for
    each scale. Returns list of floats."""
    out = []
    for s in scales:
        shifted = jax.tree.map(lambda p, d: p + s * d, params, directions)
        out.append(float(loss_fn(shifted)))
    return out
