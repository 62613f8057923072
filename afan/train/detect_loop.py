"""Jit-compiled train steps for the detection stack.

Reference drivers: `Detection/train_baseline.py` (vanilla Faster R-CNN),
`Detection/train_baseline_advtrain.py` (input-PGD adversarial training),
and the A-FAN family — flagship `Detection/train_aug_final.py` (SE backbone
tap + SD roi/rpn tap, spectrum-5, AFN mask, 6 forwards) plus its SAT
(spectrum 3/5/7/10), multi-layer, and single-point variants, which the
reference forks into ~14 scripts. Here ONE step factory covers the family
via :class:`DetAfanConfig` (static layer masks / spectrum sizes — exactly
the consolidation SURVEY.md §7 prescribes).

TPU structure notes:
* the reference runs 11+ sequential forwards per step (§3.2); here the
  spectrum tails are vmapped into a single batched tail forward and the
  whole step (both PGD ascents included) is one XLA program;
* detection BatchNorm is ALWAYS frozen (`Detection/model.py:27-35`), so no
  mutable collections exist in the step — params in, params out;
* the stem+layer1 and all backbone BN scale/bias parameters are frozen via
  optimizer labels (:func:`detection_param_labels`), matching
  requires_grad=False in the reference (`backbone/resnet50.py:36-38`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..core.afn import mix_feature
from ..core.attack import pgd, uniform_init
from ..core.spectrum import sample_points
from ..models.frcnn.model import FasterRCNN
from .loop import TrainState, _apply_updates


def detection_param_labels(params) -> Any:
    """'frozen' for stem+layer1 and every backbone BN scale/bias; 'train'
    for everything else. Feed to optax.multi_transform with
    {'train': sgd(...), 'frozen': optax.set_to_zero()}."""

    def label(path, leaf):
        keys = [str(getattr(p, "key", "")) for p in path]
        in_backbone = any(k == "backbone" for k in keys)
        in_layer = any(k.startswith("layer") for k in keys)
        # stem = conv1/bn1 NOT nested inside any layerN block (name-based,
        # position-independent: a refactor that nests params deeper must
        # not silently unfreeze the stem)
        is_stem = (not in_layer) and any(k in ("conv1", "bn1")
                                         for k in keys)
        if in_backbone and (is_stem or any(k == "layer1" for k in keys)):
            return "frozen"
        if in_backbone and any(k.startswith("bn") or k.startswith("ds_bn")
                               for k in keys):
            # FrozenBatchNorm scale/bias anywhere in the backbone
            return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def detection_tx(schedule, momentum: float = 0.9,
                 weight_decay: float = 0.0005, freeze: bool = True
                 ) -> optax.GradientTransformation:
    """``freeze=True`` reproduces the reference's stem+layer1+BN freeze
    (it always starts from ImageNet weights). ``freeze=False`` trains
    everything — required for meaningful FROM-SCRATCH training, which the
    reference never does (BN stays frozen structurally either way)."""
    from .optim import sgd
    if not freeze:
        return sgd(schedule, momentum, weight_decay)
    return optax.multi_transform(
        {"train": sgd(schedule, momentum, weight_decay),
         "frozen": optax.set_to_zero()},
        detection_param_labels)


def make_baseline_det_step(model: FasterRCNN, tx):
    """Vanilla Faster R-CNN step (`train_baseline.py:74-90`):
    loss = mean of the 4 loss vectors, SGD."""

    def step_fn(state: TrainState, images, gt_boxes, gt_classes, gt_valid,
                rng):
        def loss_fn(params):
            vs = {"params": params, "batch_stats": state.batch_stats}
            losses = model.apply(vs, images, gt_boxes,
                                 gt_classes, gt_valid, rng,
                                 method=model.losses)
            return losses.total(), losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_params, new_opt = _apply_updates(tx, state, grads)
        return state.replace(params=new_params, opt_state=new_opt,
                             step=state.step + 1), {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,))


def make_advtrain_det_step(model: FasterRCNN, tx, steps: int = 5,
                           gamma: float = 2.0 / 255, eps: float = 8.0 / 255,
                           randinit: bool = True):
    """Input-PGD adversarial training (`train_baseline_advtrain.py:75-89`):
    k-step input attack via ``adv_input`` semantics, training on the
    adversarial loss only."""

    def step_fn(state: TrainState, images, gt_boxes, gt_classes, gt_valid,
                rng):
        r_attack, r_loss, r_init = jax.random.split(rng, 3)
        variables = state.variables()

        def input_loss(x):
            return model.apply(variables, x, gt_boxes, gt_classes, gt_valid,
                               r_attack, method=model.losses).total()

        adv = pgd(input_loss, images, steps=steps, gamma=gamma, eps=eps,
                  randinit=randinit, rng=r_init)
        adv = jnp.clip(jax.lax.stop_gradient(adv), 0.0, 1.0)

        def loss_fn(params):
            vs = {"params": params, "batch_stats": state.batch_stats}
            losses = model.apply(vs, adv, gt_boxes,
                                 gt_classes, gt_valid, r_loss,
                                 method=model.losses)
            return losses.total(), losses

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_params, new_opt = _apply_updates(tx, state, grads)
        return state.replace(params=new_params, opt_state=new_opt,
                             step=state.step + 1), {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,))


@dataclasses.dataclass(frozen=True)
class DetAfanConfig:
    """The A-FAN detection hyperparameter surface
    (`train_aug_final.py:200-247` argparse + the SAT/multi variants).

    gamma values here are ALREADY divided by 255 (the drivers divide).
    ``taps_se`` generalizes the single ``pertub_idx_se``: the multi-layer
    variants (`train_aug_muti_advt.py:91-100`) perturb several backbone
    layers at once, each with its own gamma and AFN flag.
    """
    taps_se: Sequence[int] = (2,)
    gammas_se: Sequence[float] = (0.9 / 255,)
    spectrum: int = 5                 # sat3/5/7/10 variants (`*_sat*:83`)
    mix_mask: Sequence[int] = (0, 0, 0, 0, 0)  # AFN per spectrum point (f1..f4)
    sd: Optional[str] = "roi"         # 'roi' | 'rpn' | None
    gamma_sd: float = 0.1 / 255
    only_roi_sd: bool = True
    mix_sd: bool = False
    noise_sd: float = 0.0
    sd_weight: float = 0.3            # args.sd_adv_loss_weight
    steps: int = 1
    eps: float = 2.0 / 255
    randinit: bool = False
    clip: bool = False
    # technique flags beyond the reference (PAPERS.md; core/attack.py) —
    # same semantics as AlfaConfig: 'grad' raw-direction steps and
    # WITCHcraft per-step random step sizes, applied to every ascent in
    # the step (input, SE, SD).
    step_mode: str = "sign"       # 'sign' | 'grad'
    random_steps: bool = False
    # jax.checkpoint the spectrum tails. Default OFF since share_proposals
    # + the separable-contraction ROIAlign freed enough HBM: measured
    # 113 -> 95 ms (VOC b2 608x1008) and 80 -> 69 ms (COCO b1 800x1344,
    # 92 classes) with no OOM. Turn ON for larger batch/canvas.
    remat_tails: bool = False
    # loss combination mode:
    #   'final'      — the flagship rule (`train_aug_final.py:156`)
    #   'sat_preset' — the SAT loss_settings presets
    #                  (`train_aug_sat_advt.py:119-132`): lca = 0.2*(l0 +
    #                  spectrum); 1: lca, 2: .5 lca+.5 l0, 3: .4/.6, 4: .3/.7
    #   'single'     — 0.5*l0 + 0.5*l_adv (`train_aug_single_advt.py:95`)
    weight_mode: str = "final"
    loss_setting: int = 1
    # Fast path (DEFAULT): compute anchor/proposal sampling ONCE per step
    # and reuse the targets across the ascent + every tail forward. The
    # reference resamples per forward — random-noise-equivalent in
    # expectation but pays a proposal NMS + IoU labeling each time (25%
    # of the flagship step). Measured parity (PARITY.md divergence 8;
    # RESULTS.md §5): 7000-step from-scratch synthetic VOC, same seed —
    # resampling 44.9% mAP vs shared 46.3% mAP, loss curves tracking.
    # Set False for the reference-exact resampling trajectory.
    share_proposals: bool = True
    # input-space adversarial term replacing the clean forward (the *_advt
    # variants, `train_aug_sat_advt.py:78`): 5-step adv_input with
    # gamma 0.3/255, eps 2/255, randinit+clip
    input_adv: bool = False
    input_adv_steps: int = 5
    input_adv_gamma: float = 0.3 / 255
    input_adv_eps: float = 2.0 / 255


def make_afan_det_step(model: FasterRCNN, tx, cfg: DetAfanConfig):
    """The flagship A-FAN detection step (`train_aug_final.py:70-166`):

    1. SE head forward(s) to the backbone tap(s), detached (`:78-85`);
    2. roi_head forward exporting the pooled SD feature + frozen sampling
       targets (`:79,84`);
    3. 1-step PGD on each SE feature through the FULL detection loss
       (`:87-95`) and on the SD feature through the roi(-only) loss
       (`:97-107`);
    4. optional AFN / uniform noise on the SD feature (`:111-115`);
    5. spectrum of N points on the (first) SE tap, AFN per mask (`:117-126`);
    6. loss = (clean + spectrum tails)/3 * (1-w_sd) + sd_tail/3 * w_sd
       (`:128-156`), gradients, SGD.

    The reference's 6 sequential tail forwards become ONE vmapped batched
    tail; both ascents and the update compile into a single XLA program.
    """
    n_spec = cfg.spectrum
    assert len(cfg.mix_mask) == n_spec, "mix_mask must match spectrum size"

    def step_fn(state: TrainState, images, gt_boxes, gt_classes, gt_valid,
                rng):
        variables = state.variables()
        r_se, r_sd, r_clean, r_spec, r_noise, r_inp = jax.random.split(rng, 6)

        shared_tgts = None
        if cfg.share_proposals:
            shared_tgts = model.apply(variables, images, gt_boxes,
                                      gt_classes, gt_valid, r_clean,
                                      method=model.compute_targets)
            shared_tgts = jax.lax.stop_gradient(shared_tgts)

        def full_losses(params_vars, tap, feat, r, x=None):
            xin = x if x is not None else images
            if shared_tgts is not None:
                return model.apply(params_vars, xin, shared_tgts[0],
                                   shared_tgts[1], r, tap, feat,
                                   method=model.losses_from_targets)
            return model.apply(params_vars, xin,
                               gt_boxes, gt_classes,
                               gt_valid, r, tap, feat, method=model.losses)

        # input-adv image for the *_advt variants (replaces the clean
        # forward's input; the SE tails still see the clean image,
        # `train_aug_sat_advt.py:78-92`)
        images_l0 = images
        if cfg.input_adv:
            def inp_loss(x):
                return full_losses(variables, None, None, r_inp, x=x).total()
            adv_img = pgd(inp_loss, images, steps=cfg.input_adv_steps,
                          gamma=cfg.input_adv_gamma, eps=cfg.input_adv_eps,
                          randinit=True, clip=True, rng=r_inp,
                          step_mode=cfg.step_mode,
                          random_steps=cfg.random_steps)
            images_l0 = jnp.clip(jax.lax.stop_gradient(adv_img), 0.0, 1.0)

        # (1) SE features, detached
        se_feats = []
        for tap in cfg.taps_se:
            f = model.apply(variables, images, tap, True,
                            method=model.backbone_head)
            se_feats.append(jax.lax.stop_gradient(f))

        # (3a) PGD per SE tap through the full 4-loss tail
        se_advs = []
        for tap, feat, g in zip(cfg.taps_se, se_feats, cfg.gammas_se):
            def se_loss(f, tap=tap):
                return full_losses(variables, tap, f, r_se).total()
            adv = pgd(se_loss, feat, steps=cfg.steps, gamma=g, eps=cfg.eps,
                      randinit=cfg.randinit, clip=cfg.clip, rng=r_se,
                      step_mode=cfg.step_mode,
                      random_steps=cfg.random_steps)
            se_advs.append(jax.lax.stop_gradient(adv))

        # (2)+(3b) SD attack
        adv_sd = None
        if cfg.sd == "roi":
            roi_dict = model.apply(variables, images, gt_boxes, gt_classes,
                                   gt_valid, r_sd,
                                   method=model.roi_head_forward)
            sd_clean = jax.lax.stop_gradient(roi_dict["roi_feature_map"])

            def sd_loss(rf):
                L = model.apply(variables, roi_dict, rf,
                                method=model.roi_tail_losses)
                if cfg.only_roi_sd:
                    return (L.proposal_class.mean()
                            + L.proposal_transformer.mean())
                return L.total()

            adv_sd = pgd(sd_loss, sd_clean, steps=cfg.steps,
                         gamma=cfg.gamma_sd, eps=cfg.eps,
                         randinit=cfg.randinit, clip=cfg.clip, rng=r_sd,
                         step_mode=cfg.step_mode,
                         random_steps=cfg.random_steps)
            adv_sd = jax.lax.stop_gradient(adv_sd)
            # (4) AFN + noise on the SD feature (`:111-115`)
            if cfg.mix_sd:
                adv_sd = mix_feature(sd_clean, adv_sd)
            if cfg.noise_sd:
                adv_sd = adv_sd + uniform_init(
                    r_noise, adv_sd.shape, cfg.gamma_sd * cfg.noise_sd)
        elif cfg.sd == "rpn":
            # The working version of the reference's dead rpn branch
            # (`attack_algo.py:116-150` — its update is commented out).
            rpn_dict = model.apply(variables, images,
                                   method=model.rpn_head_forward)
            sd_clean = jax.lax.stop_gradient(rpn_dict["rpn_feature"])

            def sd_loss(rf):
                return model.apply(variables, rpn_dict, images.shape,
                                   gt_boxes, gt_classes, gt_valid, r_sd, rf,
                                   method=model.rpn_tail_losses).total()

            adv_sd = pgd(sd_loss, sd_clean, steps=cfg.steps,
                         gamma=cfg.gamma_sd, eps=cfg.eps,
                         randinit=cfg.randinit, clip=cfg.clip, rng=r_sd,
                         step_mode=cfg.step_mode,
                         random_steps=cfg.random_steps)
            adv_sd = jax.lax.stop_gradient(adv_sd)
            if cfg.mix_sd:
                adv_sd = mix_feature(sd_clean, adv_sd)
            if cfg.noise_sd:
                adv_sd = adv_sd + uniform_init(
                    r_noise, adv_sd.shape, cfg.gamma_sd * cfg.noise_sd)

        # (5) spectrum on the FIRST SE tap (`:117-126`); other taps (multi
        # variant) contribute their single adv point. An SD-only config
        # (taps_se=() — legacy `py/train_aug_single_sd.py` family) skips
        # the spectrum entirely.
        spec_feats = None
        if cfg.taps_se:
            spec = sample_points(se_feats[0], se_advs[0], n_spec)
            mixed = []
            for i in range(1, n_spec):  # point 0 (clean) never forwarded
                p = spec[i]
                if cfg.mix_mask[i]:
                    p = mix_feature(se_feats[0], p)
                mixed.append(p)
            spec_feats = jnp.stack(mixed, axis=0)  # (n_spec-1, B, h, w, C)

        def loss_fn(params):
            vs = {"params": params, "batch_stats": state.batch_stats}
            l0 = full_losses(vs, None, None, r_clean, x=images_l0).total()

            if spec_feats is not None:
                def one_tail(feat, r):
                    return full_losses(vs, cfg.taps_se[0], feat, r).total()
                if cfg.remat_tails:
                    one_tail = jax.checkpoint(one_tail)
                spec_rngs = jax.random.split(r_spec, n_spec - 1)
                tail_losses = jax.vmap(one_tail)(spec_feats, spec_rngs)
                l_spectrum = jnp.sum(tail_losses)
            else:
                l_spectrum = 0.0

            # extra multi-layer single adv points (`train_aug_muti*`)
            l_multi = 0.0
            for tap, adv in zip(cfg.taps_se[1:], se_advs[1:]):
                l_multi = l_multi + full_losses(vs, tap, adv, r_spec).total()

            if cfg.sd == "roi":
                rd = model.apply(vs, images, gt_boxes, gt_classes, gt_valid,
                                 r_sd, method=model.roi_head_forward)
                l_sd = model.apply(vs, rd, adv_sd,
                                   method=model.roi_tail_losses).total()
            elif cfg.sd == "rpn":
                rd = model.apply(vs, images, method=model.rpn_head_forward)
                l_sd = model.apply(vs, rd, images.shape, gt_boxes,
                                   gt_classes, gt_valid, r_sd, adv_sd,
                                   method=model.rpn_tail_losses).total()
            else:
                l_sd = 0.0

            if cfg.weight_mode == "single":
                loss = 0.5 * l0 + 0.5 * (l_spectrum + l_multi)
            elif cfg.weight_mode == "sat_preset":
                lca = 0.2 * (l0 + l_spectrum + l_multi)
                presets = {1: lca,
                           2: 0.5 * lca + 0.5 * l0,
                           3: 0.4 * lca + 0.6 * l0,
                           4: 0.3 * lca + 0.7 * l0}
                loss = presets[cfg.loss_setting]
            else:
                # `:156`: ((l0 + l1..l4) / 3) * (1-w) + l5/3 * w
                main = (l0 + l_spectrum + l_multi) / 3.0
                loss = main
            if cfg.sd is not None and cfg.weight_mode == "final":
                loss = loss * (1.0 - cfg.sd_weight) + (l_sd / 3.0) * cfg.sd_weight
            return loss, (l0, l_spectrum, l_sd)

        (loss, (l0, lspec, lsd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_params, new_opt = _apply_updates(tx, state, grads)
        metrics = {"loss": loss, "loss_clean": l0,
                   "loss_spectrum": lspec,
                   "loss_sd": lsd if cfg.sd else jnp.zeros(())}
        return state.replace(params=new_params, opt_state=new_opt,
                             step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_detect_fn(model: FasterRCNN):
    """Jitted eval forward → (boxes, probs, keep)."""

    def detect(state: TrainState, images):
        return model.apply(state.variables(), images,
                           method=model.detect)

    return jax.jit(detect)
