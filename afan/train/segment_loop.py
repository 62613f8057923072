"""Jit-compiled train steps for the segmentation stack.

Reference drivers: `Segmentation/main_ori.py` (baseline),
`main_advtrain.py` (input-PGD), flagship `main_aug_final.py` (SE backbone
tap + SD aspp/concat decoder tap, spectrum-3, AFN mask, 4 forwards, loss
0.7/0.1/0.1/0.1), and the sat/multi variants — consolidated into one step
factory via :class:`SegAfanConfig`.

Segmentation (unlike detection) TRAINS its BatchNorms (momentum 0.01,
`main_aug_final.py:75`), so steps carry mutable batch_stats; the ascent
closures run train-mode BN with discarded stat updates (see
afan.train.loop's module docstring for the documented divergence), and the
canonical batch_stats update comes from the clean forward.
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
from ..models.deeplab.heads import resize_bilinear
from ..models.deeplab.modeling import DeepLab, segmentation_param_labels
from ..ops.kernels.resize_ce_kernel import fused_resize_nll_sums
from .loop import TrainState, _apply_updates
from .optim import sgd


def seg_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                      ignore_index: int = 255) -> jnp.ndarray:
    """nn.CrossEntropyLoss(ignore_index=255, reduction='mean') parity:
    mean over non-ignored pixels."""
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(
        jnp.sum(mask), 1)


def _per_entry_loss_sums(logits, labels, use_focal: bool,
                         alpha: float = 1.0, gamma: float = 2.0,
                         ignore_index: int = 255) -> jnp.ndarray:
    """Per-batch-entry sums of the masked per-pixel loss — the building
    block that lets several loss sites share ONE resize+CE on a
    flattened batch: each site's reference loss is its entries' sum
    divided by the (shared) valid-pixel count of `labels`."""
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    val = alpha * (1 - jnp.exp(-ce)) ** gamma * ce if use_focal else ce
    return jnp.sum(jnp.where(mask, val, 0.0),
                   axis=tuple(range(1, val.ndim)))


def seg_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                   alpha: float = 1.0, gamma: float = 2.0,
                   ignore_index: int = 255) -> jnp.ndarray:
    """FocalLoss (`Segmentation/utils/loss.py:5-20`):
    alpha * (1 - exp(-CE))^gamma * CE, mean over VALID pixels.

    Two deliberate divergences from the reference's runtime behavior
    (PARITY.md divergence 12): the reference constructs
    ``FocalLoss(ignore_index=255, size_average=True)``
    (`main_aug_final.py:91`) leaving ``gamma=0`` — which degenerates to
    plain CE — and its ``.mean()`` averages over ALL pixels including
    ignored ones (torch CE with reduction='none' zeroes them but they
    stay in the denominator). We implement the intended focal loss
    (canonical gamma=2) normalized by the valid-pixel count, consistent
    with the CE criterion both frameworks use."""
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    focal = alpha * (1 - jnp.exp(-ce)) ** gamma * ce
    return jnp.sum(jnp.where(mask, focal, 0.0)) / jnp.maximum(
        jnp.sum(mask), 1)


def segmentation_tx(schedule, momentum: float = 0.9,
                    weight_decay: float = 1e-4,
                    backbone_lr_scale: float = 0.1):
    """Two-group SGD: backbone lr x0.1, classifier lr x1
    (`main_aug_final.py:79-82`)."""
    return optax.multi_transform(
        {"backbone": sgd(lambda c: schedule(c) * backbone_lr_scale,
                         momentum, weight_decay),
         "classifier": sgd(schedule, momentum, weight_decay)},
        segmentation_param_labels)


@dataclasses.dataclass(frozen=True)
class SegAfanConfig:
    """`main_aug_final.py` flag surface (gammas ALREADY /255).

    The multi-layer variants (`main_aug_muti_advt.py:180-232`) perturb
    taps 1-4 simultaneously — extra taps beyond the first contribute one
    adv point each; the first tap carries the spectrum.
    """
    tap_se: int = 2                    # pertub_idx_se (backbone layer)
    extra_taps: Sequence[int] = ()     # multi variants: extra SE taps
    extra_gammas: Sequence[float] = ()
    sd: Optional[str] = "concat"       # 'aspp' | 'concat' | None
    steps: int = 1
    gamma_se: float = 0.02 / 255       # city final: .02/.04 (sh/city/...)
    gamma_sd: float = 1.5 / 255
    eps: float = 2.0 / 255
    spectrum: int = 3                  # sat spectrum (`:206-210`)
    mix_mask: Sequence[int] = (0, 0, 0)
    mix_sd: bool = False
    # --mix_all (`main_aug_muti_advt.py:199-204`): AFN every extra-tap
    # adversarial feature too (the CLI additionally sets mix_mask all-on
    # and mix_sd, matching the reference's all-five mixing)
    mix_all: bool = False
    noise_sd: float = 0.0
    clean_weight: float = 0.7          # loss = .7 l0 + .1 each (`:229`)
    adv_weight: float = 0.1
    randinit: bool = False
    clip: bool = False
    # technique flags beyond the reference (PAPERS.md; core/attack.py) —
    # same semantics as AlfaConfig: 'grad' raw-direction steps and
    # WITCHcraft per-step random step sizes, applied to every ascent in
    # the step (input, SE, extra taps, SD).
    step_mode: str = "sign"       # 'sign' | 'grad'
    random_steps: bool = False
    use_focal: bool = False
    # jax.checkpoint the spectrum tails. Default OFF — measured fits +
    # wins without it: 163 -> 153 ms (512 crop b4), 485 -> 464 ms
    # (Cityscapes 768 crop b4). Turn ON for larger batch/crop.
    remat_tails: bool = False
    # fold every loss site's upsample+CE into ONE flattened call (vs one
    # resize+CE per site, the spectrum block still internally flattened).
    # Both are exact (identical losses on-chip); an interleaved
    # same-process A/B measured unfold FASTER (768: 317.5 vs 324.1 ms;
    # 512: 129.3 vs 137.3) — one giant (k*b,H,W,C) resize+CE overlaps
    # worse than per-site instances.
    fold_sites: bool = False
    # fused Pallas upsample+CE (ops/kernels/resize_ce_kernel.py) on every
    # loss/ascent site: a composed XLA resize+CE site costs ~30 ms at
    # city-768 vs 0.5 ms isolated (scheduling pathology, ROADMAP); the
    # kernel never materializes the (N,H,W,C) tensor and supports both
    # plain CE and the focal criterion. Interp+CE in f32 (the
    # reference's torch precision). 'auto' = on TPU; True forces
    # (interpret mode off-TPU), False keeps the XLA path.
    fused_ce: Any = "auto"
    # 'final' (.7/.1 rule) | 'sat_preset' (`main_aug_sat_advt.py:189-200`:
    # 1 mean, 2: .5/.25, 3: .8/.1, 4: .9/.05) | 'multi_preset'
    # (`main_aug_muti_advt.py`: 1: .8 l0 + .04 others, 2: .6/.08)
    weight_mode: str = "final"
    loss_setting: int = 1
    # input-adv l0 for the *_advt variants (`main_aug_sat_advt.py`)
    input_adv: bool = False
    input_adv_steps: int = 3
    input_adv_gamma: float = 0.3 / 255
    input_adv_eps: float = 2.0 / 255


class FallbackStep:
    """Call through to a jitted step; if the FIRST call fails while the
    fused resize+CE kernel is enabled (e.g. Mosaic rejects the kernel on
    a new geometry), rebuild the step with fused_ce=False and retry — a
    kernel compile failure must never kill a training run (VERDICT r3
    weak #3). Shared by the train and eval CLIs.

    Fallback is attempted ONLY when every input buffer is still alive:
    a compile failure raises before dispatch, leaving donated arguments
    intact, whereas an execution-time failure (e.g. OOM) after dispatch
    invalidates donated buffers — retrying then would crash on deleted
    arrays and mask the real error, so it re-raises instead."""

    def __init__(self, build, fused_ce):
        self._build = build
        self._fused = fused_ce
        self._fn = build(fused_ce)
        self._first = True

    @staticmethod
    def _buffers_intact(tree) -> bool:
        for leaf in jax.tree_util.tree_leaves(tree):
            deleted = getattr(leaf, "is_deleted", None)
            if callable(deleted) and deleted():
                return False
        return True

    def __call__(self, *a, **kw):
        if self._first and self._fused is not False:
            self._first = False
            try:
                return self._fn(*a, **kw)
            except Exception as e:
                if not self._buffers_intact((a, kw)):
                    raise  # failed after dispatch: not a compile failure
                from ..utils.logging import Log
                Log.i(f"fused_ce step failed to compile "
                      f"({type(e).__name__}: {e}); falling back to the "
                      f"XLA resize+CE path")
                self._fn = self._build(False)
                return self._fn(*a, **kw)
        self._first = False
        return self._fn(*a, **kw)


def _resolve_fused(fused_ce, use_focal: bool):
    """(use_fused, interpret, focal) for the fused upsample+CE kernel."""
    on_tpu = jax.default_backend() == "tpu"
    use = fused_ce is True or (fused_ce == "auto" and on_tpu)
    return use, not on_tpu, ((1.0, 2.0) if use_focal else None)


def _make_site_loss(use_fused: bool, interpret: bool, focal, criterion,
                    labels, size):
    """Mean masked loss of upsampled os4 logits — fused Pallas kernel
    or the XLA resize+criterion (see resize_ce_kernel.py for why)."""
    if use_fused:
        npix = jnp.maximum(jnp.sum(labels != 255), 1)
        return lambda lo: jnp.sum(fused_resize_nll_sums(
            lo, labels, size, interpret, focal)) / npix
    return lambda lo: criterion(resize_bilinear(lo, size), labels)


def make_seg_base_step(model: DeepLab, tx, fused_ce="auto"):
    """`main_ori.py` baseline step."""
    use_fused, interp, _focal = _resolve_fused(fused_ce, False)

    def step_fn(state: TrainState, images, labels, rng):
        site_loss = _make_site_loss(
            use_fused, interp, None, seg_cross_entropy, labels,
            (images.shape[1], images.shape[2]))

        def loss_fn(params):
            vs = {"params": params, "batch_stats": state.batch_stats}
            lo, updates = model.apply(
                vs, images, True, mutable=["batch_stats"],
                method=model.forward_logits, rngs={"dropout": rng})
            return site_loss(lo), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_params, new_opt = _apply_updates(tx, state, grads)
        return state.replace(params=new_params, opt_state=new_opt,
                             batch_stats=updates["batch_stats"],
                             step=state.step + 1), {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,))


def make_seg_advtrain_step(model: DeepLab, tx, steps: int = 3,
                           gamma: float = 2.0 / 255, eps: float = 8.0 / 255,
                           randinit: bool = True, fused_ce="auto"):
    """`main_advtrain.py:185-200`: input PGD, train on adversarial loss."""
    use_fused, interp, _focal = _resolve_fused(fused_ce, False)

    def step_fn(state: TrainState, images, labels, rng):
        variables = state.variables()
        r_attack, r_loss, r_init = jax.random.split(rng, 3)
        site_loss = _make_site_loss(
            use_fused, interp, None, seg_cross_entropy, labels,
            (images.shape[1], images.shape[2]))

        def input_loss(x):
            lo = model.apply(variables, x, True,
                             mutable=["batch_stats"],
                             method=model.forward_logits,
                             rngs={"dropout": r_attack})[0]
            return site_loss(lo)

        adv = pgd(input_loss, images, steps=steps, gamma=gamma, eps=eps,
                  randinit=randinit, rng=r_init)
        adv = jnp.clip(jax.lax.stop_gradient(adv), 0.0, 1.0)

        def loss_fn(params):
            vs = {"params": params, "batch_stats": state.batch_stats}
            lo, updates = model.apply(vs, adv, True,
                                      mutable=["batch_stats"],
                                      method=model.forward_logits,
                                      rngs={"dropout": r_loss})
            return site_loss(lo), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_params, new_opt = _apply_updates(tx, state, grads)
        return state.replace(params=new_params, opt_state=new_opt,
                             batch_stats=updates["batch_stats"],
                             step=state.step + 1), {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,))


def make_afan_seg_step(model: DeepLab, tx, cfg: SegAfanConfig):
    """The flagship A-FAN segmentation step (`main_aug_final.py:152-232`):

    1. SE head to backbone tap (+low_level), detached (`:160-170`);
    2. SD head to the aspp/concat decoder feature, detached (`:161-166`);
    3. PGD on SE through the full tail (backbone tail + decoder + upsample)
       and on SD through the classifier-only tail (`:172-197`);
    4. optional AFN + noise on SD (`:199-204`);
    5. spectrum-N on SE with AFN per 2-char mask (`:206-210`);
    6. loss = .7 clean + .1 * each adv forward (`:212-229`).
    """
    n_spec = cfg.spectrum
    assert len(cfg.mix_mask) == n_spec
    criterion = seg_focal_loss if cfg.use_focal else seg_cross_entropy
    use_fused, fused_interpret, fused_focal = _resolve_fused(
        cfg.fused_ce, cfg.use_focal)

    def step_fn(state: TrainState, images, labels, rng):
        variables = state.variables()
        (r_se, r_sd, r_clean, r_spec, r_noise,
         r_inp) = jax.random.split(rng, 6)

        size = (images.shape[1], images.shape[2])
        npix = jnp.maximum(jnp.sum(labels != 255), 1)
        site_loss = _make_site_loss(use_fused, fused_interpret,
                                    fused_focal, criterion, labels, size)

        # input-adv image for the *_advt variants
        images_l0 = images
        if cfg.input_adv:
            def inp_loss(x):
                lo = model.apply(variables, x, True,
                                 mutable=["batch_stats"],
                                 method=model.forward_logits,
                                 rngs={"dropout": r_inp})[0]
                return site_loss(lo)
            adv_img = pgd(inp_loss, images, steps=cfg.input_adv_steps,
                          gamma=cfg.input_adv_gamma, eps=cfg.input_adv_eps,
                          randinit=True, clip=True, rng=r_inp,
                          step_mode=cfg.step_mode,
                          random_steps=cfg.random_steps)
            images_l0 = jnp.clip(jax.lax.stop_gradient(adv_img), 0.0, 1.0)

        # (1)+(2) attack-side features. With an SD tap configured, ONE
        # fused forward yields the SE tap feature AND the decoder feature
        # (identical tensors to the reference's two separate head
        # forwards, `main_aug_final.py:160-166`, without recomputing
        # stages [0, tap) twice). The SD dropout rng (r_sd) drives the
        # pass: the backbone below the tap has no dropout, so feat_se is
        # rng-independent, matching the split formulation exactly.
        fused_sd_dict = None
        if cfg.sd is not None:
            feat_se, low_level, fused_sd_dict = model.apply(
                variables, images, cfg.tap_se, cfg.sd, True,
                mutable=["batch_stats"], method=model.attack_features,
                rngs={"dropout": r_sd})[0]
            fused_sd_dict = jax.lax.stop_gradient(fused_sd_dict)
        else:
            feat_se, low_level = model.apply(
                variables, images, cfg.tap_se, True,
                mutable=["batch_stats"],
                method=model.backbone_head, rngs={"dropout": r_se})[0]
        feat_se = jax.lax.stop_gradient(feat_se)
        low_level = jax.lax.stop_gradient(low_level)

        def tap_tail_lo(vs, f, tap, r, ll):
            out = model.apply(vs, f, ll, tap, True,
                              mutable=["batch_stats"],
                              method=model.forward_tail_logits,
                              rngs={"dropout": r})
            return out[0]

        # (3a) PGD on SE — the ascent differentiates w.r.t. the feature
        # only (autograd.grad(loss, x_adv)), so the detached low_level is
        # exact here
        def se_loss(f):
            return site_loss(
                tap_tail_lo(variables, f, cfg.tap_se, r_se, low_level))

        adv_se = pgd(se_loss, feat_se, steps=cfg.steps, gamma=cfg.gamma_se,
                     eps=cfg.eps, randinit=cfg.randinit, clip=cfg.clip,
                     rng=r_se, step_mode=cfg.step_mode,
                     random_steps=cfg.random_steps)
        adv_se = jax.lax.stop_gradient(adv_se)

        # extra multi-layer taps: one adv point each
        extra_advs = []
        for tap, g in zip(cfg.extra_taps, cfg.extra_gammas):
            f_t, _ = model.apply(variables, images, tap, True,
                                 mutable=["batch_stats"],
                                 method=model.backbone_head,
                                 rngs={"dropout": r_se})[0]
            f_t = jax.lax.stop_gradient(f_t)

            def t_loss(f, tap=tap):
                return site_loss(
                    tap_tail_lo(variables, f, tap, r_se, low_level))
            a = pgd(t_loss, f_t, steps=cfg.steps, gamma=g, eps=cfg.eps,
                    randinit=cfg.randinit, clip=cfg.clip, rng=r_se,
                    step_mode=cfg.step_mode,
                    random_steps=cfg.random_steps)
            a = jax.lax.stop_gradient(a)
            if cfg.mix_all:
                a = mix_feature(f_t, a)
            extra_advs.append((tap, a))

        # (3b) SD attack on the decoder feature (from the fused forward)
        adv_sd = None
        if cfg.sd is not None:
            sd_dict = fused_sd_dict
            sd_clean = sd_dict["adv"]

            def sd_loss(f):
                lo = model.apply(variables, sd_dict, cfg.sd, f, True,
                                 mutable=["batch_stats"],
                                 method=model.sd_tail_logits,
                                 rngs={"dropout": r_sd})[0]
                return site_loss(lo)

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

        # (5) spectrum on SE
        spec = sample_points(feat_se, adv_se, n_spec)
        spec_feats = []
        for i in range(1, n_spec):
            p = spec[i]
            if cfg.mix_mask[i]:
                p = mix_feature(feat_se, p)
            spec_feats.append(p)
        spec_feats = jnp.stack(spec_feats, axis=0)

        # (6) combined loss. Every loss site yields os4 logits; the
        # final upsample+CE runs OUTSIDE any vmap, per site (default) or
        # folded into one flattened call (cfg.fold_sites). A vmapped
        # jax.image.resize+CE is a measured TPU pathology — a 2-point
        # vmapped instance costs 184.6 ms vs 1.25 ms flattened
        # (scripts/microbench_resize_ce.py); hoisting it out of the
        # spectrum vmap took the city-768 step 458 -> ~317 ms.
        # Exactness: each site's reference loss is
        # mean-over-valid-pixels with the SAME labels, so site loss ==
        # (its entries' loss-sum) / (shared valid count) — see
        # _per_entry_loss_sums.
        def loss_fn(params):
            vs = {"params": params, "batch_stats": state.batch_stats}
            logits0, updates = model.apply(vs, images_l0, True,
                                           mutable=["batch_stats"],
                                           method=model.forward_logits,
                                           rngs={"dropout": r_clean})

            # the reference keeps low_level UNDETACHED in the loss graph
            # (`main_aug_final.py:169,214-215`): the tail losses backprop
            # through it into stem+layer1. Recompute it differentiably —
            # with an unperturbed clean image XLA CSEs this with logits0's
            # stem+layer1, so only the (shared) backward edge is added.
            ll_diff = model.apply(vs, images, True,
                                  mutable=["batch_stats"],
                                  method=model.low_level_feature,
                                  rngs={"dropout": r_clean})[0]

            # Spectrum tails: the NETWORK part stays vmapped (per-point
            # BN batch statistics, exactly the reference's separate
            # forwards); only the resize+CE leaves the vmap.
            def one_tail_logits(f, r):
                out = model.apply(vs, f, ll_diff, cfg.tap_se, True,
                                  mutable=["batch_stats"],
                                  method=model.forward_tail_logits,
                                  rngs={"dropout": r})
                return out[0]
            if cfg.remat_tails:
                one_tail_logits = jax.checkpoint(one_tail_logits)
            spec_rngs = jax.random.split(r_spec, n_spec - 1)
            lg = jax.vmap(one_tail_logits)(spec_feats, spec_rngs)

            parts = [logits0, lg.reshape((-1,) + lg.shape[2:])]
            if cfg.sd is not None:
                # recompute the SD head differentiably w.r.t. params with
                # the same rng, then classify the adversarial feature —
                # matching the reference's single-graph backward
                sdd = model.apply(vs, images, cfg.sd, True,
                                  mutable=["batch_stats"],
                                  method=model.sd_head,
                                  rngs={"dropout": r_sd})[0]
                parts.append(model.apply(vs, sdd, cfg.sd, adv_sd, True,
                                         mutable=["batch_stats"],
                                         method=model.sd_tail_logits,
                                         rngs={"dropout": r_sd})[0])
            for tap, a in extra_advs:
                parts.append(model.apply(vs, a, ll_diff, tap, True,
                                         mutable=["batch_stats"],
                                         method=model.forward_tail_logits,
                                         rngs={"dropout": r_spec})[0])

            bsz = labels.shape[0]

            def site_groups(lo_logits):
                """(k*bsz, h, w, C) os4 logits -> (k,) per-site losses."""
                reps = lo_logits.shape[0] // bsz
                labels_t = jnp.tile(labels,
                                    (reps,) + (1,) * (labels.ndim - 1))
                if use_fused:
                    sums = fused_resize_nll_sums(lo_logits, labels_t,
                                                 size, fused_interpret,
                                                 fused_focal)
                else:
                    hi = resize_bilinear(lo_logits, size)
                    sums = _per_entry_loss_sums(hi, labels_t,
                                                cfg.use_focal)
                return jnp.sum(sums.reshape(reps, bsz), axis=1) / npix

            if cfg.fold_sites:
                group = site_groups(jnp.concatenate(parts, axis=0))
            else:
                group = jnp.concatenate([site_groups(p) for p in parts])

            l0 = group[0]
            l_adv = jnp.sum(group[1:n_spec])
            idx = n_spec
            if cfg.sd is not None:
                l_sd = group[idx]
                idx += 1
            else:
                l_sd = 0.0
            l_multi = (jnp.sum(group[idx:]) if len(extra_advs)
                       else 0.0)

            n_adv = (n_spec - 1) + len(extra_advs) + (1 if cfg.sd else 0)
            if cfg.weight_mode == "sat_preset":
                others = l_adv + l_multi + (l_sd if cfg.sd else 0.0)
                presets = {1: (l0 + others) / (1 + n_adv),
                           2: 0.5 * l0 + (0.5 / max(n_adv, 1)) * others,
                           3: 0.8 * l0 + (0.2 / max(n_adv, 1)) * others,
                           4: 0.9 * l0 + (0.1 / max(n_adv, 1)) * others}
                loss = presets[cfg.loss_setting]
            elif cfg.weight_mode == "multi_preset":
                others = l_adv + l_multi + (l_sd if cfg.sd else 0.0)
                presets = {1: 0.8 * l0 + (0.2 / max(n_adv, 1)) * others,
                           2: 0.6 * l0 + (0.4 / max(n_adv, 1)) * others}
                loss = presets[cfg.loss_setting]
            else:
                loss = (cfg.clean_weight * l0
                        + cfg.adv_weight * (l_adv + l_multi)
                        + (cfg.adv_weight * l_sd if cfg.sd is not None
                           else 0.0))
            return loss, (l0, l_adv, l_sd, updates)

        (loss, (l0, ladv, lsd, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_params, new_opt = _apply_updates(tx, state, grads)
        metrics = {"loss": loss, "loss_clean": l0, "loss_spectrum": ladv,
                   "loss_sd": lsd if cfg.sd else jnp.zeros(())}
        return state.replace(params=new_params, opt_state=new_opt,
                             batch_stats=updates["batch_stats"],
                             step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_seg_eval_step(model: DeepLab, num_classes: int):
    """Eval forward → (pred labels, device-side confusion matrix)
    (`args.py:168-220` validate loop)."""
    from ..eval.seg_miou import confusion_matrix_jnp

    def eval_fn(state: TrainState, images, labels):
        logits = model.apply(state.variables(), images, False)
        preds = jnp.argmax(logits, axis=-1)
        hist = confusion_matrix_jnp(labels, preds, num_classes)
        return preds, hist

    return jax.jit(eval_fn)
