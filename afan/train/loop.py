"""Jit-compiled train steps for the classification stack.

Reference drivers: `Classification/main_base.py` (clean baseline),
`Classification/main_perturb.py` (ALFA: feature PGD at one tap),
`Classification/main_learnable.py` (learnable-eta: PGD at 9 taps with a
trained per-tap scale).

TPU-first structure: where the reference runs `steps`+3 separate
forward/backward python calls per batch (head fwd, k tail fwd/bwd inside the
PGD loop, adv tail fwd, clean full fwd, one backward;
`main_perturb.py:173-201`), here the ENTIRE step — PGD ascent as
``lax.scan``, both losses, and the SGD update — is one traced function that
XLA compiles and fuses into a single TPU program. No host sync anywhere in
the step; metrics come back as device arrays.

BatchNorm semantics: the reference keeps the model in train mode during the
PGD ascent, so BN normalizes every forward (clean, tail ascent, adv tail)
with current-batch statistics; we match that. The reference ALSO updates BN
*running* stats on every one of those forwards; we update them once per step
from the clean full forward. Running stats only affect eval-mode
normalization, and the ascent forwards see (nearly) identical batch
statistics, so training dynamics are unchanged; this is the one documented
divergence (it removes 6+ sequential variable writebacks per step).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..core import perturbation_norms
from ..core.attack import pgd


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy (torch nn.CrossEntropyLoss parity)."""
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Top-1 accuracy in percent (`main_perturb.py:295-308` semantics)."""
    return 100.0 * jnp.mean(jnp.argmax(logits, axis=-1) == labels)


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        # Copy leaves: train steps donate their input state (buffer reuse on
        # TPU), which would otherwise invalidate the caller's `variables`.
        params = jax.tree.map(jnp.array, variables["params"])
        return cls(params=params,
                   batch_stats=jax.tree.map(jnp.array,
                                            variables.get("batch_stats", {})),
                   opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


@dataclasses.dataclass(frozen=True)
class AlfaConfig:
    """Hyperparameters of the ALFA trainer (`main_perturb.py` defaults):
    tap 13, 5 PGD steps, gamma 1.5/255, eps 2/255, no randinit/clip.
    gamma/eps here are the ALREADY-DIVIDED values (the CLI divides by 255)."""
    tap: int = 13
    steps: int = 5
    gamma: float = 1.5 / 255
    eps: float = 2.0 / 255
    randinit: bool = False
    clip: bool = False
    # technique flags beyond the reference (PAPERS.md; core/attack.py)
    step_mode: str = "sign"       # 'sign' | 'grad'
    random_steps: bool = False    # WITCHcraft per-step random step size


def make_base_step(model, tx: optax.GradientTransformation):
    """Clean-baseline train step (`main_base.py:140-200`)."""

    def step_fn(state: TrainState, images, labels):
        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, 0, None, True, mutable=["batch_stats"])
            return cross_entropy(logits, labels), (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_params, new_opt = _apply_updates(tx, state, grads)
        metrics = {"loss": loss, "accuracy": accuracy(logits, labels)}
        return state.replace(params=new_params, opt_state=new_opt,
                             batch_stats=updates["batch_stats"],
                             step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_alfa_step(model, tx: optax.GradientTransformation, cfg: AlfaConfig,
                   jit: bool = True):
    """ALFA train step (`main_perturb.py:153-201`):

    1. clean head forward to the tap, detached (`:173`);
    2. k-step feature PGD through the tail (`attack_algo.py:38-58`);
    3. loss = (CE(tail(adv)) + CE(full(clean))) / 2 (`:194-197`);
    4. SGD update; perturbation L2/L∞ telemetry (`:187-192`).

    ``jit=False`` returns the raw step function for embedding in a larger
    jitted program (see :func:`make_device_data_alfa_step`).
    """
    num_stages = model.num_stages

    def step_fn(state: TrainState, images, labels, rng):
        variables = state.variables()

        # (1) head forward, train-mode BN, feature detached.
        feat = model.apply(variables, images, 0, cfg.tap, True,
                           mutable=["batch_stats"])[0]
        feat = jax.lax.stop_gradient(feat)

        # (2) PGD ascent on the feature through the tail closure.
        def tail_loss(f):
            logits = model.apply(variables, f, cfg.tap, num_stages, True,
                                 mutable=["batch_stats"])[0]
            return cross_entropy(logits, labels)

        feat_adv = pgd(tail_loss, feat, steps=cfg.steps, gamma=cfg.gamma,
                       eps=cfg.eps, randinit=cfg.randinit, clip=cfg.clip,
                       rng=rng, step_mode=cfg.step_mode,
                       random_steps=cfg.random_steps)
        feat_adv = jax.lax.stop_gradient(feat_adv)
        norm_l2, norm_linf = perturbation_norms(feat, feat_adv)

        # (3) combined loss, grads wrt params only.
        def loss_fn(params):
            vs = {"params": params, "batch_stats": state.batch_stats}
            logits_adv = model.apply(vs, feat_adv, cfg.tap, num_stages, True,
                                     mutable=["batch_stats"])[0]
            logits_clean, updates = model.apply(vs, images, 0, num_stages,
                                                True, mutable=["batch_stats"])
            loss = (cross_entropy(logits_adv, labels)
                    + cross_entropy(logits_clean, labels)) / 2
            return loss, (logits_clean, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_params, new_opt = _apply_updates(tx, state, grads)
        metrics = {
            "loss": loss,
            "accuracy": accuracy(logits, labels),
            "pert_l2": norm_l2.mean(),
            "pert_linf": norm_linf.mean(),
        }
        return state.replace(params=new_params, opt_state=new_opt,
                             batch_stats=updates["batch_stats"],
                             step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,)) if jit else step_fn


def make_device_data_alfa_step(model, tx: optax.GradientTransformation,
                               cfg: AlfaConfig, batch_size: int):
    """Fully device-resident ALFA training: the whole CIFAR train split
    lives in HBM (45k images = 553 MB uint8) and each step gathers its
    batch from a per-epoch permutation, augments (crop+flip), runs the
    adversarial step — ONE jitted program with zero host involvement.
    The reference streams batches through a torch DataLoader every step;
    on a weak host that pipeline, not the accelerator, bounds throughput.

    Returns ``step(state, data_x_uint8, data_y, perm, i, rng)``; build
    ``perm`` per epoch with ``jax.random.permutation``.
    """
    from ..data.cifar import augment_batch_device
    raw_step = make_alfa_step(model, tx, cfg, jit=False)

    def fused(state: TrainState, data_x, data_y, perm, i, rng):
        r_aug, r_step = jax.random.split(rng)
        idx = jax.lax.dynamic_slice(perm, (i * batch_size,), (batch_size,))
        x = augment_batch_device(r_aug, data_x[idx])
        return raw_step(state, x, data_y[idx], r_step)

    return jax.jit(fused, donate_argnums=(0,))


def make_epoch_scan_alfa(model, tx: optax.GradientTransformation,
                         cfg: AlfaConfig, batch_size: int,
                         steps_per_epoch: int):
    """A WHOLE EPOCH as one XLA program: ``lax.scan`` over
    :func:`make_device_data_alfa_step`'s fused gather+augment+ALFA body.
    One dispatch per epoch — per-step host/tunnel latency (the final
    throughput bound on this setup) disappears entirely.

    Returns ``epoch_fn(state, data_x_uint8, data_y, perm, rng) ->
    (state, stacked_metrics)`` where each metric has a leading
    (steps_per_epoch,) axis.
    """
    from ..data.cifar import augment_batch_device
    raw_step = make_alfa_step(model, tx, cfg, jit=False)

    def epoch_fn(state: TrainState, data_x, data_y, perm, rng):
        def body(carry, i):
            st = carry
            r = jax.random.fold_in(rng, i)
            r_aug, r_step = jax.random.split(r)
            idx = jax.lax.dynamic_slice(perm, (i * batch_size,),
                                        (batch_size,))
            x = augment_batch_device(r_aug, data_x[idx])
            st, metrics = raw_step(st, x, data_y[idx], r_step)
            return st, metrics

        state, metrics = jax.lax.scan(
            body, state, jnp.arange(steps_per_epoch, dtype=jnp.int32))
        return state, metrics

    return jax.jit(epoch_fn, donate_argnums=(0,))


@dataclasses.dataclass(frozen=True)
class LearnableConfig:
    """`main_learnable.py` defaults: 3 PGD steps, gamma 1/255, eps 2/255,
    9 taps, l1_coef 1.0."""
    taps: Sequence[int] = (4, 8, 11, 14, 18, 21, 24, 28, 31)
    steps: int = 3
    gamma: float = 1.0 / 255
    eps: float = 2.0 / 255
    randinit: bool = False
    clip: bool = False
    l1_coef: float = 1.0


def sum_project(w: jnp.ndarray) -> jnp.ndarray:
    """Shift eta so it sums to 1 (`main_learnable.py:369-378`)."""
    k = w.shape[0]
    return w - (jnp.sum(w) - 1.0) / k


def make_learnable_step(model, tx: optax.GradientTransformation,
                        cfg: LearnableConfig, single_pass: bool = True):
    """Learnable-eta train step (`main_learnable.py:202-253`).

    All 9 tap ascents + 9 scaled tail forwards + the clean forward trace into
    one XLA program. ``tx`` must be the two-group transform from
    :func:`afan.train.optim.sgd_with_param_groups`-style labeling (model
    params vs the eta vector `w`, which trains with its own lr and no weight
    decay, `main_learnable.py:85-90`).

    ``single_pass`` (default) collects all tapped features in ONE prefix
    forward via :meth:`StagedModule.multi_head` instead of re-running
    stages ``[0, tap)`` per tap — bit-identical features (same stages on
    the same input; parity-tested), ~4x less head-stage work.
    ``single_pass=False`` keeps the naive per-tap forwards as the parity
    oracle.
    """
    num_stages = model.num_stages
    taps = tuple(cfg.taps)

    def step_fn(state: TrainState, images, labels, rng):
        variables = state.variables()

        # PGD at every tap (features detached; eta NOT applied during the
        # ascent — the scale enters only the final tail forward, matching
        # `main_learnable.py:226-242`).
        rngs = jax.random.split(rng, len(taps))
        if single_pass:
            feats = model.apply(variables, images, taps, True,
                                method=model.multi_head,
                                mutable=["batch_stats"])[0]
            clean_feats = [jax.lax.stop_gradient(f) for f in feats]
        else:
            clean_feats = [
                jax.lax.stop_gradient(
                    model.apply(variables, images, 0, tap, True,
                                mutable=["batch_stats"])[0])
                for tap in taps]
        adv_feats = []
        for tap, feat, r in zip(taps, clean_feats, rngs):
            def tail_loss(f, tap=tap):
                logits = model.apply(variables, f, tap, num_stages, True,
                                     mutable=["batch_stats"])[0]
                return cross_entropy(logits, labels)

            adv = pgd(tail_loss, feat, steps=cfg.steps, gamma=cfg.gamma,
                      eps=cfg.eps, randinit=cfg.randinit, clip=cfg.clip, rng=r)
            adv_feats.append(jax.lax.stop_gradient(adv))

        norms = [perturbation_norms(c, a) for c, a in zip(clean_feats, adv_feats)]

        def loss_fn(params):
            vs = {"params": params, "batch_stats": state.batch_stats}
            w = params["w"]
            loss_adv = 0.0
            for i, tap in enumerate(taps):
                scaled = clean_feats[i] + w[i] * (adv_feats[i] - clean_feats[i])
                logits = model.apply(vs, scaled, tap, num_stages, True,
                                     mutable=["batch_stats"])[0]
                loss_adv = loss_adv + cross_entropy(logits, labels)
            logits_clean, updates = model.apply(vs, images, 0, num_stages,
                                                True, mutable=["batch_stats"])
            loss_clean = cross_entropy(logits_clean, labels)
            l1 = jnp.sum(jnp.abs(w))
            loss = (loss_clean + loss_adv / len(taps)) / 2 + cfg.l1_coef * l1
            return loss, (logits_clean, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_params, new_opt = _apply_updates(tx, state, grads)
        # Post-step sum-to-one projection of eta (`main_learnable.py:244-253`).
        new_params = dict(new_params)
        new_params["w"] = sum_project(new_params["w"])
        metrics = {
            "loss": loss,
            "accuracy": accuracy(logits, labels),
            "pert_l2": jnp.stack([n[0].mean() for n in norms]),
            "pert_linf": jnp.stack([n[1].mean() for n in norms]),
            "w": new_params["w"],
        }
        return state.replace(params=new_params, opt_state=new_opt,
                             batch_stats=updates["batch_stats"],
                             step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model):
    """Eval-mode forward + top-1 (`main_perturb.py:227-263` validate)."""

    def eval_fn(state: TrainState, images, labels):
        logits = model.apply(state.variables(), images, 0, None, False)
        return {"loss": cross_entropy(logits, labels),
                "accuracy": accuracy(logits, labels),
                "correct": jnp.sum(jnp.argmax(logits, -1) == labels),
                "count": jnp.asarray(labels.shape[0], jnp.int32)}

    return jax.jit(eval_fn)


def _apply_updates(tx, state: TrainState, grads):
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    return optax.apply_updates(state.params, updates), new_opt
