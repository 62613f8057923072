"""768-crop seg regression: is the full-resolution bilinear upsample the
sink?

Every tail/clean forward in the A-FAN seg step ends with a 4x bilinear
upsample of the logits to input size (`modeling.py` resize_bilinear →
jax.image.resize) followed by a 768^2 cross-entropy; its backward is the
transposed resize. ROADMAP's 512-crop ablations never isolated this
term, and the composed-step TF/s regression at 768 (29 → 22) is exactly
where the resize+CE bytes grow 2.25x.

This script times a simplified A-FAN-shaped step (clean + spectrum-2
tails + SD tail, 1-step PGD ascents, city-final AFN flags) at
768/b4/os16/bf16/remat-off with the upsample+CE togglable PER SITE
(`resize` dict: clean / ascent / spec; value True = reference
semantics, False = CE at os4 against 4x-subsampled labels, 'chfirst' =
full-res CE in NCHW layout).

MEASURED (the bisect that found the round-3 root cause):
  all-resize 458.5 ms, all-lowres 220.1, resize@clean-only 250.7
  (+30.6), resize@ascent-only 220.1 (+0), resize@spec-only 431.1
  (+211 — the vmapped resize+CE pathology, since fixed in
  segment_loop + ops/kernels/resize_ce_kernel.py); chfirst made no
  difference. See scripts/microbench_resize_ce.py and ROADMAP.md.

Run: python scripts/ablate_seg_768_tails.py   (~15 min incl. compiles)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from afan.core.afn import mix_feature
from afan.core.attack import pgd
from afan.core.spectrum import sample_points
from afan.models.deeplab.heads import resize_bilinear
from afan.models.deeplab.modeling import build_model
from afan.train.loop import TrainState, _apply_updates
from afan.train.segment_loop import seg_cross_entropy, segmentation_tx

V5E_PEAK = 197e12


def seg_ce_chfirst(logits_nchw, labels, ignore_index=255):
    """seg_cross_entropy with channel-FIRST logits: on TPU the minor
    (lane) dimension of a (..., 19) tensor pads to 128 lanes, so every
    full-res NHWC logits pass moves ~6.7x its nominal bytes; NCHW makes
    the minor dim W (a 128 multiple) and the channel reduction a cheap
    19-plane loop."""
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits_nchw, axis=1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(
        jnp.sum(mask), 1)


def make_step(model, tx, resize, afan: bool):
    """Simplified city-final A-FAN step (or plain baseline) with the
    final upsample kept (reference, NHWC), kept but channel-first
    ('chfirst'), or dropped (loss at os4, resize=False)."""
    tap, gamma_se, gamma_sd = 2, 0.02 / 255, 1.5 / 255

    def clean_logits(m, x, train):
        out, low = m.backbone.head(x, 4, train, with_low_level=True)
        return m.classifier(out, low, train)

    def tail_logits(m, f, ll, train):
        out = m.backbone.tail(f, tap, 4, train)
        return m.classifier(out, ll, train)

    def _finish(x_shape, logits, labels, on):
        if on == "chfirst":
            lg = jnp.transpose(logits, (0, 3, 1, 2))
            lg = jax.image.resize(
                lg, (lg.shape[0], lg.shape[1], x_shape[1], x_shape[2]),
                "linear")
            return seg_ce_chfirst(lg, labels)
        if on:
            logits = resize_bilinear(logits, (x_shape[1], x_shape[2]))
            return seg_cross_entropy(logits, labels)
        s = x_shape[1] // logits.shape[1]
        return seg_cross_entropy(logits, labels[:, ::s, ::s])

    # `resize` may be a single value for all sites or a dict with
    # per-site values: clean / ascent (both PGD ascents) / spec
    if not isinstance(resize, dict):
        resize = {"clean": resize, "ascent": resize, "spec": resize}

    def finish(x_shape, logits, labels, site="clean"):
        return _finish(x_shape, logits, labels, resize[site])

    def step_fn(state, images, labels, rng):
        variables = state.variables()
        r_se, r_sd, r_clean = jax.random.split(rng, 3)

        if afan:
            feat_se, low_level, sd_dict = model.apply(
                variables, images, tap, "concat", True,
                mutable=["batch_stats"], method=model.attack_features,
                rngs={"dropout": r_sd})[0]
            feat_se = jax.lax.stop_gradient(feat_se)
            low_level = jax.lax.stop_gradient(low_level)
            sd_dict = jax.lax.stop_gradient(sd_dict)

            def se_loss(f):
                lg = model.apply(variables, f, low_level, True,
                                 mutable=["batch_stats"],
                                 method=lambda m, a, b, t: tail_logits(
                                     m, a, b, t),
                                 rngs={"dropout": r_se})[0]
                return finish(images.shape, lg, labels, "ascent")

            adv_se = jax.lax.stop_gradient(
                pgd(se_loss, feat_se, steps=1, gamma=gamma_se))

            def sd_loss(f):
                # sd_tail resizes internally in both variants (its tail is
                # classifier-only — cheap next to the spectrum tails)
                lg = model.apply(variables, sd_dict, "concat", images.shape,
                                 f, True, mutable=["batch_stats"],
                                 method=model.sd_tail,
                                 rngs={"dropout": r_sd})[0]
                return seg_cross_entropy(lg, labels)

            adv_sd = jax.lax.stop_gradient(
                pgd(sd_loss, sd_dict["adv"], steps=1, gamma=gamma_sd))
            adv_sd = mix_feature(sd_dict["adv"], adv_sd)
            spec = sample_points(feat_se, adv_se, 3)
            spec_feats = jnp.stack([spec[1], mix_feature(feat_se, spec[2])])

        def loss_fn(params):
            vs = {"params": params, "batch_stats": state.batch_stats}
            lg0, updates = model.apply(vs, images, True,
                                       mutable=["batch_stats"],
                                       method=lambda m, x, t: clean_logits(
                                           m, x, t),
                                       rngs={"dropout": r_clean})
            loss = 0.7 * finish(images.shape, lg0, labels)
            if afan:
                ll = model.apply(vs, images, True, mutable=["batch_stats"],
                                 method=model.low_level_feature,
                                 rngs={"dropout": r_clean})[0]

                def one_tail(f):
                    lg = model.apply(vs, f, ll, True,
                                     mutable=["batch_stats"],
                                     method=lambda m, a, b, t: tail_logits(
                                         m, a, b, t),
                                     rngs={"dropout": r_se})[0]
                    return finish(images.shape, lg, labels, "spec")

                loss = loss + 0.1 * jnp.sum(jax.vmap(one_tail)(spec_feats))
                sdd = model.apply(vs, images, "concat", True,
                                  mutable=["batch_stats"],
                                  method=model.sd_head,
                                  rngs={"dropout": r_sd})[0]
                lg_sd = model.apply(vs, sdd, "concat", images.shape, adv_sd,
                                    True, mutable=["batch_stats"],
                                    method=model.sd_tail,
                                    rngs={"dropout": r_sd})[0]
                loss = loss + 0.1 * seg_cross_entropy(lg_sd, labels)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_params, new_opt = _apply_updates(tx, state, grads)
        return state.replace(params=new_params, opt_state=new_opt,
                             batch_stats=updates["batch_stats"],
                             step=state.step + 1), {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,))


def run(step, variables, tx, images, labels, label, iters=10):
    key = jax.random.PRNGKey(0)
    state = TrainState.create(variables, tx)
    compiled = step.lower(state, images, labels, key).compile()
    fl = 0.0
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = float(cost.get("flops", 0.0))
    except Exception:
        pass
    holder = {"s": TrainState.create(variables, tx), "i": 0}

    def one():
        holder["i"] += 1
        holder["s"], holder["m"] = compiled(
            holder["s"], images, labels, jax.random.fold_in(key,
                                                            holder["i"]))

    one(); one(); _ = float(holder["m"]["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            one()
        _ = float(holder["m"]["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    msg = f"{label:28s}: {best * 1e3:7.1f} ms/step"
    if fl:
        msg += (f"  {fl / 1e9:8.1f} GFLOP -> {fl / best / 1e12:5.1f} TF/s"
                f" ({fl / best / V5E_PEAK * 100:4.1f}% peak)")
    print(msg, flush=True)


def main():
    crop, batch, ncls = 768, 4, 19
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, crop, crop, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, ncls, (batch, crop, crop)),
                         jnp.int32)
    key = jax.random.PRNGKey(0)
    tx = segmentation_tx(lambda c: 0.1)
    model = build_model("deeplabv3plus_resnet50", ncls, 16, jnp.bfloat16)
    variables = model.init({"params": key, "dropout": key}, images[:1],
                           False)
    print(f"=== crop {crop} b{batch} os16 bf16 remat=off ===", flush=True)
    for label, rs, af in [
            ("afan resize@clean only",
             {"clean": True, "ascent": False, "spec": False}, True),
            ("afan resize@ascent only",
             {"clean": False, "ascent": True, "spec": False}, True),
            ("afan resize@spec only",
             {"clean": False, "ascent": False, "spec": True}, True)]:
        run(make_step(model, tx, rs, af), variables, tx, images, labels,
            label)


if __name__ == "__main__":
    main()
