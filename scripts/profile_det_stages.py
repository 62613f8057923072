"""Decompose the detection step cost on the real TPU: times each stage of
the Faster R-CNN forward in isolation to locate the non-compute-bound mass
(VERDICT round-2 item 5). Not part of the test suite; run manually:

    python scripts/profile_det.py [--backbone resnet50]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


_scalarize = jax.jit(lambda t: sum(jnp.sum(l.astype(jnp.float32))
                                   for l in jax.tree.leaves(t)))


def timeit(name, fn, *args, iters=20, sync=None):
    """NOTE: sync must fetch only a SCALAR — fetching a tensor through the
    remote-TPU tunnel times the transfer, not the compute (measured: a
    (256,14,14,1024) fetch alone reads as ~300 ms)."""
    out = fn(*args)
    sync_val = sync(out) if sync else _scalarize(out)
    _ = float(sync_val)
    best = float("inf")
    for _w in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync_val = sync(out) if sync else _scalarize(out)
        _ = float(sync_val)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:42s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--bf16", action="store_true", default=True)
    args = ap.parse_args()

    from afan.models.frcnn import FRCNNConfig, FasterRCNN
    from afan.models.frcnn.rpn import generate_proposals, rpn_targets
    from afan.ops.roi_align import roi_align
    from afan.train.detect_loop import (DetAfanConfig, detection_tx,
                                        make_afan_det_step,
                                        make_baseline_det_step)
    from afan.train.loop import TrainState

    B, H, W = 2, 608, 1008
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = FRCNNConfig(backbone=args.backbone, num_classes=21)
    model = FasterRCNN(cfg=cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    boxes = jnp.tile(jnp.asarray([[[100.0, 100, 400, 300],
                                   [50.0, 200, 250, 500]]]), (B, 1, 1))
    labels = jnp.ones((B, 2), jnp.int32)
    valid = jnp.ones((B, 2), bool)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, images[:1], boxes[:1],
                           labels[:1], valid[:1], jax.random.PRNGKey(1),
                           method=model.losses)
    tx = detection_tx(lambda c: 0.001)
    state = TrainState.create(variables, tx)
    vs = state.variables()

    # --- stage timings ---
    feat_fn = jax.jit(lambda v, x: model.apply(v, x, train=True,
                                               method=model.features_clean))
    feats = feat_fn(vs, images)
    t = timeit("backbone fwd (stem..layer3)", feat_fn, vs, images)
    try:
        cost = feat_fn.lower(vs, images).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = float(cost["flops"])
        print(f"  cost_analysis: {fl / 1e9:.1f} GFLOP -> "
              f"{fl / t / 1e12:.1f} TF/s achieved")
    except Exception as e:
        print("  (no cost analysis:", e, ")")

    # raw conv probe: one layer3-shaped 3x3 conv, bf16
    cw = jnp.asarray(rng.randn(3, 3, 1024, 1024) * 0.01, dtype)
    cx = jnp.asarray(rng.randn(B, 38, 63, 1024), dtype)
    conv_fn = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32))
    tconv = timeit("raw 3x3 conv (2,38,63,1024)x1024", conv_fn, cx, cw)
    fl = 2 * B * 38 * 63 * 1024 * 1024 * 9
    print(f"  raw conv: {fl / 1e9:.1f} GFLOP -> {fl / tconv / 1e12:.1f} TF/s")

    # stem-resolution conv probe
    cw2 = jnp.asarray(rng.randn(3, 3, 256, 256) * 0.01, dtype)
    cx2 = jnp.asarray(rng.randn(B, 152, 252, 256), dtype)
    t2 = timeit("raw 3x3 conv (2,152,252,256)x256", conv_fn, cx2, cw2)
    fl2 = 2 * B * 152 * 252 * 256 * 256 * 9
    print(f"  raw conv2: {fl2 / 1e9:.1f} GFLOP -> {fl2 / t2 / 1e12:.1f} TF/s")

    fh, fw = feats.shape[1], feats.shape[2]
    from afan.models.frcnn.anchors import generate_anchors
    anchors = jnp.asarray(generate_anchors(W, H, fw, fh, cfg.anchor_ratios,
                                           cfg.anchor_sizes))
    print(f"anchors: {anchors.shape[0]}")

    rpn_fn = jax.jit(lambda v, f: model.apply(v, f,
                                              method=lambda m, a: m.rpn(a)))
    obj, reg = rpn_fn(vs, feats)
    timeit("rpn heads fwd", rpn_fn, vs, feats)

    prop_fn = jax.jit(lambda o, r: jax.vmap(
        generate_proposals, in_axes=(None, 0, 0, None, None, None, None))(
            anchors, o, r, W, H, cfg.train_pre_nms_top_n,
            cfg.train_post_nms_top_n))
    props, pvalid = prop_fn(obj, reg)
    timeit("generate_proposals (top12k+NMS+2k)", prop_fn, obj, reg)

    tgt_fn = jax.jit(lambda o: jax.vmap(
        rpn_targets, in_axes=(0, None, 0, 0, None, None, None, None))(
            jax.random.split(key, B), anchors, boxes, valid, W, H,
            cfg.rpn_samples, cfg.rpn_fg_cap))
    timeit("rpn_targets (IoU label+sample)", tgt_fn, obj)

    flat_boxes = props.reshape(-1, 4).astype(jnp.float32)
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), props.shape[1])
    # roi pooling at the TRAIN roi count (128/img), not the 2k proposals
    small = flat_boxes[:128 * B]
    sidx = bidx[:128 * B]
    pool_fn = jax.jit(lambda f, b, i: roi_align(f, b, i, (14, 14),
                                                1.0 / 16, 2))
    timeit("roi_align 256 rois", pool_fn, feats, small, sidx)

    pooled = pool_fn(feats, small, sidx)
    pooled7 = pooled.reshape(256, 7, 2, 7, 2, -1).max(axis=(2, 4))
    hid_fn = jax.jit(lambda v, x: model.apply(
        v, x, 3, True, method=lambda m, a, s, t: m.backbone.run_stage(a, s, t)))
    timeit("layer4 hidden on 256x7x7", hid_fn, vs, pooled7)

    loss_fn = jax.jit(lambda v, x: model.apply(
        v, x, boxes, labels, valid, key, method=model.losses).total())
    timeit("full 4-loss fwd", loss_fn, vs, images)

    grad_fn = jax.jit(lambda p: jax.grad(
        lambda pp: model.apply({"params": pp,
                                "batch_stats": state.batch_stats},
                               images, boxes, labels, valid, key,
                               method=model.losses).total())(p))
    timeit("full 4-loss fwd+bwd", grad_fn, state.params, iters=10)

    base_step = make_baseline_det_step(model, tx)
    st = TrainState.create(variables, tx)
    holder = {"s": st}

    def run_base():
        holder["s"], holder["m"] = base_step(holder["s"], images, boxes,
                                             labels, valid, key)
        return holder["m"]["loss"]
    timeit("baseline train step", lambda: run_base(), iters=10,
           sync=lambda o: o)

    for name, acfg in [
            ("afan share_proposals", DetAfanConfig(share_proposals=True)),
            ("afan share+no-remat-tails",
             DetAfanConfig(share_proposals=True, remat_tails=False)),
            ("afan share, spectrum=2",
             DetAfanConfig(share_proposals=True, spectrum=2,
                           mix_mask=(0, 0))),
            ("afan share, sd=None",
             DetAfanConfig(share_proposals=True, sd=None)),
    ]:
        step = make_afan_det_step(model, tx, acfg)
        st2 = TrainState.create(
            model.init({"params": key}, images[:1], boxes[:1], labels[:1],
                       valid[:1], jax.random.PRNGKey(1),
                       method=model.losses), tx)
        h = {"s": st2}

        def run(step=step, h=h):
            h["s"], h["m"] = step(h["s"], images, boxes, labels, valid, key)
            return h["m"]["loss"]
        timeit(name, lambda run=run: run(), iters=5, sync=lambda o: o)
        del h["s"], h["m"], step, st2


if __name__ == "__main__":
    main()
