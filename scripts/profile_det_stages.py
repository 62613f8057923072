"""Decompose the detection step cost on the real TPU: times each stage of
the Faster R-CNN forward in isolation to locate the non-compute-bound mass
(VERDICT round-2 item 5). Not part of the test suite; run manually:

    python scripts/profile_det_stages.py [--backbone resnet50] [--fp32]

Timing methodology (ROADMAP.md): independent dispatches overlap host-side
on the tunneled axon runtime and read 2-10x too fast. Stage forwards are
therefore timed as ONE `lax.scan` dispatch per window whose body feeds a
scalar derived from iteration n's output back into iteration n+1's input
(`x + 1e-30 * carry` — a real data dependency XLA cannot fold away, and
numerically an identity at O(1) magnitudes). Train steps chain through
the donated TrainState instead.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _scalarize(t):
    return sum(jnp.sum(leaf.astype(jnp.float32))
               for leaf in jax.tree.leaves(t))


def timeit_scan(name, fn, *args, iters=20, chain_idx=0, windows=3):
    """Time `fn(*args)` as a scan of `iters` chained executions.

    The scan body perturbs the floating leaves of ``args[chain_idx]`` by
    ``1e-30 * carry`` (carry = previous iteration's output sum), so every
    iteration depends on the previous one: dispatches cannot overlap and
    XLA cannot hoist the body. One device->host fetch per window.
    """
    chained = args[chain_idx]

    def body(c, _):
        scaled = jax.tree.map(
            lambda a: a + (1e-30 * c).astype(a.dtype)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            chained)
        out = fn(*args[:chain_idx], scaled, *args[chain_idx + 1:])
        return _scalarize(out), None

    @jax.jit
    def window(c0):
        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c

    compiled = window.lower(jnp.float32(0.0)).compile()
    _ = float(compiled(jnp.float32(0.0)))          # warmup (post-compile)
    best = float("inf")
    for _w in range(windows):
        t0 = time.perf_counter()
        _ = float(compiled(jnp.float32(0.0)))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:42s} {best * 1e3:9.2f} ms", flush=True)
    return best


def timeit_steps(name, one, sync, iters=10, windows=3):
    """Time a train step already chained through its donated state."""
    one(); one(); _ = float(sync())
    best = float("inf")
    for _w in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            one()
        _ = float(sync())
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:42s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--fp32", action="store_true",
                    help="run in float32 (default bfloat16)")
    args = ap.parse_args()

    from afan.models.frcnn import FRCNNConfig, FasterRCNN
    from afan.models.frcnn.rpn import generate_proposals, rpn_targets
    from afan.ops.roi_align import roi_align
    from afan.train.detect_loop import (DetAfanConfig, detection_tx,
                                        make_afan_det_step,
                                        make_baseline_det_step)
    from afan.train.loop import TrainState

    B, H, W = 2, 608, 1008
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
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

    # --- stage timings (scan-chained; images perturbed by the carry) ---
    feat_fn = jax.jit(lambda v, x: model.apply(v, x, train=True,
                                               method=model.features_clean))
    # compile ONCE and reuse for both the feats value and cost_analysis
    # (a second compile of the same program can hang the remote runtime)
    feat_c = feat_fn.lower(vs, images).compile()
    feats = feat_c(vs, images)
    t = timeit_scan("backbone fwd (stem..layer3)",
                    lambda v, x: model.apply(v, x, train=True,
                                             method=model.features_clean),
                    vs, images, chain_idx=1)
    try:
        cost = feat_c.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = float(cost["flops"])
        print(f"  cost_analysis: {fl / 1e9:.1f} GFLOP -> "
              f"{fl / t / 1e12:.1f} TF/s achieved")
    except Exception as e:
        print("  (no cost analysis:", e, ")")

    # raw conv probe: one layer3-shaped 3x3 conv, bf16
    def conv_fn(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    cw = jnp.asarray(rng.randn(3, 3, 1024, 1024) * 0.01, dtype)
    cx = jnp.asarray(rng.randn(B, 38, 63, 1024), dtype)
    tconv = timeit_scan("raw 3x3 conv (2,38,63,1024)x1024", conv_fn, cx, cw)
    fl = 2 * B * 38 * 63 * 1024 * 1024 * 9
    print(f"  raw conv: {fl / 1e9:.1f} GFLOP -> {fl / tconv / 1e12:.1f} TF/s")

    # stem-resolution conv probe
    cw2 = jnp.asarray(rng.randn(3, 3, 256, 256) * 0.01, dtype)
    cx2 = jnp.asarray(rng.randn(B, 152, 252, 256), dtype)
    t2 = timeit_scan("raw 3x3 conv (2,152,252,256)x256", conv_fn, cx2, cw2)
    fl2 = 2 * B * 152 * 252 * 256 * 256 * 9
    print(f"  raw conv2: {fl2 / 1e9:.1f} GFLOP -> {fl2 / t2 / 1e12:.1f} TF/s")

    fh, fw = feats.shape[1], feats.shape[2]
    from afan.models.frcnn.anchors import generate_anchors
    anchors = jnp.asarray(generate_anchors(W, H, fw, fh, cfg.anchor_ratios,
                                           cfg.anchor_sizes))
    print(f"anchors: {anchors.shape[0]}")

    def rpn_fn(v, f):
        return model.apply(v, f, method=lambda m, a: m.rpn(a))

    obj, reg = jax.jit(rpn_fn)(vs, feats)
    timeit_scan("rpn heads fwd", rpn_fn, vs, feats, chain_idx=1)

    def prop_fn(o, r):
        return jax.vmap(
            generate_proposals, in_axes=(None, 0, 0, None, None, None,
                                         None))(
            anchors, o, r, W, H, cfg.train_pre_nms_top_n,
            cfg.train_post_nms_top_n)

    props, pvalid = jax.jit(prop_fn)(obj, reg)
    timeit_scan("generate_proposals (top12k+NMS+2k)", prop_fn, obj, reg)

    def tgt_fn(bx):
        # chained through the gt boxes: the body must depend on the carry
        # or XLA hoists it out of the scan and measures nothing
        return jax.vmap(
            rpn_targets, in_axes=(0, None, 0, 0, None, None, None, None))(
            jax.random.split(key, B), anchors, bx, valid, W, H,
            cfg.rpn_samples, cfg.rpn_fg_cap)

    timeit_scan("rpn_targets (IoU label+sample)", tgt_fn, boxes)

    flat_boxes = props.reshape(-1, 4).astype(jnp.float32)
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), props.shape[1])
    # roi pooling at the TRAIN roi count (128/img), not the 2k proposals
    small = flat_boxes[:128 * B]
    sidx = bidx[:128 * B]

    def pool_fn(f, b, i):
        return roi_align(f, b, i, (14, 14), 1.0 / 16, 2)

    timeit_scan("roi_align 256 rois", pool_fn, feats, small, sidx)

    pooled = jax.jit(pool_fn)(feats, small, sidx)
    pooled7 = pooled.reshape(256, 7, 2, 7, 2, -1).max(axis=(2, 4))

    def hid_fn(v, x):
        return model.apply(v, x, 3, True,
                           method=lambda m, a, s, t:
                           m.backbone.run_stage(a, s, t))

    timeit_scan("layer4 hidden on 256x7x7", hid_fn, vs, pooled7,
                chain_idx=1)

    def loss_fn(v, x):
        return model.apply(v, x, boxes, labels, valid, key,
                           method=model.losses).total()

    timeit_scan("full 4-loss fwd", loss_fn, vs, images, chain_idx=1)

    def grad_fn(p, x):
        return jax.grad(
            lambda pp: model.apply({"params": pp,
                                    "batch_stats": state.batch_stats},
                                   x, boxes, labels, valid, key,
                                   method=model.losses).total())(p)

    timeit_scan("full 4-loss fwd+bwd", grad_fn, state.params, images,
                chain_idx=1, iters=10)

    # --- train steps (chained through the donated TrainState) ---
    base_step = make_baseline_det_step(model, tx)
    holder = {"s": TrainState.create(variables, tx)}

    def run_base():
        holder["s"], holder["m"] = base_step(holder["s"], images, boxes,
                                             labels, valid, key)
    timeit_steps("baseline train step", run_base,
                 lambda: holder["m"]["loss"], iters=10)

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
        # reuse the one init from above — TrainState.create copies
        # defensively, so each config gets fresh optimizer state
        h = {"s": TrainState.create(variables, tx)}

        def run(step=step, h=h):
            h["s"], h["m"] = step(h["s"], images, boxes, labels, valid, key)
        timeit_steps(name, run,
                     lambda h=h: h["m"]["loss"], iters=5)
        del h["s"], h["m"], step


if __name__ == "__main__":
    main()
