"""Detection evaluation entry points — `Detection/eval.py` (clean mAP),
`eval_rob_ori.py` (input-PGD robustness mAP), `eval_sat_layers.py` (mAP
from interpolated adversarial features), `eval_loss_vis.py` (weight-space
loss probing), merged behind ``--task``.

NOTE: the reference's `eval_rob.py` depends on a commented-out
``untarget_PGD`` and crashes (SURVEY.md §2.3); ``--task rob`` here is the
working `eval_rob_ori.py` path.
"""
from __future__ import annotations

import argparse
import ast

import jax
import jax.numpy as jnp
import numpy as np

from ..data.voc_det import voc_detection_loaders
from ..eval.det_map import DetectionEvaluator
from ..eval.robustness import (loss_landscape_probe, make_detection_pgd_fn,
                               make_sat_layer_detect_fn,
                               perturb_weight_directions)
from ..models.frcnn import FRCNNConfig, FasterRCNN
from ..train.checkpoint import load_checkpoint, overlap_restore
from ..train.detect_loop import detection_tx, make_detect_fn
from ..train.loop import TrainState
from ..utils.logging import Log


def get_parser():
    p = argparse.ArgumentParser(description="A-FAN TPU detection eval")
    p.add_argument("--task", choices=["map", "rob", "sat_layers", "loss_vis",
                                      "sat_vis", "input_surface"],
                   default="map")
    p.add_argument("-s", "--dataset", default="voc2007")
    p.add_argument("-b", "--backbone", default="resnet50")
    p.add_argument("-d", "--data_dir", default="./data")
    p.add_argument("-c", "--checkpoint", required=False, default=None)
    p.add_argument("--torch_checkpoint", default=None,
                   help="a reference `Detection/model.py` torch .pth; "
                        "converted + overlap-restored (model.py:200-217)")
    p.add_argument("--image_min_side", type=float, default=600.0)
    p.add_argument("--image_max_side", type=float, default=1000.0)
    p.add_argument("--anchor_sizes", type=str, default="[128, 256, 512]")
    p.add_argument("--anchor_ratios", type=str,
                   default="[(1, 2), (1, 1), (2, 1)]")
    p.add_argument("--rpn_pre_nms_top_n", type=int, default=6000)
    p.add_argument("--rpn_post_nms_top_n", type=int, default=300)
    p.add_argument("--convert", action="store_true",
                   help="reference legacy-key remap flag (`model.py:420`);"
                        " accepted — torch interop detects layouts itself")
    # robustness (reference eval drivers name these --steps/--gamma/--eps)
    p.add_argument("--pgd_steps", "--steps", type=int, default=3,
                   dest="pgd_steps")
    p.add_argument("--pgd_gamma", "--gamma", type=float, default=2.0,
                   dest="pgd_gamma")
    p.add_argument("--pgd_eps", "--eps", type=float, default=8.0,
                   dest="pgd_eps")
    p.add_argument("--pgd_bailout_tol", type=float, default=None,
                   help="beyond-reference: stop the eval attack early "
                        "once the relative loss change per step drops "
                        "below this (arxiv 2503.19347); saves wall-clock "
                        "for long attacks (--pgd_steps >> 5)")
    # sat layers (`eval_sat_layers.py:42-49`)
    p.add_argument("--sat_tap", "--pertub_idx", type=int, default=2,
                   dest="sat_tap")
    p.add_argument("--sat_alpha", type=float, default=0.5)
    p.add_argument("--sat_layer", type=int, default=None,
                   help="spectrum index k of a --spectrum-point lerp: "
                        "alpha = k/(spectrum-1) (overrides --sat_alpha)")
    p.add_argument("--mix", action="store_true",
                   help="AFN the interpolated feature with the clean "
                        "stats (`evaluator.py:168-170` argument order)")
    # sat_vis (`train_sat_vis.py:129-138` feature dumps)
    p.add_argument("--spectrum", type=int, default=5)
    p.add_argument("--gamma_se", type=float, default=0.9)
    p.add_argument("--dump_dir", default="feature_maps")
    p.add_argument("--limit_images", type=int, default=4)
    # input_surface (legacy ALP probe, `py/evaluator_alp_zzy.py:158-161`)
    p.add_argument("--grid_points", type=int, default=40)
    p.add_argument("--grid_extent", type=float, default=0.1)
    p.add_argument("--surface_out", default="alp_adv.pkl")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    Log.initialize()
    _, eval_loader, num_classes = voc_detection_loaders(
        args.data_dir, 1, args.image_min_side, args.image_max_side,
        dataset=args.dataset)
    cfg = FRCNNConfig(backbone=args.backbone, num_classes=num_classes,
                      anchor_sizes=tuple(ast.literal_eval(args.anchor_sizes)),
                      anchor_ratios=tuple(
                          ast.literal_eval(args.anchor_ratios)),
                      eval_pre_nms_top_n=args.rpn_pre_nms_top_n,
                      eval_post_nms_top_n=args.rpn_post_nms_top_n)
    model = FasterRCNN(cfg=cfg)

    first = next(iter(eval_loader))
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, jnp.asarray(first.images[:1]),
        jnp.asarray(first.boxes[:1]), jnp.asarray(first.labels[:1]),
        jnp.asarray(first.valid[:1]), jax.random.PRNGKey(1),
        method=model.losses)
    tx = detection_tx(lambda c: 0.0)
    state = TrainState.create(variables, tx)
    if args.checkpoint:
        saved = load_checkpoint(args.checkpoint)
        params, frac = overlap_restore(state.params, saved["params"])
        state = state.replace(params=params)
        Log.i(f"Loaded weights ({frac:.1%}) from {args.checkpoint}")
    if args.torch_checkpoint:
        from ..interop.torch_zoo import load_torch_frcnn
        tp, ts, _ = load_torch_frcnn(args.torch_checkpoint)
        params, fp = overlap_restore(state.params, tp)
        stats, fs = overlap_restore(state.batch_stats, ts)
        state = state.replace(params=params, batch_stats=stats)
        Log.i(f"Torch weights loaded (params {fp:.1%}, stats {fs:.1%}) "
              f"from {args.torch_checkpoint}")

    if args.task == "map":
        detect_fn = make_detect_fn(model)
        mean_ap, detail = DetectionEvaluator(
            eval_loader, detect_fn, num_classes).evaluate(state)
        Log.i(f"mean AP = {mean_ap:.4f}\n{detail}")
        return mean_ap

    if args.task == "rob":
        # `evaluator.ori_rob_evaluate` (`evaluator.py:90-133`): attack each
        # image with eval_PGD (needs gt), then run the clean detect path on
        # the adversarial image. We wrap the loader so the standard
        # evaluator sees attacked images.
        attack = make_detection_pgd_fn(model, args.pgd_steps,
                                       args.pgd_gamma / 255,
                                       args.pgd_eps / 255,
                                       bailout_tol=args.pgd_bailout_tol)
        base_detect = make_detect_fn(model)
        eval_state = state

        class _AttackedLoader:
            samples = eval_loader.samples

            def __iter__(self_inner):
                for b in eval_loader:
                    adv = attack(eval_state, jnp.asarray(b.images),
                                 jnp.asarray(b.boxes), jnp.asarray(b.labels),
                                 jnp.asarray(b.valid), jax.random.PRNGKey(1))
                    b.images = np.asarray(adv)
                    yield b

        mean_ap, detail = DetectionEvaluator(
            _AttackedLoader(), base_detect, num_classes).evaluate(state)
        Log.i(f"robust mean AP = {mean_ap:.4f}\n{detail}")
        return mean_ap

    if args.task == "sat_layers":
        alpha = (args.sat_alpha if args.sat_layer is None
                 else args.sat_layer / max(args.spectrum - 1, 1))
        detect = make_sat_layer_detect_fn(
            model, args.sat_tap, alpha, attack_steps=args.pgd_steps,
            gamma=args.pgd_gamma / 255, eps=args.pgd_eps / 255,
            mix=args.mix)
        # custom loop (the attack needs gt, `evaluator.py:135-183`)
        all_ids, all_boxes, all_classes, all_probs = [], [], [], []
        for b in eval_loader:
            boxes, probs, keep = detect(state, jnp.asarray(b.images),
                                        jnp.asarray(b.boxes),
                                        jnp.asarray(b.labels),
                                        jnp.asarray(b.valid),
                                        jax.random.PRNGKey(1))
            boxes, probs, keep = map(np.asarray, (boxes, probs, keep))
            for j, image_id in enumerate(b.image_ids):
                sel = np.nonzero(keep[j] & (probs[j] > 0.05))
                for p_idx, c in zip(*sel):
                    all_ids.append(image_id)
                    all_boxes.append(boxes[j, p_idx, c] / b.scales[j])
                    all_classes.append(int(c))
                    all_probs.append(float(probs[j, p_idx, c]))
        from ..eval.det_map import evaluate_detections
        gt = {s.image_id: (s.eval_boxes if s.eval_boxes is not None
                           else s.boxes,
                           s.eval_labels if s.eval_labels is not None
                           else s.labels,
                           s.eval_difficult if s.eval_difficult is not None
                           else np.zeros(len(s.labels), bool))
              for s in eval_loader.samples}
        if all_ids:
            mean_ap, _ = evaluate_detections(
                num_classes, gt, all_ids, np.stack(all_boxes),
                np.asarray(all_classes), np.asarray(all_probs))
        else:
            mean_ap = 0.0
        Log.i(f"sat-layer (tap {args.sat_tap}, alpha {alpha}, "
              f"mix {args.mix}) mean AP = {mean_ap:.4f}")
        return mean_ap

    if args.task == "sat_vis":
        # per-spectrum-point feature-map PNG dumps
        # (`Detection/train_sat_vis.py:129-138`, `attack_algo.py:268-292`)
        from ..eval.feature_vis import (make_spectrum_features_fn,
                                        save_spectrum_pngs)
        fn = make_spectrum_features_fn(model, args.sat_tap,
                                       args.gamma_se / 255,
                                       steps=args.pgd_steps,
                                       eps=args.pgd_eps / 255,
                                       n_points=args.spectrum)
        written = done = 0
        for b in eval_loader:
            spec = fn(state, jnp.asarray(b.images), jnp.asarray(b.boxes),
                      jnp.asarray(b.labels), jnp.asarray(b.valid),
                      jax.random.PRNGKey(done))
            written += save_spectrum_pngs(spec, b.images, b.image_ids,
                                          args.dump_dir)
            done += len(b.image_ids)
            if args.limit_images and done >= args.limit_images:
                break
        Log.i(f"wrote {written} PNGs ({done} images x {args.spectrum} "
              f"spectrum points) to {args.dump_dir}")
        return written

    if args.task == "input_surface":
        # legacy ALP loss-surface probe (`Detection/py/eval_ALP_zzy.py` +
        # `evaluator_alp_zzy.py:131-186`): per image, a grid of losses over
        # sign-gradient x Rademacher input directions, pickled as
        # {image_id: (points, points) array}. The reference samples 20
        # random eval images; --limit_images bounds ours.
        import pickle

        from ..eval.robustness import make_input_surface_fn
        fn = make_input_surface_fn(model, args.grid_extent, args.grid_points)
        surfaces = {}
        for i, b in enumerate(eval_loader):
            if args.limit_images and i >= args.limit_images:
                break
            Z = fn(state, jnp.asarray(b.images), jnp.asarray(b.boxes),
                   jnp.asarray(b.labels), jnp.asarray(b.valid),
                   jax.random.PRNGKey(i))
            surfaces[b.image_ids[0]] = np.asarray(Z)
        with open(args.surface_out, "wb") as f:
            pickle.dump(surfaces, f)
        Log.i(f"wrote {len(surfaces)} loss surfaces "
              f"({args.grid_points}x{args.grid_points}) to "
              f"{args.surface_out}")
        return surfaces

    if args.task == "loss_vis":
        b = first
        rng_np = np.random.RandomState(0)
        dirs = perturb_weight_directions(state.params, rng_np)

        def loss_at(params):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                jnp.asarray(b.images), jnp.asarray(b.boxes),
                jnp.asarray(b.labels), jnp.asarray(b.valid),
                jax.random.PRNGKey(0), method=model.losses).total()

        scales = [0.0, 0.5, 1.0, 2.0, 5.0]
        losses = loss_landscape_probe(jax.jit(loss_at), state.params, dirs,
                                      scales)
        for s, l in zip(scales, losses):
            Log.i(f"scale {s}: loss {l:.4f}")
        return losses


if __name__ == "__main__":
    main()
