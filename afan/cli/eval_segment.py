"""Segmentation evaluation — the `--test_only` / `--save_val_results` /
``pgd_validate`` surface of `Segmentation/args.py:168-255` and
`main_aug_final.py`.

``--task miou``: clean validation mIoU (StreamSegMetrics).
``--task pgd``: robustness mIoU under input PGD (`args.py:223-255`).
``--save_val_results``: dump color-decoded prediction PNGs
(`cityscapes.py decode_target` / the VOC color map).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.attack import pgd
from ..data.seg_data import (CITY_TRAIN_COLORS, cityscapes_loaders,
                             voc_seg_loaders)
from ..eval.seg_miou import StreamSegMetrics
from ..models.deeplab import build_model
from ..train.checkpoint import load_checkpoint, overlap_restore
from ..train.loop import TrainState
from ..train.segment_loop import (make_seg_eval_step, seg_cross_entropy,
                                  segmentation_tx)
from ..utils.logging import Log


def voc_color_map(n: int = 256) -> np.ndarray:
    """The canonical VOC segmentation palette (bit-shuffled), as used by
    `datasets/voc.py`'s decode_target."""
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["miou", "pgd"], default="miou")
    p.add_argument("--data_root", default="./datasets/data")
    p.add_argument("--dataset", choices=["voc", "cityscapes"], default="voc")
    p.add_argument("--model", default="deeplabv3plus_resnet50")
    p.add_argument("--output_stride", type=int, default=16)
    p.add_argument("--crop_size", type=int, default=513)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--torch_ckpt", default=None,
                   help="a reference `Segmentation` torch .pth; converted "
                        "+ overlap-restored")
    p.add_argument("--save_val_results", action="store_true")
    p.add_argument("--results_dir", default="results")
    p.add_argument("--fused_ce", choices=["auto", "on", "off"],
                   default="auto",
                   help="fused Pallas upsample+CE kernel in the pgd "
                        "attack loss (same semantics as train_segment; "
                        "a Mosaic compile failure falls back to 'off' "
                        "automatically)")
    # pgd flags (`args.py` eval section; reference names aliased)
    p.add_argument("--pgd_steps", "--steps_pgd", type=int, default=3,
                   dest="pgd_steps")
    p.add_argument("--pgd_gamma", "--gamma_pgd", type=float, default=2.0,
                   dest="pgd_gamma")
    p.add_argument("--pgd_eps", "--eps_pgd", type=float, default=8.0,
                   dest="pgd_eps")
    p.add_argument("--pgd_bailout_tol", type=float, default=None,
                   help="beyond-reference: stop the eval attack early "
                        "once the relative loss change per step drops "
                        "below this (arxiv 2503.19347); saves wall-clock "
                        "for long attacks (--pgd_steps >> 5)")
    p.add_argument("--randinit_pgd", action="store_true")
    p.add_argument("--clip_pgd", action="store_true")
    p.add_argument("--limit_images", type=int, default=0)
    p.add_argument("--crop_val", action="store_true",
                   help="resize+center-crop val images to crop_size")
    p.add_argument("--val_batch_size", type=int, default=1)
    p.add_argument("--year", type=str, default="2012")
    p.add_argument("--num_classes", type=int, default=None)
    args = p.parse_args(argv)
    Log.initialize()

    if args.dataset == "cityscapes":
        _, val_loader, num_classes = cityscapes_loaders(
            args.data_root, 1, args.crop_size,
            val_batch_size=args.val_batch_size, crop_val=args.crop_val)
    else:
        _, val_loader, num_classes = voc_seg_loaders(
            args.data_root, 1, args.crop_size, year=args.year,
            val_batch_size=args.val_batch_size, crop_val=args.crop_val)
    if args.num_classes is not None:
        num_classes = args.num_classes

    model = build_model(args.model, num_classes, args.output_stride)
    rng = jax.random.PRNGKey(0)
    canvas = None if args.crop_val else val_loader.eval_canvas
    ch, cw = canvas or (args.crop_size, args.crop_size)
    dummy = jnp.zeros((1, ch, cw, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, dummy, False)
    tx = segmentation_tx(lambda c: 0.0)
    state = TrainState.create(variables, tx)
    if args.ckpt:
        saved = load_checkpoint(args.ckpt)
        params, frac = overlap_restore(state.params, saved["params"])
        stats, fs = overlap_restore(state.batch_stats,
                                    saved.get("batch_stats",
                                              state.batch_stats))
        state = state.replace(params=params, batch_stats=stats)
        Log.i(f"restored {frac:.1%} of params, {fs:.1%} of batch_stats "
              f"from {args.ckpt}")
    if args.torch_ckpt:
        from ..interop.torch_zoo import load_torch_deeplab
        tp, ts, _ = load_torch_deeplab(args.torch_ckpt,
                                       plus="plus" in args.model)
        params, fp = overlap_restore(state.params, tp)
        stats, fs = overlap_restore(state.batch_stats, ts)
        state = state.replace(params=params, batch_stats=stats)
        Log.i(f"torch weights loaded (params {fp:.1%}, stats {fs:.1%}) "
              f"from {args.torch_ckpt}")

    eval_step = make_seg_eval_step(model, num_classes)

    if args.task == "pgd":
        variables_eval = state.variables()

        from ..train.segment_loop import (FallbackStep, _make_site_loss,
                                          _resolve_fused)

        def build_attack(fused_ce):
            use_fused, interp, _ = _resolve_fused(fused_ce, False)

            @jax.jit
            def attack(images, labels, rng):
                site_loss = _make_site_loss(
                    use_fused, interp, None, seg_cross_entropy, labels,
                    (images.shape[1], images.shape[2]))

                def loss_fn(x):
                    lo = model.apply(variables_eval, x, False,
                                     method=model.forward_logits)
                    return site_loss(lo)
                return jnp.clip(pgd(loss_fn, images, steps=args.pgd_steps,
                                    gamma=args.pgd_gamma / 255,
                                    eps=args.pgd_eps / 255,
                                    randinit=args.randinit_pgd,
                                    clip=args.clip_pgd, rng=rng,
                                    bailout_tol=args.pgd_bailout_tol),
                                0.0, 1.0)
            return attack

        # Same fail-safe as the trainer: a Mosaic rejection of the fused
        # resize+CE kernel on the first call falls back to the XLA path
        # instead of killing the eval.
        fused_mode = {"auto": "auto", "on": True, "off": False}[args.fused_ce]
        run_attack = FallbackStep(build_attack, fused_mode)

    metrics = StreamSegMetrics(num_classes)
    palette = (CITY_TRAIN_COLORS if args.dataset == "cityscapes"
               else voc_color_map()[:num_classes])
    if args.save_val_results:
        os.makedirs(args.results_dir, exist_ok=True)
    for i, (imgs, labs) in enumerate(val_loader):
        if args.limit_images and i >= args.limit_images:
            break
        x = jnp.asarray(imgs)
        y = jnp.asarray(labs)
        if args.task == "pgd":
            x = run_attack(x, y, jax.random.fold_in(rng, i))
        preds, hist = eval_step(state, x, y)
        metrics.update_hist(np.asarray(hist))
        if args.save_val_results:
            from PIL import Image
            pred = np.asarray(preds[0])
            color = palette[np.clip(pred, 0, len(palette) - 1)]
            Image.fromarray(color).save(
                os.path.join(args.results_dir, f"{i:06d}_pred.png"))
    results = metrics.get_results()
    Log.i(StreamSegMetrics.to_str(results))
    return results["Mean IoU"]


if __name__ == "__main__":
    main()
