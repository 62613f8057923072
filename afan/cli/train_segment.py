"""Segmentation training driver: baseline / advtrain / A-FAN family.

CLI surface covering the reference's 9 mains (`Segmentation/main_ori.py`,
`main_advtrain.py`, `main_aug_final.py`, `main_aug_sat_{advt,clean}.py`,
`main_aug_muti_{advt,clean}.py`, `main_aug_sat_muti_{advt,clean}.py`) via
``--variant``, with the shared flag surface of `Segmentation/args.py:10-106`.

Canonical runs: Cityscapes final — SD=concat, SE=2, gamma_se .02/.04,
gamma_sd 1.5, w .3, mix_sd, crop 768, lr .1, bs 4
(`sh/city/clean50/091_city_final01.sh`); VOC2012 — SD=aspp, SE=3,
gamma_se .01, gamma_sd .4, w .3 (`sh/voc/2012/clean50/01_final50.sh`).
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.seg_data import cityscapes_loaders, voc_seg_loaders
from ..eval.seg_miou import StreamSegMetrics
from ..models.deeplab import build_model
from ..parallel.mesh import check_divisible, make_mesh, replicate_state, shard_batch
from ..train.checkpoint import (load_checkpoint, overlap_restore,
                                restore_opt_state, save_checkpoint)
from ..train.loop import TrainState
from ..train.optim import poly_schedule
from ..train.segment_loop import (FallbackStep, SegAfanConfig, make_afan_seg_step,
                                  make_seg_advtrain_step, make_seg_base_step,
                                  make_seg_eval_step, segmentation_tx)
from ..utils.logging import Log
from ..utils.observe import ScalarWriter

VARIANTS = ("baseline", "advtrain", "afan", "sat", "sat_clean", "multi",
            "multi_clean", "sat_multi", "sat_multi_clean")


def get_parser():
    p = argparse.ArgumentParser(description="A-FAN TPU segmentation training")
    p.add_argument("--variant", choices=VARIANTS, default="afan")
    # args.py surface
    p.add_argument("--data_root", type=str, default="./datasets/data")
    p.add_argument("--dataset", choices=["voc", "cityscapes", "synthetic"],
                   default="voc")
    p.add_argument("--model", type=str, default="deeplabv3plus_resnet50")
    p.add_argument("--output_stride", type=int, default=16, choices=[8, 16])
    p.add_argument("--separable_conv", action="store_true",
                   help="AtrousSeparableConvolution in the decoder "
                        "(convert_to_separable_conv parity)")
    p.add_argument("--total_itrs", type=int, default=30000)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--lr_policy", choices=["poly", "step"], default="poly")
    p.add_argument("--step_size", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--crop_size", type=int, default=513)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--loss_type", choices=["cross_entropy", "focal_loss"],
                   default="cross_entropy")
    p.add_argument("--val_interval", type=int, default=100)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--pretrained_backbone", default=None,
                   help="torchvision resnet .pth; overlap-loaded into the "
                        "backbone like the reference's ImageNet init "
                        "(`network/backbone/resnet.py:307-319`)")
    p.add_argument("--continue_training", action="store_true")
    p.add_argument("--exp", type=str, default="afan")
    p.add_argument("--random_seed", type=int, default=1)
    # A-FAN flags (`args.py` SE/SD section)
    p.add_argument("--pertub_idx_se", type=int, default=2)
    p.add_argument("--pertub_idx_sd", choices=["aspp", "concat", "none"],
                   default="concat")
    p.add_argument("--gamma_se", type=float, default=0.02)
    p.add_argument("--gamma_sd", type=float, default=1.5)
    p.add_argument("--adv_loss_weight_sd", type=float, default=0.3)
    p.add_argument("--mix_layer", type=str, default="00",
                   help="AFN mask chars for the spectrum interior+adv points")
    p.add_argument("--mix_sd", action="store_true")
    p.add_argument("--noise_sd", type=float, default=0.0)
    p.add_argument("--steps", type=int, default=1)
    p.add_argument("--loss_settings", type=int, default=1)
    p.add_argument("--eps", type=float, default=2.0)
    p.add_argument("--randinit", action="store_true")
    p.add_argument("--clip", action="store_true")
    p.add_argument("--pgd_step_mode", choices=("sign", "grad"),
                   default="sign",
                   help="beyond-reference: raw-gradient PGD direction "
                        "(arxiv 2312.01260) for every ascent in the step")
    p.add_argument("--pgd_random_steps", action="store_true",
                   help="beyond-reference: WITCHcraft per-step random "
                        "step sizes (arxiv 1911.07989)")
    # TPU-era
    p.add_argument("--remat_tails", action="store_true", default=False,
                   help="jax.checkpoint the spectrum tails (memory for "
                        "~6%% step time; only needed beyond the stock "
                        "crop/batch recipes)")
    p.add_argument("--backbone_remat", action="store_true", default=False,
                   help="rematerialize backbone stages in backward passes "
                        "(memory for time; the stock b4 crop-768 recipe "
                        "fits and runs faster without it)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fused_ce", choices=["auto", "on", "off"],
                   default="auto",
                   help="fused Pallas upsample+CE kernel on the loss "
                        "sites (ops/kernels/resize_ce_kernel.py): "
                        "auto=on-TPU, on=force (interpret mode off-TPU), "
                        "off=XLA resize+CE. A Mosaic compile failure "
                        "falls back to 'off' automatically.")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--spatial_shards", type=int, default=1,
                   help="shard image ROWS over this many devices in "
                        "addition to batch DP (2-D data x spatial mesh; "
                        "XLA inserts conv halo exchanges). Use when the "
                        "per-device batch can't go below 1. crop_size "
                        "must divide by it.")
    p.add_argument("--limit_itrs", type=int, default=0)
    # training-time image panels (`Segmentation/args.py` --enable_vis /
    # --vis_num_samples; visdom replaced by PNG triptychs under runs/)
    p.add_argument("--enable_vis", action="store_true",
                   help="dump input|target|prediction panels at each "
                        "validation (the reference's visdom dashboard)")
    p.add_argument("--vis_num_samples", type=int, default=8)
    # remaining reference `args.py` surface (drop-in compat)
    p.add_argument("--mix_all", action="store_true",
                   help="AFN every adversarial feature (multi variants; "
                        "`main_aug_muti_advt.py:199-204`)")
    p.add_argument("--test_only", type=str, default="",
                   help="path to ckpt: restore, validate, exit "
                        "(`args.py:17`)")
    p.add_argument("--print_interval", type=int, default=10)
    p.add_argument("--num_classes", type=int, default=None,
                   help="override the dataset's class count")
    p.add_argument("--year", type=str, default="2012",
                   choices=["2012_aug", "2012", "2011", "2009", "2008",
                            "2007"])
    p.add_argument("--crop_val", action="store_true",
                   help="resize+center-crop val images to crop_size")
    p.add_argument("--val_batch_size", type=int, default=1)
    p.add_argument("--download", action="store_true",
                   help="reference flag; this environment has no egress "
                        "— a warning is logged and the synthetic "
                        "fallback applies when data is absent")
    # accepted for reference-script compatibility; not applicable here
    p.add_argument("--gpu_id", type=str, default=None,
                   help="ignored (TPU; use --num_devices)")
    p.add_argument("--vis_port", type=str, default=None,
                   help="ignored (visdom replaced by --enable_vis panels)")
    p.add_argument("--vis_env", type=str, default=None, help="ignored")
    p.add_argument("--adv_type", type=str, default="baseline",
                   help="accepted for compat (unused by the reference "
                        "trainers too)")
    p.add_argument("--input_adv", action="store_true",
                   help="add the input-PGD l0 term to the flagship "
                        "variant (legacy `py/main_aug_final_advtrain.py`;"
                        " the sat/multi _advt variants imply it)")
    return p


def _build_variant_step(args, model, tx, fused_ce):
    """Jitted train step for ``args.variant`` with the given fused_ce
    mode (see SegAfanConfig.fused_ce)."""
    if args.variant == "baseline":
        return make_seg_base_step(model, tx, fused_ce=fused_ce)
    if args.variant == "advtrain":
        return make_seg_advtrain_step(model, tx, steps=args.steps,
                                      gamma=args.gamma_se / 255,
                                      eps=args.eps / 255,
                                      fused_ce=fused_ce)
    base = args.variant.replace("_clean", "")
    spectrum = {"afan": 3, "sat": 3, "multi": 2, "sat_multi": 3}[base]
    mask = [0] * spectrum
    for i, ch in enumerate(args.mix_layer[:spectrum - 1]):
        if ch == "1":
            mask[i + 1] = 1
    if args.mix_all:
        mask = [0] + [1] * (spectrum - 1)
    input_adv = args.input_adv or (
        args.variant != "afan"
        and not args.variant.endswith("_clean"))
    weight_mode = {"afan": "final", "sat": "sat_preset",
                   "multi": "multi_preset",
                   "sat_multi": "multi_preset"}[base]
    if base in ("multi", "sat_multi"):
        # `main_aug_muti_advt.py:180-197`: taps 1-4, gamma .1/255 on
        # tap 3, .001/255 on the others; spectrum (sat_multi) rides
        # the main tap (3)
        tap_se, extra = 3, (1, 2, 4)
        eg = (0.001 / 255,) * 3
        gamma_se = 0.1 / 255
    else:
        tap_se, extra, eg = args.pertub_idx_se, (), ()
        gamma_se = args.gamma_se / 255
    cfg = SegAfanConfig(
        tap_se=tap_se, extra_taps=extra, extra_gammas=eg,
        sd=None if args.pertub_idx_sd == "none" else args.pertub_idx_sd,
        steps=args.steps, gamma_se=gamma_se,
        gamma_sd=args.gamma_sd / 255, eps=args.eps / 255,
        spectrum=spectrum, mix_mask=tuple(mask),
        mix_sd=args.mix_sd or args.mix_all,
        noise_sd=args.noise_sd, mix_all=args.mix_all,
        randinit=args.randinit, clip=args.clip,
        step_mode=args.pgd_step_mode, random_steps=args.pgd_random_steps,
        use_focal=args.loss_type == "focal_loss",
        weight_mode=weight_mode, loss_setting=args.loss_settings,
        input_adv=input_adv, remat_tails=args.remat_tails,
        fused_ce=fused_ce)
    return make_afan_seg_step(model, tx, cfg)


# Fail-safe wrapper shared with eval_segment; tests import it from here.
_FallbackStep = FallbackStep


def main(argv=None):
    args = get_parser().parse_args(argv)
    exp = (f"{args.dataset}_{args.exp}_selayer_{args.pertub_idx_se}"
           f"_sdlayer_{args.pertub_idx_sd}_gamma_se{args.gamma_se}"
           f"_gamma_sd{args.gamma_sd}_advweight{args.adv_loss_weight_sd}"
           f"MIX{args.mix_layer}")
    outdir = os.path.join("checkpoints", exp)
    os.makedirs(outdir, exist_ok=True)
    Log.initialize(os.path.join(outdir, "train.log"))
    Log.i(f"args: {vars(args)}; save dir: [{exp}]")

    if args.download:
        Log.i("--download requested: this environment has no egress; "
              "falling back to on-disk data or the synthetic pipeline")
    if args.dataset == "cityscapes":
        train_loader, val_loader, num_classes = cityscapes_loaders(
            args.data_root, args.batch_size, args.crop_size,
            seed=args.random_seed, val_batch_size=args.val_batch_size,
            crop_val=args.crop_val)
    else:
        train_loader, val_loader, num_classes = voc_seg_loaders(
            args.data_root, args.batch_size, args.crop_size,
            year=args.year, seed=args.random_seed,
            val_batch_size=args.val_batch_size, crop_val=args.crop_val)
    if args.num_classes is not None:
        num_classes = args.num_classes

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = build_model(args.model, num_classes, args.output_stride, dtype,
                        separable_conv=args.separable_conv,
                        backbone_remat=args.backbone_remat)

    total = args.limit_itrs or args.total_itrs
    if args.lr_policy == "step":
        # StepLR(step_size, gamma=0.1) (`main_aug_final.py:87`)
        def schedule(count):
            return args.lr * 0.1 ** (count // args.step_size)
    else:
        schedule = poly_schedule(args.lr, args.total_itrs, 0.9)
    tx = segmentation_tx(schedule, 0.9, args.weight_decay)

    rng = jax.random.PRNGKey(args.random_seed)
    dummy = jnp.zeros((1, args.crop_size, args.crop_size, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, dummy, False)
    state = TrainState.create(variables, tx)

    if args.pretrained_backbone:
        from ..interop.torch_zoo import load_torchvision_backbone
        bp, bs, _ = load_torchvision_backbone(args.pretrained_backbone,
                                              frozen_bn=False)
        merged_p, fp = overlap_restore(state.params["backbone"], bp)
        merged_s, fs = overlap_restore(state.batch_stats["backbone"], bs)
        state = state.replace(
            params={**state.params, "backbone": merged_p},
            batch_stats={**state.batch_stats, "backbone": merged_s})
        Log.i(f"ImageNet backbone loaded (params {fp:.1%}, stats {fs:.1%}) "
              f"from {args.pretrained_backbone}")

    if args.spatial_shards > 1:
        from ..parallel.mesh import make_mesh_2d
        n_total = args.num_devices or jax.device_count()
        if n_total % args.spatial_shards:
            raise SystemExit(
                f"device count {n_total} must divide by "
                f"--spatial_shards {args.spatial_shards}")
        mesh = make_mesh_2d(n_total // args.spatial_shards,
                            args.spatial_shards)
        check_divisible(args.batch_size * args.spatial_shards, mesh)
        if args.crop_size % args.spatial_shards:
            raise SystemExit("--crop_size must divide by --spatial_shards")
        Log.i(f"2-D mesh: data={mesh.shape['data']} x "
              f"spatial={mesh.shape['spatial']}")
    else:
        mesh = make_mesh(args.num_devices)
        check_divisible(args.batch_size, mesh)
        Log.i(f"data-parallel over {mesh.size} device(s)")
    state = replicate_state(mesh, state)

    cur_itrs, best_score = 0, 0.0
    if args.ckpt and os.path.isfile(args.ckpt):
        saved = load_checkpoint(args.ckpt)
        params, frac = overlap_restore(state.params, saved["params"])
        stats, fs = overlap_restore(state.batch_stats,
                                    saved.get("batch_stats",
                                              state.batch_stats))
        state = state.replace(params=params, batch_stats=stats)
        Log.i(f"restored {frac:.1%} of params, {fs:.1%} of batch_stats "
              f"from {args.ckpt}")
        if args.continue_training:
            cur_itrs = saved.get("cur_itrs", 0)
            best_score = saved.get("best_score", 0.0)
            if "opt_state" in saved:
                # reference restores optimizer+scheduler when continuing
                # (`Segmentation/main_aug_final.py:115-127`)
                opt, ok = restore_opt_state(state.opt_state,
                                            saved["opt_state"])
                state = state.replace(opt_state=opt)
                Log.i("Optimizer state "
                      + ("restored" if ok else
                         "structure mismatch — keeping fresh init"))
        Log.i(f"Model restored ({frac:.1%}) from {args.ckpt}")

    fused_ce = {"auto": "auto", "on": True, "off": False}[args.fused_ce]

    def build_step(fused):
        return _build_variant_step(args, model, tx, fused)

    step = _FallbackStep(build_step, fused_ce)
    eval_step = make_seg_eval_step(model, num_classes)
    if args.test_only:
        saved = load_checkpoint(args.test_only)
        params, frac = overlap_restore(state.params, saved["params"])
        # overlap-restore the stats too (a ckpt from a different model
        # must not silently replace the tree wholesale)
        stats, fs = overlap_restore(state.batch_stats,
                                    saved.get("batch_stats",
                                              state.batch_stats))
        state = state.replace(params=params, batch_stats=stats)
        Log.i(f"[test_only] restored params {frac:.1%}, stats {fs:.1%} "
              f"from {args.test_only}")
        metrics = StreamSegMetrics(num_classes)
        for imgs, labs in val_loader:
            _, hist = eval_step(state, jnp.asarray(imgs),
                                jnp.asarray(labs))
            metrics.update_hist(np.asarray(hist))
        results = metrics.get_results()
        Log.i(StreamSegMetrics.to_str(results))
        return results

    if args.enable_vis:
        from ..data.seg_data import CITY_TRAIN_COLORS
        from ..utils.observe import save_image_panel
        from .eval_segment import voc_color_map
        palette = (CITY_TRAIN_COLORS if args.dataset == "cityscapes"
                   else voc_color_map()[:num_classes])

        def _decode(lab):
            lab = np.asarray(lab)
            rgb = np.zeros(lab.shape + (3,), np.uint8)
            ok = lab < len(palette)
            rgb[ok] = palette[lab[ok]]
            return rgb

    def validate(itrs=0):
        metrics = StreamSegMetrics(num_classes)
        vis_left = args.vis_num_samples if args.enable_vis else 0
        for imgs, labs in val_loader:
            preds, hist = eval_step(state, jnp.asarray(imgs),
                                    jnp.asarray(labs))
            metrics.update_hist(np.asarray(hist))
            for j in range(min(vis_left, len(imgs))):
                save_image_panel(
                    os.path.join("runs", exp, "vis",
                                 f"itrs{itrs:06d}_{vis_left:02d}.png"),
                    imgs[j], _decode(labs[j]), _decode(preds[j]))
                vis_left -= 1
        return metrics.get_results()

    writer = ScalarWriter(os.path.join("runs", exp))
    interval_loss = 0.0
    t0 = time.time()
    while cur_itrs < total:
        for imgs, labs in train_loader:
            cur_itrs += 1
            if args.spatial_shards > 1:
                from ..parallel.mesh import shard_batch_spatial
                xb, yb = shard_batch_spatial(mesh, jnp.asarray(imgs),
                                             jnp.asarray(labs))
            else:
                xb, yb = shard_batch(mesh, jnp.asarray(imgs),
                                     jnp.asarray(labs))
            state, metrics = step(state, xb, yb,
                                  jax.random.fold_in(rng, cur_itrs))
            interval_loss += float(metrics["loss"])
            writer.add_scalar("train/loss", float(metrics["loss"]),
                              cur_itrs)
            if cur_itrs % args.print_interval == 0:
                rate = (args.print_interval * args.batch_size
                        / (time.time() - t0))
                Log.i(f"Itrs {cur_itrs}/{total}, Loss="
                      f"{interval_loss / args.print_interval:.4f} "
                      f"({rate:.2f} "
                      f"imgs/sec)")
                interval_loss = 0.0
                t0 = time.time()
            if cur_itrs % args.val_interval == 0 or cur_itrs >= total:
                results = validate(cur_itrs)
                score = results["Mean IoU"]
                writer.add_scalar("val/mIoU", score, cur_itrs)
                Log.i(f"[Val] itrs {cur_itrs}: "
                      f"{StreamSegMetrics.to_str(results)}")
                payload = {"cur_itrs": cur_itrs, "params": state.params,
                           "batch_stats": state.batch_stats,
                           "opt_state": state.opt_state,
                           "best_score": max(best_score, score)}
                save_checkpoint(os.path.join(
                    outdir, f"latest_{args.model}_{args.dataset}.pt"), payload)
                if score > best_score:
                    best_score = score
                    save_checkpoint(os.path.join(
                        outdir, f"best_{args.model}_{args.dataset}.pt"),
                        payload)
            if cur_itrs >= total:
                break

    Log.i(f"done; best mIoU {best_score:.4f}")
    return best_score


if __name__ == "__main__":
    main()
