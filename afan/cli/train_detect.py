"""Detection training driver: baseline / advtrain / A-FAN family.

CLI surface covering the reference's 14 train scripts
(`Detection/train_baseline.py`, `train_baseline_advtrain.py`,
`train_aug_final.py`, `train_aug_sat{,3,7,10}_advt.py`,
`train_aug_sat_clean.py`, `train_aug_muti_{advt,clean}.py`,
`train_aug_sat_muti_{advt,clean}.py`, `train_aug_single_advt.py`) via
``--variant`` + flags (the reference encodes variants as forked scripts;
SURVEY.md §7 prescribes this consolidation).

Canonical VOC recipe (`Detection/sh/voc2007/clean50/090_final_setting1.sh`):
bs 8, lr .008, steps [6250, 8750], finish 11250, gamma_se .9, gamma_sd .1.
COCO recipe (`sh/coco/.../090_final_setting1_gpu01.sh`): min/max side
800/1333, anchors [64,128,256,512], beta .1111, lr .01, wd 1e-4,
steps [120k,160k], finish 180k.
"""
from __future__ import annotations

import argparse
import ast
import os
import time
from collections import deque

import jax
import jax.numpy as jnp

from ..data.registry import DETECTION_DATASETS, detection_loaders
from ..eval.det_map import DetectionEvaluator
from ..models.frcnn import FRCNNConfig, FasterRCNN
from ..parallel.mesh import check_divisible, make_mesh, replicate_state, shard_batch
from ..train.checkpoint import (load_checkpoint, overlap_restore,
                                restore_opt_state, save_checkpoint)
from ..train.detect_loop import (DetAfanConfig, detection_tx,
                                 make_advtrain_det_step, make_afan_det_step,
                                 make_baseline_det_step, make_detect_fn)
from ..train.loop import TrainState
from ..train.optim import warmup_multistep_schedule
from ..utils.logging import Log
from ..utils.observe import ScalarWriter

VARIANTS = ("baseline", "advtrain", "afan", "sat", "sat_clean", "sat3",
            "sat7", "sat10", "multi", "multi_clean", "sat_multi",
            "sat_multi_clean", "single")


def get_parser():
    p = argparse.ArgumentParser(description="A-FAN TPU detection training")
    p.add_argument("--variant", choices=VARIANTS, default="afan")
    p.add_argument("-s", "--dataset", default="voc2007",
                   choices=list(DETECTION_DATASETS)
                   + ["voc2007-cat-dog", "coco2017-person",
                      "coco2017-car", "coco2017-animal"])
    p.add_argument("-b", "--backbone", default="resnet50",
                   choices=["resnet18", "resnet50", "resnet101"])
    p.add_argument("-d", "--data_dir", default="./data")
    p.add_argument("-o", "--outputs_dir", default="./outputs")
    p.add_argument("-r", "--resume_checkpoint", default=None)
    p.add_argument("--pretrained_backbone", default=None,
                   help="torchvision resnet .pth; overlap-loaded into the "
                        "backbone like the reference's ImageNet zoo init "
                        "(`backbone/resnet50_ori.py:281-293`)")
    # Config/TrainConfig surface (`Detection/config/train_config.py`)
    p.add_argument("--image_min_side", type=float, default=600.0)
    p.add_argument("--image_max_side", type=float, default=1000.0)
    p.add_argument("--anchor_sizes", type=str, default="[128, 256, 512]")
    p.add_argument("--anchor_ratios", type=str,
                   default="[(1, 2), (1, 1), (2, 1)]")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=0.0005)
    p.add_argument("--step_lr_sizes", type=str, default="[50000, 70000]")
    p.add_argument("--step_lr_gamma", type=float, default=0.1)
    p.add_argument("--warm_up_factor", type=float, default=0.3333)
    p.add_argument("--warm_up_num_iters", type=int, default=500)
    p.add_argument("--anchor_smooth_l1_loss_beta", type=float, default=1.0)
    p.add_argument("--proposal_smooth_l1_loss_beta", type=float, default=1.0)
    p.add_argument("--pooler_mode", choices=["align", "pooling"],
                   default="align",
                   help="Config.POOLER_MODE (`config/config.py:12`)")
    p.add_argument("--rpn_pre_nms_top_n", type=int, default=12000)
    p.add_argument("--rpn_post_nms_top_n", type=int, default=2000)
    p.add_argument("--num_steps_to_display", type=int, default=20)
    p.add_argument("--num_steps_to_snapshot", type=int, default=10000)
    p.add_argument("--num_steps_to_finish", type=int, default=90000)
    # A-FAN flags (`train_aug_final.py:200-247`)
    p.add_argument("--pertub_idx_se", type=int, default=2)
    p.add_argument("--sd_only", action="store_true",
                   help="no SE taps at all — SD attack only (the legacy "
                        "`py/train_aug_single_sd*.py` family; sets "
                        "taps_se=() so spectrum/AFN are skipped)")
    p.add_argument("--pertub_idx_sd", type=str, default="roi",
                   choices=["roi", "rpn", "none"])
    p.add_argument("--gamma_se", type=float, default=0.9)
    p.add_argument("--gamma_sd", type=float, default=0.1)
    p.add_argument("--sd_adv_loss_weight", type=float, default=0.3)
    p.add_argument("--mix_layer", type=str, default="0000",
                   help="AFN mask chars for spectrum points 1..N-1")
    p.add_argument("--mix_sd", action="store_true")
    p.add_argument("--noise_sd", type=float, default=0.0)
    p.add_argument("--only_roi_sd", action="store_true", default=True)
    p.add_argument("--randinit", action="store_true")
    p.add_argument("--clip", action="store_true")
    p.add_argument("--steps", type=int, default=1)
    p.add_argument("--pgd_step_mode", choices=("sign", "grad"),
                   default="sign",
                   help="beyond-reference: raw-gradient PGD direction "
                        "(arxiv 2312.01260) for every ascent in the step")
    p.add_argument("--pgd_random_steps", action="store_true",
                   help="beyond-reference: WITCHcraft per-step random "
                        "step sizes (arxiv 1911.07989)")
    p.add_argument("--loss_settings", type=int, default=1,
                   help="SAT weight preset 1-4 (train_aug_sat_advt.py)")
    p.add_argument("--share_proposals", action="store_true", default=True,
                   help="fast path (default): sample anchors/proposals once "
                        "per step and reuse across all tail forwards "
                        "(-25%% step time; measured mAP parity, PARITY.md)")
    p.add_argument("--no_share_proposals", dest="share_proposals",
                   action="store_false",
                   help="reference-exact trajectory: resample per forward")
    p.add_argument("--remat_tails", action="store_true", default=False,
                   help="jax.checkpoint the spectrum tails (trade ~15%% "
                        "step time for activation memory; needed only for "
                        "batch/canvas beyond the stock recipes)")
    # TPU-era additions
    p.add_argument("--unfreeze_backbone", action="store_true",
                   help="train stem/layer1/BN-affine too — needed for "
                        "FROM-SCRATCH training (the reference always "
                        "ImageNet-inits and freezes them)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--eval_every", type=int, default=0,
                   help="run mAP eval every N steps (0 = only at end)")
    p.add_argument("--seed", "--random_seed", type=int, default=0,
                   dest="seed")
    return p


def afan_config_for(args) -> DetAfanConfig:
    spectrum = {"afan": 5, "sat": 5, "sat_clean": 5, "sat3": 3, "sat7": 7,
                "sat10": 10, "single": 2, "multi": 2, "multi_clean": 2,
                "sat_multi": 5, "sat_multi_clean": 5}[args.variant]
    mask = [0] * spectrum
    for i, ch in enumerate(args.mix_layer[:spectrum - 1]):
        if ch == "1":
            mask[i + 1] = 1
    if args.sd_only:
        # --sd_only means NO SE taps at all, whatever the variant — it
        # must take precedence over the multi family's tap presets
        # (legacy `py/train_aug_single_sd*.py`)
        taps, gammas = (), ()
    elif args.variant in ("multi", "multi_clean", "sat_multi",
                          "sat_multi_clean"):
        # `train_aug_muti_advt.py:91-100`: layers 1,2,3 with tiny gammas on
        # 1 and 2, the main gamma on 3
        taps = (3, 1, 2)
        gammas = (args.gamma_se / 255, 0.1 * args.gamma_se / 255,
                  0.1 * args.gamma_se / 255)
    else:
        taps = (args.pertub_idx_se,)
        gammas = (args.gamma_se / 255,)
    sd = None if args.pertub_idx_sd == "none" else args.pertub_idx_sd
    # SAT family: layer-2 tap, AFN on the upper spectrum points, the
    # sat_preset loss, input-adv for the *_advt names
    # (`train_aug_sat_advt.py:80-92`); the reference's SAT scripts run
    # WITHOUT the SD attack.
    weight_mode = "final"
    input_adv = False
    if args.variant.startswith("sat") and args.variant != "sat_multi":
        weight_mode = "sat_preset"
        sd = None
        input_adv = not args.variant.endswith("_clean")
    elif args.variant == "single":
        weight_mode = "single"
        sd = None
    elif args.variant.endswith("_clean"):
        input_adv = False
    elif args.variant in ("multi", "sat_multi"):
        input_adv = True
    return DetAfanConfig(
        taps_se=taps, gammas_se=gammas, spectrum=spectrum,
        mix_mask=tuple(mask), sd=sd, gamma_sd=args.gamma_sd / 255,
        only_roi_sd=args.only_roi_sd, mix_sd=args.mix_sd,
        noise_sd=args.noise_sd, sd_weight=args.sd_adv_loss_weight,
        steps=args.steps, randinit=args.randinit, clip=args.clip,
        step_mode=args.pgd_step_mode, random_steps=args.pgd_random_steps,
        weight_mode=weight_mode, loss_setting=args.loss_settings,
        input_adv=input_adv, share_proposals=args.share_proposals,
        remat_tails=args.remat_tails)


def main(argv=None):
    args = get_parser().parse_args(argv)
    os.makedirs(args.outputs_dir, exist_ok=True)
    Log.initialize(os.path.join(args.outputs_dir, "train.log"))
    Log.i(f"args: {vars(args)}")

    train_loader, eval_loader, num_classes = detection_loaders(
        args.dataset, args.data_dir, args.batch_size, args.image_min_side,
        args.image_max_side, seed=args.seed)
    Log.i(f"Found {len(train_loader.samples)} train samples")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = FRCNNConfig(
        backbone=args.backbone, num_classes=num_classes,
        anchor_sizes=tuple(ast.literal_eval(args.anchor_sizes)),
        anchor_ratios=tuple(ast.literal_eval(args.anchor_ratios)),
        train_pre_nms_top_n=args.rpn_pre_nms_top_n,
        train_post_nms_top_n=args.rpn_post_nms_top_n,
        anchor_smooth_l1_beta=args.anchor_smooth_l1_loss_beta,
        proposal_smooth_l1_beta=args.proposal_smooth_l1_loss_beta,
        pooler_mode=args.pooler_mode)
    model = FasterRCNN(cfg=cfg, dtype=dtype)

    schedule = warmup_multistep_schedule(
        args.learning_rate, ast.literal_eval(args.step_lr_sizes),
        args.step_lr_gamma, args.warm_up_factor, args.warm_up_num_iters)
    tx = detection_tx(schedule, args.momentum, args.weight_decay,
                      freeze=not args.unfreeze_backbone)

    # init from one batch's shapes
    first = next(iter(train_loader))
    rng = jax.random.PRNGKey(args.seed)
    variables = model.init(
        {"params": rng}, jnp.asarray(first.images[:1]),
        jnp.asarray(first.boxes[:1]), jnp.asarray(first.labels[:1]),
        jnp.asarray(first.valid[:1]), jax.random.PRNGKey(1),
        method=model.losses)
    state = TrainState.create(variables, tx)

    if args.pretrained_backbone:
        from ..interop.torch_zoo import load_torchvision_backbone
        bp, bs, _ = load_torchvision_backbone(args.pretrained_backbone,
                                              frozen_bn=True)
        merged_p, fp = overlap_restore(state.params["backbone"], bp)
        merged_s, fs = overlap_restore(state.batch_stats["backbone"], bs)
        state = state.replace(
            params={**state.params, "backbone": merged_p},
            batch_stats={**state.batch_stats, "backbone": merged_s})
        Log.i(f"ImageNet backbone loaded (params {fp:.1%}, stats {fs:.1%}) "
              f"from {args.pretrained_backbone}")

    mesh = make_mesh(args.num_devices)
    check_divisible(args.batch_size, mesh)
    state = replicate_state(mesh, state)
    Log.i(f"Start training with {mesh.size} device(s) "
          f"({args.batch_size // mesh.size} batches per device)")

    step0 = 0
    if args.resume_checkpoint:
        saved = load_checkpoint(args.resume_checkpoint)
        if saved:
            params, frac = overlap_restore(state.params, saved["params"])
            state = state.replace(params=params)
            if saved.get("batch_stats"):
                stats, _ = overlap_restore(state.batch_stats,
                                           saved["batch_stats"])
                state = state.replace(batch_stats=stats)
            if "opt_state" in saved:
                # full-fidelity resume: SGD momentum + LR-schedule count
                # (`Detection/model.py:189-217` persists optimizer+scheduler)
                opt, ok = restore_opt_state(state.opt_state,
                                            saved["opt_state"])
                state = state.replace(opt_state=opt)
                Log.i("Optimizer state "
                      + ("restored" if ok else
                         "structure mismatch — keeping fresh init"))
            step0 = saved.get("step", 0)
            Log.i(f"Model restored ({frac:.1%} keys) from "
                  f"{args.resume_checkpoint}")

    if args.variant == "baseline":
        train_step = make_baseline_det_step(model, tx)
    elif args.variant == "advtrain":
        train_step = make_advtrain_det_step(model, tx)
    else:
        train_step = make_afan_det_step(model, tx, afan_config_for(args))
    detect_fn = make_detect_fn(model)

    losses = deque(maxlen=100)
    summary_writer = ScalarWriter(os.path.join(args.outputs_dir,
                                               "summaries"))
    step = step0
    t_ckpt = time.time()
    should_stop = False
    while not should_stop:
        for batch in train_loader:
            step_rng = jax.random.fold_in(rng, step)
            xb, bb, lb, vb = shard_batch(
                mesh, jnp.asarray(batch.images), jnp.asarray(batch.boxes),
                jnp.asarray(batch.labels), jnp.asarray(batch.valid))
            state, metrics = train_step(state, xb, bb, lb, vb, step_rng)
            step += 1
            losses.append(float(metrics["loss"]))
            summary_writer.add_scalar("train/loss", losses[-1], step)
            if step == args.num_steps_to_finish:
                should_stop = True
            if step % args.num_steps_to_display == 0:
                dt = time.time() - t_ckpt
                t_ckpt = time.time()
                sps = args.num_steps_to_display / max(dt, 1e-9)
                samples_per_sec = args.batch_size * sps
                eta = (args.num_steps_to_finish - step) / max(sps, 1e-9) / 3600
                Log.i(f"[Step {step}] Avg. Loss = "
                      f"{sum(losses) / len(losses):.6f} "
                      f"({samples_per_sec:.2f} samples/sec; ETA {eta:.1f} hrs)")
            if step % args.num_steps_to_snapshot == 0 or should_stop:
                path = os.path.join(args.outputs_dir, f"model-{step}.pt")
                save_checkpoint(path, {"params": state.params,
                                       "batch_stats": state.batch_stats,
                                       "opt_state": state.opt_state,
                                       "step": step})
                Log.i(f"Model saved to {path}")
            if args.eval_every and step % args.eval_every == 0:
                evaluator = DetectionEvaluator(
                    eval_loader, detect_fn, num_classes,
                    protocol="coco" if args.dataset.startswith("coco")
                    else "voc")
                mean_ap, _ = evaluator.evaluate(state)
                Log.i(f"[Step {step}] mAP = {mean_ap:.4f}")
            if should_stop:
                break

    protocol = "coco" if args.dataset.startswith("coco") else "voc"
    evaluator = DetectionEvaluator(eval_loader, detect_fn, num_classes,
                                   protocol=protocol)
    mean_ap, detail = evaluator.evaluate(state)
    Log.i(f"final mAP = {mean_ap:.4f}\n{detail}")
    return mean_ap


if __name__ == "__main__":
    main()
