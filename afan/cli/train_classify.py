"""CIFAR training driver: base / ALFA (perturb) / learnable-eta modes.

CLI surface parity with the three reference drivers —
`Classification/main_base.py`, `main_perturb.py`, `main_learnable.py` —
merged into one entry point with ``--mode`` (the reference forks the whole
script per variant). Canonical runs (reference `Classification/cmd/`):

  python -m afan.cli.train_classify --mode base    --seed 3
  python -m afan.cli.train_classify --mode alfa    --gamma 0.5 --steps 5
  python -m afan.cli.train_classify --mode learnable

Outputs mirror the reference: per-epoch train/val/test accuracy, best-on-val
checkpointing (`main_perturb.py:116-136`), result.pkl accuracy curves and
result_norm.pkl perturbation-norm telemetry (`main_perturb.py:138-150`).
"""
from __future__ import annotations

import argparse
import os
import pickle
import time

import jax
import jax.numpy as jnp

from ..data.cifar import (augment_batch_device, cifar10_dataloaders,
                          cifar100_dataloaders)
from ..data.prefetch import Prefetcher
from ..models.resnet_s import ResNetS, LEARNABLE_TAPS
from ..parallel.mesh import (check_divisible, make_mesh, replicate_state,
                             shard_batch)
from ..train.checkpoint import (load_checkpoint, overlap_restore,
                                restore_opt_state, save_checkpoint)
from ..train.loop import (AlfaConfig, LearnableConfig, TrainState,
                          make_alfa_step, make_base_step,
                          make_device_data_alfa_step, make_epoch_scan_alfa,
                          make_eval_step, make_learnable_step)
from ..train.optim import (learnable_tx,
                           multistep_warmup_schedule, sgd)
from ..utils.logging import Log
from ..utils.meters import AverageMeter


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="A-FAN TPU CIFAR training")
    # base settings (`main_perturb.py:27-34`)
    p.add_argument("--mode", choices=["base", "alfa", "learnable"],
                   default="alfa")
    p.add_argument("--data", type=str, default="../data")
    p.add_argument("--dataset", choices=["cifar10", "cifar100"],
                   default="cifar10")
    p.add_argument("--print_freq", default=50, type=int)
    p.add_argument("--seed", default=None, type=int)
    p.add_argument("--gpu", default=None, type=str,
                   help="accepted for reference-script compat; ignored "
                        "(TPU)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save_dir", default="res56s_adv_aug", type=str)
    # optimizer (`main_perturb.py:36-42`)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", default=0.1, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--weight_decay", default=5e-4, type=float)
    p.add_argument("--epochs", default=200, type=int)
    p.add_argument("--decreasing_lr", default="50,150")
    # attack (`main_perturb.py:44-50`)
    p.add_argument("--steps", default=5, type=int)
    p.add_argument("--perturb_idx", default=13, type=int)
    p.add_argument("--gamma", default=1.5, type=float,
                   help="PGD step size, /255 applied internally")
    p.add_argument("--eps", default=2.0, type=float)
    p.add_argument("--randinit", action="store_true")
    p.add_argument("--clip", action="store_true")
    # technique flags beyond the reference (PAPERS.md)
    p.add_argument("--pgd_step_mode", choices=["sign", "grad"],
                   default="sign",
                   help="'grad' = normalized raw-gradient steps "
                        "(arxiv 2312.01260)")
    p.add_argument("--pgd_random_steps", action="store_true",
                   help="per-step random step size in (0, 2*gamma) "
                        "(WITCHcraft, arxiv 1911.07989)")
    # ETA (`main_learnable.py:52-55`)
    p.add_argument("--w_lr", default=0.01, type=float)
    p.add_argument("--init_weight", default=1.0 / 9, type=float)
    p.add_argument("--l1_coef", default=1.0, type=float)
    # TPU-era additions
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute dtype (recommended on TPU)")
    p.add_argument("--num_devices", type=int, default=None,
                   help="data-parallel devices (default: all)")
    p.add_argument("--limit_batches", type=int, default=0,
                   help="debug: cap batches per epoch")
    p.add_argument("--synthetic_ok", action="store_true", default=True)
    p.add_argument("--host_aug", action="store_true",
                   help="augment on the host (numpy) instead of on-device; "
                        "device augmentation is distribution-identical and "
                        "default (a slow host otherwise gates the TPU)")
    p.add_argument("--device_data", action="store_true",
                   help="keep the whole train split resident in HBM and "
                        "fuse gather+augment+step into one program "
                        "(alfa mode, single device) — removes the host "
                        "from the training loop entirely")
    p.add_argument("--epoch_scan", action="store_true",
                   help="lax.scan the WHOLE epoch into one dispatch "
                        "(implies --device_data; alfa mode) — eliminates "
                        "per-step dispatch latency")
    return p


def build_model(args):
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    classes = 100 if args.dataset == "cifar100" else 10
    init_w = args.init_weight if args.mode == "learnable" else 1.0
    return ResNetS(num_blocks=(9, 9, 9), num_classes=classes,
                   init_weight=init_w, dtype=dtype)


def build_tx(args, steps_per_epoch: int):
    milestones = [int(e) * steps_per_epoch
                  for e in args.decreasing_lr.split(",")]
    schedule = multistep_warmup_schedule(
        args.lr, milestones, 0.1, warmup_steps=steps_per_epoch)
    if args.mode == "learnable":
        return learnable_tx(schedule, args.w_lr, args.momentum,
                            args.weight_decay)
    return sgd(schedule, args.momentum, args.weight_decay)


def _ckpt_payload(state, epoch, best_prec1):
    """Full-fidelity checkpoint: params + batch_stats + OPTIMIZER state,
    matching `Classification/main_perturb.py:116-136` (the reference
    persists the optimizer so resume keeps SGD momentum)."""
    return {"epoch": epoch, "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": int(state.step), "best_prec1": best_prec1}


def validate(eval_step, state, loader, mesh):
    correct, count = 0, 0
    for x, y in loader:
        # eval batches may be ragged; pad to batch then mask via count
        out = eval_step(state, jnp.asarray(x), jnp.asarray(y))
        correct += int(out["correct"])
        count += int(out["count"])
    return 100.0 * correct / max(count, 1)


def main(argv=None):
    args = get_parser().parse_args(argv)
    Log.initialize()
    Log.i(f"args: {vars(args)}")
    os.makedirs(args.save_dir, exist_ok=True)

    seed = args.seed if args.seed is not None else 0
    loaders = (cifar10_dataloaders if args.dataset == "cifar10"
               else cifar100_dataloaders)
    train_loader, val_loader, test_loader = loaders(
        args.batch_size, args.batch_size, data_dir=args.data, seed=seed)
    device_aug = not args.host_aug and args.dataset == "cifar10"
    if device_aug:
        # raw uint8 from the host; crop+flip runs jitted on-device
        train_loader.raw = True
        aug_fn = jax.jit(augment_batch_device)

    steps_per_epoch = len(train_loader)
    if args.limit_batches:
        steps_per_epoch = min(steps_per_epoch, args.limit_batches)

    model = build_model(args)
    tx = build_tx(args, steps_per_epoch)

    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(rng, dummy, 0, None, False)
    state = TrainState.create(variables, tx)

    mesh = make_mesh(args.num_devices)
    check_divisible(args.batch_size, mesh)
    state = replicate_state(mesh, state)
    Log.i(f"data-parallel over {mesh.size} device(s): {mesh.devices.ravel()}")

    device_data = ((args.device_data or args.epoch_scan)
                   and args.mode == "alfa" and mesh.size == 1)
    if args.mode == "base":
        train_step = make_base_step(model, tx)
    elif args.mode == "alfa":
        cfg = AlfaConfig(tap=args.perturb_idx, steps=args.steps,
                         gamma=args.gamma / 255, eps=args.eps / 255,
                         randinit=args.randinit, clip=args.clip,
                         step_mode=args.pgd_step_mode,
                         random_steps=args.pgd_random_steps)
        if device_data and args.epoch_scan:
            train_step = None  # whole-epoch program built below
        elif device_data:
            train_step = make_device_data_alfa_step(model, tx, cfg,
                                                    args.batch_size)
        else:
            train_step = make_alfa_step(model, tx, cfg)
    else:
        cfg = LearnableConfig(taps=LEARNABLE_TAPS, steps=args.steps,
                              gamma=args.gamma / 255, eps=args.eps / 255,
                              randinit=args.randinit, clip=args.clip,
                              l1_coef=args.l1_coef)
        train_step = make_learnable_step(model, tx, cfg)
    eval_step = make_eval_step(model)

    start_epoch, best_prec1 = 0, 0.0
    ckpt_path = os.path.join(args.save_dir, "checkpoint.pt")
    if args.resume:
        saved = load_checkpoint(ckpt_path)
        if saved:
            params, frac = overlap_restore(state.params, saved["params"])
            stats, fs = overlap_restore(state.batch_stats,
                                        saved["batch_stats"])
            Log.i(f"resume: restored {frac:.1%} of params, {fs:.1%} of "
                  f"batch_stats from {ckpt_path}")
            state = state.replace(params=params, batch_stats=stats,
                                  step=jnp.asarray(saved["step"]))
            if "opt_state" in saved:
                opt, ok = restore_opt_state(state.opt_state,
                                            saved["opt_state"])
                state = state.replace(opt_state=opt)
                Log.i("resume: optimizer state "
                      + ("restored" if ok else
                         "structure mismatch — keeping fresh init"))
            start_epoch = saved.get("epoch", 0)
            best_prec1 = saved.get("best_prec1", 0.0)

    all_result = {"train": [], "ta": [], "test_ta": []}
    all_norm = {"l2": {}, "linf": {}}

    if device_data:
        data_x = jax.device_put(jnp.asarray(train_loader.x))
        data_y = jax.device_put(jnp.asarray(train_loader.y))
        Log.i(f"device-resident dataset: {data_x.nbytes / 1e6:.0f} MB in HBM")
        if args.epoch_scan:
            epoch_fn = make_epoch_scan_alfa(model, tx, cfg, args.batch_size,
                                            steps_per_epoch)

    for epoch in range(start_epoch, args.epochs):
        losses, top1 = AverageMeter(), AverageMeter()
        norm_l2, norm_linf = AverageMeter(), AverageMeter()
        t0, seen = time.time(), 0
        if device_data and args.epoch_scan:
            n = len(train_loader.x)
            perm = jax.random.permutation(
                jax.random.fold_in(rng, 7000 + epoch), n)
            state, em = epoch_fn(state, data_x, data_y, perm,
                                 jax.random.fold_in(rng, 9000 + epoch))
            loss_tail = float(em["loss"][-1])
            seen = steps_per_epoch * args.batch_size
            dt = time.time() - t0
            Log.i(f"Epoch: [{epoch}] whole-epoch scan, last-step loss "
                  f"{loss_tail:.4f}")
            Log.i(f"epoch {epoch}: {seen / max(dt, 1e-9):.1f} imgs/sec")
            losses.update(float(jnp.mean(em["loss"])), seen)
            top1.update(float(jnp.mean(em["accuracy"])), seen)
            all_norm["l2"][epoch + 1] = float(jnp.mean(em["pert_l2"]))
            all_norm["linf"][epoch + 1] = float(jnp.mean(em["pert_linf"]))
            tacc = validate(eval_step, state, val_loader, mesh)
            test_tacc = validate(eval_step, state, test_loader, mesh)
            Log.i(f"epoch {epoch}: val {tacc:.2f} test {test_tacc:.2f}")
            all_result["train"].append(top1.avg)
            all_result["ta"].append(tacc)
            all_result["test_ta"].append(test_tacc)
            is_best = tacc > best_prec1
            best_prec1 = max(tacc, best_prec1)
            payload = _ckpt_payload(state, epoch + 1, best_prec1)
            save_checkpoint(ckpt_path, payload)
            if is_best:
                save_checkpoint(os.path.join(args.save_dir,
                                             "best_model.pt"), payload)
            _dump_results(args.save_dir, all_result, all_norm)
            continue
        if device_data:
            n = len(train_loader.x)
            perm = jax.random.permutation(
                jax.random.fold_in(rng, 7000 + epoch), n)
            for i in range(steps_per_epoch):
                step_rng = jax.random.fold_in(
                    rng, epoch * steps_per_epoch + i)
                state, metrics = train_step(state, data_x, data_y, perm, i,
                                            step_rng)
                seen += args.batch_size
                if i % args.print_freq == 0:
                    losses.update(float(metrics["loss"]), args.batch_size)
                    top1.update(float(metrics["accuracy"]), args.batch_size)
                    norm_l2.update(float(jnp.mean(metrics["pert_l2"])))
                    norm_linf.update(float(jnp.mean(metrics["pert_linf"])))
                    Log.i(f"Epoch: [{epoch}][{i}/{steps_per_epoch}] "
                          f"Loss {losses.val:.4f} ({losses.avg:.4f}) "
                          f"Acc {top1.val:.3f} ({top1.avg:.3f})")
            _ = float(metrics["loss"])  # sync for honest epoch timing
            dt = time.time() - t0
            Log.i(f"epoch {epoch}: {seen / max(dt, 1e-9):.1f} imgs/sec")
            all_norm["l2"][epoch + 1] = norm_l2.avg
            all_norm["linf"][epoch + 1] = norm_linf.avg
            tacc = validate(eval_step, state, val_loader, mesh)
            test_tacc = validate(eval_step, state, test_loader, mesh)
            Log.i(f"epoch {epoch}: val {tacc:.2f} test {test_tacc:.2f}")
            all_result["train"].append(top1.avg)
            all_result["ta"].append(tacc)
            all_result["test_ta"].append(test_tacc)
            is_best = tacc > best_prec1
            best_prec1 = max(tacc, best_prec1)
            payload = _ckpt_payload(state, epoch + 1, best_prec1)
            save_checkpoint(ckpt_path, payload)
            if is_best:
                save_checkpoint(os.path.join(args.save_dir, "best_model.pt"),
                                payload)
            _dump_results(args.save_dir, all_result, all_norm)
            continue
        for i, (x, y) in enumerate(Prefetcher(train_loader)):
            if args.limit_batches and i >= args.limit_batches:
                break
            step_rng = jax.random.fold_in(rng, epoch * steps_per_epoch + i)
            if device_aug:
                x = aug_fn(jax.random.fold_in(step_rng, 999),
                           jnp.asarray(x))
            xb, yb = shard_batch(mesh, jnp.asarray(x), jnp.asarray(y))
            if args.mode == "base":
                state, metrics = train_step(state, xb, yb)
            else:
                state, metrics = train_step(state, xb, yb, step_rng)
            seen += x.shape[0]
            if i % args.print_freq == 0:
                losses.update(float(metrics["loss"]), x.shape[0])
                top1.update(float(metrics["accuracy"]), x.shape[0])
                if "pert_l2" in metrics:
                    norm_l2.update(float(jnp.mean(metrics["pert_l2"])))
                    norm_linf.update(float(jnp.mean(metrics["pert_linf"])))
                Log.i(f"Epoch: [{epoch}][{i}/{steps_per_epoch}] "
                      f"Loss {losses.val:.4f} ({losses.avg:.4f}) "
                      f"Acc {top1.val:.3f} ({top1.avg:.3f})")
        jax.block_until_ready(state.params)
        dt = time.time() - t0
        Log.i(f"epoch {epoch}: {seen / max(dt, 1e-9):.1f} imgs/sec")
        if args.mode != "base":
            all_norm["l2"][epoch + 1] = norm_l2.avg
            all_norm["linf"][epoch + 1] = norm_linf.avg

        tacc = validate(eval_step, state, val_loader, mesh)
        test_tacc = validate(eval_step, state, test_loader, mesh)
        Log.i(f"epoch {epoch}: val {tacc:.2f} test {test_tacc:.2f}")
        all_result["train"].append(top1.avg)
        all_result["ta"].append(tacc)
        all_result["test_ta"].append(test_tacc)

        is_best = tacc > best_prec1
        best_prec1 = max(tacc, best_prec1)
        payload = _ckpt_payload(state, epoch + 1, best_prec1)
        save_checkpoint(ckpt_path, payload)
        if is_best:
            save_checkpoint(os.path.join(args.save_dir, "best_model.pt"),
                            payload)
        _dump_results(args.save_dir, all_result, all_norm)

    Log.i(f"done; best val accuracy {best_prec1:.2f}")
    return best_prec1


def _dump_results(save_dir, all_result, all_norm):
    """result.pkl + result_norm.pkl (`main_perturb.py:138-150` dumps)."""
    with open(os.path.join(save_dir, "result.pkl"), "wb") as f:
        pickle.dump(all_result, f)
    with open(os.path.join(save_dir, "result_norm.pkl"), "wb") as f:
        pickle.dump(all_norm, f)


if __name__ == "__main__":
    main()
