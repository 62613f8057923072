"""Classification inference — port of `Classification/main_inference.py`:
load a checkpoint, report test-set top-1 (acceptance value: the reference's
pretrained A-FAN ResNet-56s scores 94.82% SA, `README.md:46`)."""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ..data.cifar import cifar10_dataloaders, cifar100_dataloaders
from ..models.resnet_s import resnet56
from ..train.checkpoint import load_checkpoint, overlap_restore
from ..train.loop import TrainState, make_eval_step
from ..train.optim import sgd
from ..utils.logging import Log


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default="../data")
    p.add_argument("--dataset", choices=["cifar10", "cifar100"],
                   default="cifar10")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0,
                   help="data seed (synthetic fallback regenerates its "
                        "class templates from this)")
    p.add_argument("--pretrained", type=str, required=True,
                   help="checkpoint path (checkpoint.pt / best_model.pt)")
    p.add_argument("--pgd", action="store_true",
                   help="report robust accuracy under input PGD instead "
                        "of clean accuracy")
    p.add_argument("--pgd_steps", type=int, default=3)
    p.add_argument("--pgd_gamma", type=float, default=2.0)
    p.add_argument("--pgd_eps", type=float, default=8.0)
    args = p.parse_args(argv)
    Log.initialize()

    loaders = (cifar10_dataloaders if args.dataset == "cifar10"
               else cifar100_dataloaders)
    _, _, test_loader = loaders(args.batch_size, args.batch_size,
                                data_dir=args.data, seed=args.seed)
    model = resnet56()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 32, 32, 3)), 0, None, False)
    tx = sgd(lambda c: 0.0)
    state = TrainState.create(variables, tx)
    import os
    if not os.path.exists(args.pretrained):
        raise FileNotFoundError(args.pretrained)
    try:
        saved = load_checkpoint(args.pretrained)
        if not isinstance(saved, dict) or "params" not in saved:
            saved = None
    except Exception:
        saved = None  # not a native pickle — try the torch converter
    if saved is None:
        # reference torch checkpoint (`cmd/run_test.sh` pretrained model)
        from ..interop.torch_ckpt import load_torch_resnet_s
        tparams, tstats, tfrac = load_torch_resnet_s(args.pretrained)
        saved = {"params": tparams, "batch_stats": tstats}
        Log.i(f"torch checkpoint converted ({tfrac:.1%} keys) from "
              f"{args.pretrained}")
    params, frac = overlap_restore(state.params, saved["params"])
    stats, fs = overlap_restore(state.batch_stats,
                                saved.get("batch_stats",
                                          state.batch_stats))
    state = state.replace(params=params, batch_stats=stats)
    Log.i(f"loaded {frac:.1%} of params, {fs:.1%} of batch_stats "
          f"from {args.pretrained}")

    if args.pgd:
        from ..eval.robustness import make_robust_eval_step
        rob_step = make_robust_eval_step(
            model, 10, steps=args.pgd_steps, gamma=args.pgd_gamma / 255,
            eps=args.pgd_eps / 255)
        rng = jax.random.PRNGKey(0)
        correct = count = 0
        for i, (x, y) in enumerate(test_loader):
            out = rob_step(state, jnp.asarray(x), jnp.asarray(y),
                           jax.random.fold_in(rng, i))
            correct += int(out["correct"])
            count += int(out["count"])
        acc = 100.0 * correct / max(count, 1)
        Log.i(f"robust accuracy (PGD-{args.pgd_steps}): {acc:.2f}% "
              f"({correct}/{count})")
        return acc

    eval_step = make_eval_step(model)
    correct = count = 0
    for x, y in test_loader:
        out = eval_step(state, jnp.asarray(x), jnp.asarray(y))
        correct += int(out["correct"])
        count += int(out["count"])
    acc = 100.0 * correct / max(count, 1)
    Log.i(f"test accuracy: {acc:.2f}% ({correct}/{count})")
    return acc


if __name__ == "__main__":
    main()
