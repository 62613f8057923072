"""Result plotting + best-epoch picker — ports of `Classification/plot.py`
(perturbation-norm curves; its `plt.legned()` typo fixed) and
`Classification/show.py` (best-epoch accuracy picker from result.pkl).
"""
from __future__ import annotations

import argparse
import os
import pickle


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("save_dir", help="trainer save_dir with result*.pkl")
    p.add_argument("--out", default=None, help="plot output path (png)")
    args = p.parse_args(argv)

    result_path = os.path.join(args.save_dir, "result.pkl")
    with open(result_path, "rb") as f:
        result = pickle.load(f)
    ta = result.get("ta", [])
    test_ta = result.get("test_ta", [])
    if ta:
        best = max(range(len(ta)), key=lambda i: ta[i])
        print(f"best epoch {best + 1}: val {ta[best]:.2f}"
              + (f", test {test_ta[best]:.2f}" if best < len(test_ta)
                 else ""))

    norm_path = os.path.join(args.save_dir, "result_norm.pkl")
    norms = None
    if os.path.exists(norm_path):
        with open(norm_path, "rb") as f:
            norms = pickle.load(f)

    out = args.out or os.path.join(args.save_dir, "curves.png")
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 2 if norms and norms.get("l2") else 1,
                             figsize=(10, 4))
    ax0 = axes[0] if hasattr(axes, "__len__") else axes
    ax0.plot(result.get("train", []), label="train_acc")
    ax0.plot(ta, label="TA")
    ax0.plot(test_ta, label="test_TA")
    ax0.set_xlabel("epoch")
    ax0.legend()
    if norms and norms.get("l2"):
        epochs = sorted(norms["l2"])
        axes[1].plot(epochs, [norms["l2"][e] for e in epochs], label="L2")
        axes[1].plot(epochs, [norms["linf"][e] for e in epochs],
                     label="Linf")
        axes[1].set_xlabel("epoch")
        axes[1].set_title("perturbation norms")
        axes[1].legend()
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
