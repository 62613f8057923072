"""Streaming segmentation metrics — port of
`Segmentation/metrics/stream_metrics.py`: running confusion matrix with
Overall Acc, Mean Acc, FreqW Acc, Mean IoU, and per-class IoU (`:56-80`).

The confusion-matrix update is exposed both as numpy (host accumulation,
like the reference) and as a jit-friendly jnp function so eval can run
fully on device and transfer one (C, C) matrix per batch.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


class StreamSegMetrics:
    def __init__(self, n_classes: int):
        self.n_classes = n_classes
        self.confusion_matrix = np.zeros((n_classes, n_classes),
                                         dtype=np.int64)

    def update(self, label_trues: np.ndarray, label_preds: np.ndarray):
        for lt, lp in zip(label_trues, label_preds):
            self.confusion_matrix += self._fast_hist(lt.flatten(),
                                                     lp.flatten())

    def update_hist(self, hist: np.ndarray):
        """Add a precomputed confusion matrix (device-side path)."""
        self.confusion_matrix += np.asarray(hist, dtype=np.int64)

    def _fast_hist(self, label_true, label_pred):
        mask = (label_true >= 0) & (label_true < self.n_classes)
        hist = np.bincount(
            self.n_classes * label_true[mask].astype(int) + label_pred[mask],
            minlength=self.n_classes ** 2,
        ).reshape(self.n_classes, self.n_classes)
        return hist

    def get_results(self) -> Dict:
        """`stream_metrics.py:56-80` verbatim math.

        NaN semantics are load-bearing: a class absent from BOTH gt and
        predictions divides 0/0 -> NaN, and ``np.nanmean`` then EXCLUDES
        it from Mean IoU / Mean Acc (the reference's behavior). Guarding
        the denominator would instead count such classes as 0 and deflate
        both means whenever a class never appears (small val subsets,
        early training). The same applies to the GLOBAL sum: a stream
        whose every pixel is ignored has an empty hist, and Overall Acc
        divides 0/0 -> NaN in the reference too (found by the round-5
        100-stream oracle sweep — a max(.,1) guard here returned 0.0
        instead). FreqW Acc is the one exception: ``freq`` goes all-NaN
        but ``freq > 0`` is all-False (NaN compares False), so its
        masked sum is EMPTY and yields 0.0 — in the reference and here
        alike. Cross-checked against an independent
        oracle in tests/seg_oracle.py.
        """
        hist = self.confusion_matrix.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(hist).sum() / hist.sum()
            acc_cls = np.diag(hist) / hist.sum(axis=1)
            acc_cls = np.nanmean(acc_cls)
            iu = np.diag(hist) / (
                hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
            mean_iu = np.nanmean(iu)
            freq = hist.sum(axis=1) / hist.sum()
            fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
        cls_iu = dict(zip(range(self.n_classes), iu))
        return {
            "Overall Acc": float(acc),
            "Mean Acc": float(acc_cls),
            "FreqW Acc": float(fwavacc),
            "Mean IoU": float(mean_iu),
            "Class IoU": cls_iu,
        }

    def reset(self):
        self.confusion_matrix = np.zeros((self.n_classes, self.n_classes),
                                         dtype=np.int64)

    @staticmethod
    def to_str(results: Dict) -> str:
        string = "\n"
        for k, v in results.items():
            if k != "Class IoU":
                string += f"{k}: {v:f}\n"
        return string


def confusion_matrix_jnp(labels, preds, n_classes: int):
    """Device-side confusion matrix for one batch (labels may contain the
    ignore index 255 — masked out like ``_fast_hist``)."""
    import jax.numpy as jnp
    lt = labels.reshape(-1)
    lp = preds.reshape(-1)
    mask = (lt >= 0) & (lt < n_classes)
    idx = jnp.where(mask, n_classes * lt + lp, n_classes * n_classes)
    hist = jnp.bincount(idx, length=n_classes * n_classes + 1)
    return hist[:-1].reshape(n_classes, n_classes)
