"""TEST-ONLY second implementation of the segmentation metric protocol
(`Segmentation/metrics/stream_metrics.py:56-80`), written directly from
the metric definitions in a deliberately different style from
afan/eval/seg_miou.py: per-pixel python loops with per-class TP/FP/FN
counters, no confusion matrix, no numpy vector math.

Protocol points:
  * pixels whose gt label is outside [0, C) (e.g. the 255 ignore index)
    are dropped entirely — they contribute to no class, not even via
    their prediction;
  * per-class IoU = TP / (TP + FP + FN); UNDEFINED (excluded from Mean
    IoU) when the class appears in neither gt nor prediction (the
    reference's 0/0 -> NaN -> nanmean semantics);
  * per-class accuracy = TP / gt-count; undefined when the class has no
    gt pixels (even if it was predicted) — excluded from Mean Acc;
  * FreqW Acc sums gt-frequency * IoU over classes WITH gt pixels (such
    classes always have a defined IoU);
  * Overall Acc = correct / total over kept pixels.
"""
from __future__ import annotations

import math


def oracle_seg_metrics(scenes, n_classes):
    """scenes: iterable of (gt, pred) 2-D integer arrays (any nesting —
    flattened by python iteration). Returns the reference's result dict
    with math.nan where a metric is undefined."""
    tp = [0] * n_classes
    fp = [0] * n_classes
    fn = [0] * n_classes
    gt_count = [0] * n_classes
    correct = 0
    total = 0
    for gt, pred in scenes:
        flat_gt = [int(v) for row in gt for v in row]
        flat_pr = [int(v) for row in pred for v in row]
        assert len(flat_gt) == len(flat_pr)
        for g, p in zip(flat_gt, flat_pr):
            if g < 0 or g >= n_classes:
                continue
            total += 1
            gt_count[g] += 1
            if g == p:
                correct += 1
                tp[g] += 1
            else:
                fn[g] += 1
                if 0 <= p < n_classes:
                    fp[p] += 1

    iou = []
    for c in range(n_classes):
        denom = tp[c] + fp[c] + fn[c]
        iou.append(tp[c] / denom if denom > 0 else math.nan)
    acc_cls = [tp[c] / gt_count[c] if gt_count[c] > 0 else math.nan
               for c in range(n_classes)]

    def nanmean(vals):
        kept = [v for v in vals if not math.isnan(v)]
        return sum(kept) / len(kept) if kept else math.nan

    fwavacc = sum((gt_count[c] / total) * iou[c]
                  for c in range(n_classes) if gt_count[c] > 0) if total else 0.0
    return {
        "Overall Acc": correct / total if total else math.nan,
        "Mean Acc": nanmean(acc_cls),
        "FreqW Acc": fwavacc,
        "Mean IoU": nanmean(iou),
        "Class IoU": {c: iou[c] for c in range(n_classes)},
    }
