"""COCO-protocol bbox AP — a self-contained implementation of the COCOeval
matching and accumulation rules used by the reference
(`Detection/dataset/coco2017.py:160-171` runs pycocotools COCOeval;
pycocotools is unavailable here, so the protocol is implemented directly):

* IoU thresholds 0.50:0.95:0.05 (10 levels);
* per image/class, score-descending greedy matching: each detection takes
  the unmatched gt with highest IoU >= t;
* precision accumulated on the standard 101-point recall grid
  [0:0.01:1], with the monotone precision envelope;
* AP = mean over classes (with >=1 gt) and IoU thresholds; AP50/AP75 are
  the single-threshold slices. Area ranges / maxDets beyond 100 are not
  used by the reference's reporting and are fixed at 'all'/100.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_GRID = np.linspace(0.0, 1.0, 101)
MAX_DETS = 100


def _iou_matrix(d: np.ndarray, g: np.ndarray) -> np.ndarray:
    """Standard (no +1) corner IoU, (D, G)."""
    area_d = (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1])
    area_g = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    lt = np.maximum(d[:, None, :2], g[None, :, :2])
    rb = np.minimum(d[:, None, 2:], g[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_d[:, None] + area_g[None, :] - inter,
                              1e-12)


def _match_image(det_boxes, det_scores, gt_boxes, thresholds):
    """Greedy matching for one (image, class): returns tp flags
    (T, D_sorted) and the sort order."""
    order = np.argsort(-det_scores, kind="stable")[:MAX_DETS]
    d = det_boxes[order]
    tp = np.zeros((len(thresholds), len(d)), bool)
    if len(gt_boxes) == 0 or len(d) == 0:
        return tp, order
    ious = _iou_matrix(d, gt_boxes)
    for ti, t in enumerate(thresholds):
        taken = np.zeros(len(gt_boxes), bool)
        for di in range(len(d)):
            best, best_iou = -1, t
            for gi in range(len(gt_boxes)):
                if taken[gi]:
                    continue
                if ious[di, gi] >= best_iou:
                    best, best_iou = gi, ious[di, gi]
            if best >= 0:
                taken[best] = True
                tp[ti, di] = True
    return tp, order


def coco_bbox_ap(num_classes: int,
                 gt: Dict[str, Tuple[np.ndarray, np.ndarray]],
                 det_image_ids: List[str], det_boxes: np.ndarray,
                 det_classes: np.ndarray, det_probs: np.ndarray
                 ) -> Dict[str, float]:
    """COCO AP over classes 1..num_classes-1.

    ``gt``: image_id → (boxes (G,4) corners, labels (G,)).
    Returns {'AP': ..., 'AP50': ..., 'AP75': ...}.
    """
    det_classes = np.asarray(det_classes)
    det_probs = np.asarray(det_probs)
    det_boxes = np.asarray(det_boxes).reshape(-1, 4)
    det_image_ids = np.asarray(det_image_ids)
    T = len(IOU_THRESHOLDS)
    ap_per_class = []

    for c in range(1, num_classes):
        npos = 0
        scores_all: List[np.ndarray] = []
        tp_all: List[np.ndarray] = []
        class_sel = det_classes == c
        for image_id, (g_boxes, g_labels) in gt.items():
            g = g_boxes[g_labels == c]
            npos += len(g)
            sel = class_sel & (det_image_ids == image_id)
            if not sel.any():
                continue
            d_boxes = det_boxes[sel]
            d_scores = det_probs[sel]
            tp, order = _match_image(d_boxes, d_scores, g, IOU_THRESHOLDS)
            scores_all.append(d_scores[order])
            tp_all.append(tp)
        if npos == 0:
            continue  # COCOeval skips classes absent from gt (score -1)
        if not scores_all:
            ap_per_class.append(np.zeros(T))
            continue
        scores = np.concatenate(scores_all)
        tps = np.concatenate(tp_all, axis=1)
        order = np.argsort(-scores, kind="stable")
        tps = tps[:, order]
        tp_cum = np.cumsum(tps, axis=1)
        fp_cum = np.cumsum(~tps, axis=1)
        rec = tp_cum / npos
        prec = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
        ap_t = np.zeros(T)
        for ti in range(T):
            # monotone envelope + 101-point interpolation (COCOeval
            # accumulate())
            p = prec[ti].copy()
            for i in range(len(p) - 1, 0, -1):
                p[i - 1] = max(p[i - 1], p[i])
            idx = np.searchsorted(rec[ti], RECALL_GRID, side="left")
            vals = np.where(idx < len(p), p[np.minimum(idx, len(p) - 1)],
                            0.0)
            ap_t[ti] = vals.mean()
        ap_per_class.append(ap_t)

    if not ap_per_class:
        return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0}
    aps = np.stack(ap_per_class)  # (C_present, T)
    return {"AP": float(aps.mean()),
            "AP50": float(aps[:, 0].mean()),
            "AP75": float(aps[:, 5].mean())}
