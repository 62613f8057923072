"""TEST-ONLY second implementation of the PASCAL VOC detection AP
protocol, written directly from the spec (the canonical voc_eval
algorithm the reference vendors at `Detection/voc_eval.py`), in a
deliberately different style from afan/eval/det_map.py: per-detection
dict bookkeeping, no vectorized IoU, explicit 11-point / continuous AP
loops.

Protocol points:
  * per-class matching over ALL images, detections ranked by confidence
    descending; each det matches the gt of max IoU in its image;
  * legacy +1-pixel box areas; a match requires IoU STRICTLY > thresh;
  * difficult gt are neutral: a det matched to one is neither TP nor FP
    and does not consume the gt;
  * a second det on an already-consumed gt is a FP;
  * npos counts non-difficult gt only;
  * AP: VOC07 11-point interpolation, or the continuous
    precision-envelope area (both from the spec).

NOTE on ties: the canonical ranking uses an UNSTABLE descending sort,
so score ties are implementation-defined — cross-checks must use
distinct scores.
"""
from __future__ import annotations

import numpy as np


def _iou_plus1(a, b):
    ix = min(a[2], b[2]) - max(a[0], b[0]) + 1.0
    iy = min(a[3], b[3]) - max(a[1], b[1]) + 1.0
    inter = max(ix, 0.0) * max(iy, 0.0)
    area_a = (a[2] - a[0] + 1.0) * (a[3] - a[1] + 1.0)
    area_b = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0)
    return inter / (area_a + area_b - inter)


def _ap_07(pairs):
    """pairs: list of (recall, precision) points in rank order.

    The grid is the canonical ``np.arange(0, 1.1, 0.1)`` — its float
    fuzz (e.g. 0.30000000000000004) decides exact-recall boundary cases
    and is part of the de-facto protocol."""
    ap = 0.0
    for t in np.arange(0.0, 1.1, 0.1):
        best = 0.0
        for r, p in pairs:
            if r >= t and p > best:
                best = p
        ap += best / 11.0
    return ap


def _ap_continuous(pairs):
    rec = [0.0] + [r for r, _ in pairs] + [1.0]
    pre = [0.0] + [p for _, p in pairs] + [0.0]
    for i in range(len(pre) - 2, -1, -1):
        pre[i] = max(pre[i], pre[i + 1])
    ap = 0.0
    for i in range(1, len(rec)):
        if rec[i] != rec[i - 1]:
            ap += (rec[i] - rec[i - 1]) * pre[i]
    return ap


def oracle_voc_map(num_classes, gt, det_image_ids, det_boxes,
                   det_classes, det_probs, ovthresh=0.5,
                   use_07_metric=True):
    """Same signature/result as det_map.evaluate_detections:
    (mAP, {class: AP}). ``gt``: image_id -> (boxes, labels, difficult)."""
    det_boxes = np.asarray(det_boxes, float).reshape(-1, 4)
    det_probs = np.asarray(det_probs, float)
    det_classes = np.asarray(det_classes)
    aps = {}
    for c in range(1, num_classes):
        # per-image gt records for this class
        recs = {}
        npos = 0
        for img, (b, l, diff) in gt.items():
            b = np.asarray(b, float).reshape(-1, 4)
            l = np.asarray(l)
            diff = np.asarray(diff, bool)
            entries = []
            for bb, dd in zip(b[l == c], diff[l == c]):
                entries.append({"box": bb.tolist(), "difficult": bool(dd),
                                "used": False})
                if not dd:
                    npos += 1
            recs[img] = entries
        dets = [(float(det_probs[i]), det_image_ids[i],
                 det_boxes[i].tolist())
                for i in range(len(det_probs)) if det_classes[i] == c]
        if not dets:
            aps[c] = 0.0
            continue
        dets.sort(key=lambda d: -d[0])
        tp = fp = 0
        pairs = []
        for score, img, box in dets:
            best, best_iou = None, -1.0
            for g in recs.get(img, []):
                v = _iou_plus1(box, g["box"])
                if v > best_iou:
                    best, best_iou = g, v
            if best is not None and best_iou > ovthresh:
                if best["difficult"]:
                    pass                      # neutral
                elif not best["used"]:
                    best["used"] = True
                    tp += 1
                else:
                    fp += 1
            else:
                fp += 1
            pairs.append((tp / max(npos, 1),
                          tp / max(tp + fp, 1e-300)))
        aps[c] = (_ap_07(pairs) if use_07_metric
                  else _ap_continuous(pairs))
    mean_ap = float(np.mean(list(aps.values()))) if aps else 0.0
    return mean_ap, aps
