"""TEST-ONLY second implementation of the COCO bbox evaluation protocol.

Written directly from the COCOeval algorithm (the matching/accumulation
procedure pycocotools' cocoeval.py documents and the reference runs at
`Detection/dataset/coco2017.py:160-171`), deliberately in a DIFFERENT
style from afan/eval/coco_map.py: per-annotation dicts with explicit
dtm/gtm id bookkeeping, matching evaluated per (image, category) exactly
once at the largest maxDets, accumulation over the global T x K x R x A
x M precision/recall arrays with -1 sentinels, and summary means taken
over every valid (t, r, k) cell — so a matching-order or accumulation
bug in one implementation is very unlikely to be mirrored here.

Protocol points implemented (all from the spec):
  * gt ignore = outside area range OR iscrowd; gt sorted ignore-last;
  * dt sorted score-descending (stable), truncated per (image, category)
    to maxDets[-1]=100 BEFORE matching; smaller maxDets are slices of
    that matching in accumulate;
  * greedy match in det-score order: best IoU >= threshold among gts not
    yet taken (crowd gts may be matched repeatedly), stopping at ignored
    gts once a valid match is held;
  * crowd IoU = intersection / det area (maskUtils.iou iscrowd=1);
  * unmatched dets whose area is outside the range are ignored;
  * 101-point interpolated precision with the monotone envelope,
    searchsorted(recall, grid, side='left'), zeros past the last det;
  * categories with zero non-ignored gt contribute -1 (excluded from
    the summary means).
"""
from __future__ import annotations

import numpy as np

IOU_THRS = np.arange(0.5, 1.0, 0.05)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAXDETS = (1, 10, 100)
AREAS = (("all", 0.0, 1e10), ("small", 0.0, 32.0 ** 2),
         ("medium", 32.0 ** 2, 96.0 ** 2), ("large", 96.0 ** 2, 1e10))


def _box_area(b):
    return max(b[2] - b[0], 0.0) * max(b[3] - b[1], 0.0)


def _iou_one(d, g, crowd):
    ix = min(d[2], g[2]) - max(d[0], g[0])
    iy = min(d[3], g[3]) - max(d[1], g[1])
    inter = max(ix, 0.0) * max(iy, 0.0)
    union = _box_area(d) if crowd else (
        _box_area(d) + _box_area(g) - inter)
    return inter / union if union > 0 else 0.0


def _evaluate_img(dts, gts, area_rng, max_det):
    """dts: list of {'score','box','id'}; gts: list of
    {'box','id','iscrowd'}. Returns the evaluateImg record."""
    lo, hi = area_rng
    for g in gts:
        a = _box_area(g["box"])
        g["_ignore"] = 1 if (g["iscrowd"] or a < lo or a > hi) else 0
    gt = sorted(gts, key=lambda g: g["_ignore"])
    dt = sorted(dts, key=lambda d: -d["score"])[:max_det]
    T, D, G = len(IOU_THRS), len(dt), len(gt)
    dtm = np.zeros((T, D), np.int64)
    gtm = np.zeros((T, G), np.int64)
    dt_ig = np.zeros((T, D), bool)
    gt_ig = np.array([g["_ignore"] for g in gt], bool)
    ious = np.array([[_iou_one(d["box"], g["box"], g["iscrowd"])
                      for g in gt] for d in dt]).reshape(D, G)
    for ti, t in enumerate(IOU_THRS):
        for di, d in enumerate(dt):
            best_iou = min(t, 1 - 1e-10)
            m = -1
            for gi, g in enumerate(gt):
                if gtm[ti, gi] > 0 and not g["iscrowd"]:
                    continue
                if m > -1 and gt_ig[m] == 0 and gt_ig[gi] == 1:
                    break
                if ious[di, gi] < best_iou:
                    continue
                best_iou = ious[di, gi]
                m = gi
            if m == -1:
                continue
            dt_ig[ti, di] = gt_ig[m]
            dtm[ti, di] = gt[m]["id"]
            gtm[ti, m] = d["id"]
    a_out = np.array([_box_area(d["box"]) < lo or _box_area(d["box"]) > hi
                      for d in dt], bool)
    dt_ig = dt_ig | ((dtm == 0) & a_out[None, :])
    return {"dtm": dtm, "dt_ig": dt_ig,
            "scores": np.array([d["score"] for d in dt]),
            "gt_ig": gt_ig}


def oracle_coco_summary(num_classes, gt, det_image_ids, det_boxes,
                        det_classes, det_probs, crowd=None):
    """Same signature/result keys as afan.eval.coco_map.coco_eval_summary."""
    det_boxes = np.asarray(det_boxes, float).reshape(-1, 4)
    det_probs = np.asarray(det_probs, float)
    det_classes = np.asarray(det_classes)
    det_image_ids = list(det_image_ids)
    image_ids = list(gt.keys())
    cats = list(range(1, num_classes))
    T, R = len(IOU_THRS), len(REC_THRS)
    K, A, M = len(cats), len(AREAS), len(MAXDETS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))

    # per-annotation dicts with GLOBAL nonzero ids (the spec's dtm/gtm
    # bookkeeping requires id 0 to mean "unmatched")
    next_id = [1]

    def _take_id():
        next_id[0] += 1
        return next_id[0] - 1

    gt_store = {}   # (img, cat) -> list of gt dicts
    for img in image_ids:
        boxes, labels = gt[img]
        boxes = np.asarray(boxes, float).reshape(-1, 4)
        labels = np.asarray(labels)
        for b, c in zip(boxes, labels):
            gt_store.setdefault((img, int(c)), []).append(
                {"box": b.tolist(), "id": _take_id(), "iscrowd": 0})
        if crowd is not None and img in crowd:
            cb, cl = crowd[img]
            cb = np.asarray(cb, float).reshape(-1, 4)
            for b, c in zip(cb, np.asarray(cl)):
                gt_store.setdefault((img, int(c)), []).append(
                    {"box": b.tolist(), "id": _take_id(), "iscrowd": 1})
    dt_store = {}
    for i, img in enumerate(det_image_ids):
        dt_store.setdefault((img, int(det_classes[i])), []).append(
            {"box": det_boxes[i].tolist(), "score": float(det_probs[i]),
             "id": _take_id()})

    for ki, cat in enumerate(cats):
        for ai, (_, lo, hi) in enumerate(AREAS):
            evals = []
            for img in image_ids:
                gts = [dict(g) for g in gt_store.get((img, cat), [])]
                dts = [dict(d) for d in dt_store.get((img, cat), [])]
                evals.append(_evaluate_img(dts, gts, (lo, hi),
                                           MAXDETS[-1]))
            for mi, max_det in enumerate(MAXDETS):
                scores = np.concatenate(
                    [e["scores"][:max_det] for e in evals])
                order = np.argsort(-scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtm"][:, :max_det] for e in evals], 1)[:, order]
                dt_ig = np.concatenate(
                    [e["dt_ig"][:, :max_det] for e in evals], 1)[:, order]
                gt_ig = np.concatenate([e["gt_ig"] for e in evals])
                npig = int((~gt_ig).sum())
                if npig == 0:
                    continue
                tps = (dtm != 0) & ~dt_ig
                fps = (dtm == 0) & ~dt_ig
                tp_sum = np.cumsum(tps, 1).astype(float)
                fp_sum = np.cumsum(fps, 1).astype(float)
                for ti in range(T):
                    tp, fp = tp_sum[ti], fp_sum[ti]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    recall[ti, ki, ai, mi] = rc[-1] if nd else 0.0
                    q = np.zeros(R)
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds):
                        if pi < nd:
                            q[ri] = pr[pi]
                    precision[ti, :, ki, ai, mi] = q

    def _summ(ap, iou, area, max_det):
        ai = [i for i, a in enumerate(AREAS) if a[0] == area][0]
        mi = MAXDETS.index(max_det)
        if ap:
            s = precision[:, :, :, ai, mi]
            if iou is not None:
                ti = int(np.argmin(np.abs(IOU_THRS - iou)))
                s = s[ti:ti + 1]
        else:
            s = recall[:, :, ai, mi]
            if iou is not None:
                ti = int(np.argmin(np.abs(IOU_THRS - iou)))
                s = s[ti:ti + 1]
        valid = s[s > -1]
        return float(valid.mean()) if valid.size else -1.0

    return {
        "AP": _summ(True, None, "all", 100),
        "AP50": _summ(True, 0.5, "all", 100),
        "AP75": _summ(True, 0.75, "all", 100),
        "APs": _summ(True, None, "small", 100),
        "APm": _summ(True, None, "medium", 100),
        "APl": _summ(True, None, "large", 100),
        "AR1": _summ(False, None, "all", 1),
        "AR10": _summ(False, None, "all", 10),
        "AR100": _summ(False, None, "all", 100),
        "ARs": _summ(False, None, "small", 100),
        "ARm": _summ(False, None, "medium", 100),
        "ARl": _summ(False, None, "large", 100),
    }
