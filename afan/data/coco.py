"""COCO 2017 detection pipeline — port of `Detection/dataset/coco2017.py`
and its subset variants (`coco2017_person.py`, `coco2017_car.py`,
`coco2017_animal.py`, plus VOC's `voc2007_cat_dog.py` analog).

Conventions preserved from the reference:
* the 92-entry background-indexed label map (91 COCO category slots incl.
  the unused 'street sign'-style ids, `coco2017.py:39-59`) — raw COCO
  category_id maps 1:1 onto the label index;
* crowd annotations excluded from training targets (the reference drops
  them when building its annotation dict) but kept on the sample as
  crowd_boxes/crowd_labels, because COCOeval treats iscrowd gt as ignore
  regions at eval time (`coco2017.py:160-171` → pycocotools semantics);
* train-time random horizontal flip with box flip (`coco2017.py:150-153`);
* COCO recipe geometry (min/max side 800/1333) comes from the run scripts.

pycocotools is unavailable in this environment (zero egress), so
annotation ingest is a plain-json parse and evaluation uses our
self-contained COCO-protocol AP in :mod:`afan.eval.coco_map` — the same
matching rules and 101-point AP as COCOeval.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .voc_det import DetSample, DetectionLoader, synthetic_det_samples

NUM_COCO_CLASSES = 92  # background + 91 category slots (`coco2017.py:39-59`)

# subset variants: name → set of raw category_ids kept (labels remapped to
# 1..K in subset order, background 0 — matching the reference's subset
# datasets which renumber their kept classes)
PERSON_IDS = (1,)
CAR_IDS = (3,)
ANIMAL_IDS = (16, 17, 18, 19, 20, 21, 22, 23, 24, 25)  # bird..giraffe
SUBSETS = {"coco2017": None, "coco2017person": PERSON_IDS,
           "coco2017car": CAR_IDS, "coco2017animal": ANIMAL_IDS}


def load_coco_samples(ann_path: str, image_dir: str,
                      keep_ids: Optional[Sequence[int]] = None,
                      use_cache: bool = True) -> Tuple[List[DetSample], int]:
    """Parse a COCO instances json into DetSamples. Returns (samples,
    num_classes incl. background).

    Parsed samples are pickle-cached beside the annotation file (the
    reference does the same for its processed annotations,
    `Detection/dataset/coco2017.py` pickle caching) — the instances json
    is ~450 MB and re-parsing it per run dominates startup."""
    import hashlib
    import pickle
    cache_path = None
    if use_cache:
        tag = "all" if keep_ids is None else "-".join(map(str, keep_ids))
        # image_dir is baked into the cached DetSample.image_path values,
        # so it must be part of the cache identity too
        dir_tag = hashlib.sha1(image_dir.encode()).hexdigest()[:8]
        cache_path = f"{ann_path}.afan_cache_{tag}_{dir_tag}.pkl"
        try:
            if (os.path.exists(cache_path)
                    and os.path.getmtime(cache_path)
                    >= os.path.getmtime(ann_path)):
                with open(cache_path, "rb") as f:
                    return pickle.load(f)
        except Exception:
            pass  # unreadable/stale cache: fall through to a fresh parse
    with open(ann_path) as f:
        coco = json.load(f)
    if keep_ids is not None:
        remap = {cid: i + 1 for i, cid in enumerate(keep_ids)}
        num_classes = len(keep_ids) + 1
    else:
        remap = None
        num_classes = NUM_COCO_CLASSES

    anns_by_image: Dict[int, list] = {}
    crowds_by_image: Dict[int, list] = {}
    for a in coco["annotations"]:
        cid = a["category_id"]
        if remap is not None and cid not in remap:
            continue
        if a.get("iscrowd", 0):
            # kept for eval (crowd-ignore regions), excluded from training
            crowds_by_image.setdefault(a["image_id"], []).append(a)
        else:
            anns_by_image.setdefault(a["image_id"], []).append(a)

    def _to_arrays(anns):
        boxes, labels = [], []
        for a in anns:
            x, y, w, h = a["bbox"]  # COCO xywh → corners
            boxes.append([x, y, x + w, y + h])
            labels.append(remap[a["category_id"]] if remap
                          else a["category_id"])
        return (np.asarray(boxes, np.float32).reshape(-1, 4),
                np.asarray(labels, np.int64))

    samples = []
    for im in coco["images"]:
        anns = anns_by_image.get(im["id"], [])
        if not anns:
            continue  # reference trains on images with at least one object
        boxes, labels = _to_arrays(anns)
        crowd_boxes, crowd_labels = _to_arrays(
            crowds_by_image.get(im["id"], []))
        samples.append(DetSample(
            image_id=str(im["id"]),
            image_path=os.path.join(image_dir, im["file_name"]),
            width=im["width"], height=im["height"],
            boxes=boxes, labels=labels,
            crowd_boxes=crowd_boxes, crowd_labels=crowd_labels))
    if cache_path is not None:
        try:
            with open(cache_path, "wb") as f:
                pickle.dump((samples, num_classes), f)
        except OSError:
            pass  # read-only data dir: skip caching
    return samples, num_classes


def coco_detection_loaders(data_dir: str, batch_size: int,
                           image_min_side: float = 800.0,
                           image_max_side: float = 1333.0, seed: int = 0,
                           subset: str = "coco2017",
                           synthetic_fallback: bool = True):
    """(train_loader, eval_loader, num_classes); COCO dir layout
    `<data_dir>/COCO/{annotations,train2017,val2017}` (`coco2017.py:66-75`)."""
    keep = SUBSETS[subset]
    root = os.path.join(data_dir or "", "COCO")
    train_ann = os.path.join(root, "annotations", "instances_train2017.json")
    val_ann = os.path.join(root, "annotations", "instances_val2017.json")
    if not os.path.exists(train_ann):
        if not synthetic_fallback:
            raise FileNotFoundError(f"no COCO under {data_dir!r}")
        nc = (len(keep) + 1) if keep else NUM_COCO_CLASSES
        train = synthetic_det_samples(64, num_classes=min(nc - 1, 20),
                                      seed=seed)
        test = synthetic_det_samples(16, num_classes=min(nc - 1, 20),
                                     seed=seed + 1000)
        num_classes = nc
    else:
        train, num_classes = load_coco_samples(
            train_ann, os.path.join(root, "train2017"), keep)
        test, _ = load_coco_samples(
            val_ann, os.path.join(root, "val2017"), keep)
    return (DetectionLoader(train, batch_size, image_min_side,
                            image_max_side, True, seed),
            DetectionLoader(test, 1, image_min_side, image_max_side, False),
            num_classes)
