"""Detection dataset factory — parity with ``DatasetBase.from_name``
(`Detection/dataset/base.py:20-46`): voc2007, voc20072012,
voc2007catdog, coco2017 and its person/car/animal subsets.
"""
from __future__ import annotations

import numpy as np

from .coco import coco_detection_loaders
from .voc_det import DetectionLoader, find_voc_root, load_voc_samples, \
    synthetic_det_samples, voc_detection_loaders

DETECTION_DATASETS = ("voc2007", "voc20072012", "voc2007catdog",
                      "coco2017", "coco2017person", "coco2017car",
                      "coco2017animal", "synthetic")


def detection_loaders(name: str, data_dir: str, batch_size: int,
                      image_min_side: float, image_max_side: float,
                      seed: int = 0):
    """(train_loader, eval_loader, num_classes)."""
    # the reference's OPTIONS hyphenate the subset names
    # ('voc2007-cat-dog', 'coco2017-person', ... — base.py:20); accept
    # both spellings
    name = name.replace("-", "")
    if name not in DETECTION_DATASETS:
        raise ValueError(f"unknown dataset {name!r}; "
                         f"have {DETECTION_DATASETS}")
    if name.startswith("coco"):
        return coco_detection_loaders(data_dir, batch_size, image_min_side,
                                      image_max_side, seed, subset=name)
    if name == "voc2007catdog":
        # `Detection/dataset/voc2007_cat_dog.py`: cat/dog-only VOC with
        # labels remapped to {bg:0, cat:1, dog:2}
        root = find_voc_root(data_dir, "2007") if data_dir else None
        if root is None:
            train = synthetic_det_samples(64, num_classes=2, seed=seed)
            test = synthetic_det_samples(16, num_classes=2, seed=seed + 1000)
        else:
            from .voc_det import VOC_LABELS
            keep = {VOC_LABELS["cat"]: 1, VOC_LABELS["dog"]: 2}

            def filt(samples):
                out = []
                for s in samples:
                    m = np.isin(s.labels, list(keep))
                    if not m.any():
                        continue
                    s.boxes = s.boxes[m]
                    s.labels = np.asarray([keep[int(l)]
                                           for l in s.labels[m]])
                    if s.eval_labels is not None:
                        em = np.isin(s.eval_labels, list(keep))
                        s.eval_boxes = s.eval_boxes[em]
                        s.eval_labels = np.asarray(
                            [keep[int(l)] for l in s.eval_labels[em]])
                        s.eval_difficult = s.eval_difficult[em]
                    out.append(s)
                return out

            train = filt(load_voc_samples(root, "trainval"))
            test = filt(load_voc_samples(root, "test"))
        return (DetectionLoader(train, batch_size, image_min_side,
                                image_max_side, True, seed),
                DetectionLoader(test, 1, image_min_side, image_max_side,
                                False),
                3)
    ds = "voc2007" if name == "synthetic" else name
    return voc_detection_loaders(data_dir, batch_size, image_min_side,
                                 image_max_side, seed, dataset=ds)
