"""PASCAL VOC detection data pipeline (VOC2007 / VOC2007+2012 union).

Behavioral port of `Detection/dataset/{base,voc2007,voc20072012}.py`:

* XML annotation parsing with difficult-object filtering
  (`voc2007.py:95-116`);
* min-side/max-side resize rule (`dataset/base.py:75-91`): scale shorter
  side to IMAGE_MIN_SIDE, then cap longer side at IMAGE_MAX_SIDE;
* train-time random horizontal flip with box flip (`voc2007.py:104-110`);
* aspect-ratio-homogeneous batching — the reference's
  NearestRatioRandomSampler groups tall (ratio<1) vs fat images
  (`dataset/base.py:126-158`);
* zero-padding of boxes/labels (`dataset/base.py:93-124`).

TPU-native difference: instead of padding images to the per-batch max
(dynamic shapes → one XLA recompile per unique size), every image is padded
to its bucket's STATIC canvas — fat bucket (min_side, max_side), tall
bucket (max_side, min_side) — so the jitted train step compiles at most
twice (SURVEY.md §7.3 "variable image sizes"). Zero padding is semantically
identical to the reference's.
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor")
# class index 0 = background (`voc2007.py` CATEGORY_TO_LABEL_DICT)
VOC_LABELS = {name: i + 1 for i, name in enumerate(VOC_CLASSES)}

MAX_GT_BOXES = 64  # static gt capacity (VOC images have <= ~42 objects)


@dataclass
class DetSample:
    image_id: str
    image_path: Optional[str]     # None for synthetic
    width: int
    height: int
    boxes: np.ndarray             # (G, 4) float32, 0-based pixel coords
    labels: np.ndarray            # (G,) int64 (1-based classes)
    # raw-XML-coordinate gt incl. difficult objects, for the voc_eval
    # protocol (it reads annotations WITHOUT the -1 shift,
    # `Detection/voc_eval.py:154-176`, while the model trains on 0-based
    # boxes, `voc2007.py:77-82` — we reproduce both conventions)
    eval_boxes: Optional[np.ndarray] = None
    eval_labels: Optional[np.ndarray] = None
    eval_difficult: Optional[np.ndarray] = None
    # COCO iscrowd gt: excluded from training targets but kept for eval,
    # where they act as per-class ignore regions (COCOeval semantics,
    # `Detection/dataset/coco2017.py:160-171`)
    crowd_boxes: Optional[np.ndarray] = None
    crowd_labels: Optional[np.ndarray] = None
    synthetic_seed: Optional[int] = None


def compute_scale(width: int, height: int, image_min_side: float,
                  image_max_side: float) -> float:
    """The resize rule of `dataset/base.py:75-86`."""
    scale = image_min_side / min(width, height)
    longer = max(width, height) * scale
    if longer > image_max_side:
        scale *= image_max_side / longer
    return scale


def parse_voc_annotation(xml_path: str):
    """Parse one VOC XML. Returns (boxes_raw, labels, difficult): raw
    1-based XML coords (`voc_eval.py` convention) with difficult flags;
    training code shifts to 0-based and drops difficult objects
    (`voc2007.py:73-101`)."""
    root = ET.parse(xml_path).getroot()
    boxes, labels, difficult = [], [], []
    for obj in root.findall("object"):
        name = obj.find("name").text.strip().lower()
        if name not in VOC_LABELS:
            continue
        d = obj.find("difficult")
        difficult.append(d is not None and d.text.strip() == "1")
        bb = obj.find("bndbox")
        boxes.append([float(bb.find(t).text) for t in
                      ("xmin", "ymin", "xmax", "ymax")])
        labels.append(VOC_LABELS[name])
    if not boxes:
        return (np.zeros((0, 4), np.float32), np.zeros((0,), np.int64),
                np.zeros((0,), bool))
    return (np.asarray(boxes, np.float32), np.asarray(labels, np.int64),
            np.asarray(difficult, bool))


def find_voc_root(data_dir: str, year: str = "2007") -> Optional[str]:
    for cand in (os.path.join(data_dir, f"VOC{year}"),
                 os.path.join(data_dir, "VOCdevkit", f"VOC{year}"),
                 data_dir):
        if os.path.isdir(os.path.join(cand, "Annotations")):
            return cand
    return None


def load_voc_samples(voc_root: str, split: str = "trainval"
                     ) -> List[DetSample]:
    split_file = os.path.join(voc_root, "ImageSets", "Main", f"{split}.txt")
    with open(split_file) as f:
        ids = [line.strip().split()[0] for line in f if line.strip()]
    samples = []
    for image_id in ids:
        xml_path = os.path.join(voc_root, "Annotations", f"{image_id}.xml")
        root = ET.parse(xml_path).getroot()
        size = root.find("size")
        w = int(size.find("width").text)
        h = int(size.find("height").text)
        boxes_raw, labels, difficult = parse_voc_annotation(xml_path)
        keep = ~difficult
        samples.append(DetSample(
            image_id=image_id,
            image_path=os.path.join(voc_root, "JPEGImages",
                                    f"{image_id}.jpg"),
            width=w, height=h,
            boxes=boxes_raw[keep] - 1.0,   # 0-based for training
            labels=labels[keep],
            eval_boxes=boxes_raw, eval_labels=labels,
            eval_difficult=difficult))
    return samples


def synthetic_det_samples(n: int = 64, num_classes: int = 20, seed: int = 0
                          ) -> List[DetSample]:
    """Deterministic synthetic detection set: colored rectangles on noise,
    learnable by a detector (used when no VOC exists on disk)."""
    rng = np.random.RandomState(seed)
    samples = []
    for i in range(n):
        w, h = (500, 375) if rng.rand() < 0.5 else (375, 500)
        g = rng.randint(1, 5)
        boxes, labels = [], []
        for _ in range(g):
            bw = rng.randint(60, min(w, 220))
            bh = rng.randint(60, min(h, 220))
            x1 = rng.randint(0, w - bw)
            y1 = rng.randint(0, h - bh)
            boxes.append([x1, y1, x1 + bw, y1 + bh])
            labels.append(rng.randint(1, num_classes + 1))
        samples.append(DetSample(
            image_id=f"synth{i:06d}", image_path=None, width=w, height=h,
            boxes=np.asarray(boxes, np.float32),
            labels=np.asarray(labels, np.int64), synthetic_seed=seed + i))
    return samples


def render_synthetic(sample: DetSample) -> np.ndarray:
    """Render a synthetic sample: class-colored rectangle per box."""
    rng = np.random.RandomState(sample.synthetic_seed)
    img = rng.rand(sample.height, sample.width, 3).astype(np.float32) * 0.3
    for box, label in zip(sample.boxes, sample.labels):
        color = np.asarray([((label * 37) % 255) / 255.0,
                            ((label * 91) % 255) / 255.0,
                            ((label * 151) % 255) / 255.0], np.float32)
        x1, y1, x2, y2 = box.astype(int)
        img[y1:y2, x1:x2] = 0.7 * color + 0.3 * img[y1:y2, x1:x2]
    return img


def load_image(sample: DetSample) -> np.ndarray:
    """float32 [0,1] HWC image."""
    if sample.image_path is None:
        return render_synthetic(sample)
    from PIL import Image
    with Image.open(sample.image_path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def resize_image(img: np.ndarray, scale: float) -> np.ndarray:
    """Bilinear resize by scale (PIL parity with `base.py:84-88`)."""
    from PIL import Image
    h, w = img.shape[:2]
    out_h, out_w = round(h * scale), round(w * scale)
    im = Image.fromarray((img * 255).astype(np.uint8))
    im = im.resize((out_w, out_h), Image.BILINEAR)
    return np.asarray(im, np.float32) / 255.0


@dataclass
class DetBatch:
    image_ids: List[str]
    images: np.ndarray       # (B, H, W, 3) float32, bucket-padded
    scales: np.ndarray       # (B,)
    boxes: np.ndarray        # (B, MAX_GT, 4) scaled coords, zero-padded
    labels: np.ndarray       # (B, MAX_GT) int32
    valid: np.ndarray        # (B, MAX_GT) bool


class DetectionLoader:
    """Bucketed epoch iterator (tall vs fat, the reference sampler's
    grouping) with static canvas shapes per bucket."""

    def __init__(self, samples: Sequence[DetSample], batch_size: int,
                 image_min_side: float = 600.0, image_max_side: float = 1000.0,
                 train: bool = True, seed: int = 0, pad_multiple: int = 16):
        self.samples = list(samples)
        self.batch_size = batch_size
        self.min_side = image_min_side
        self.max_side = image_max_side
        self.train = train
        self.rng = np.random.RandomState(seed)
        m = pad_multiple

        def rup(x):
            return int(-(-int(round(x)) // m) * m)

        # fat canvas (H=min, W=max); tall canvas transposed
        self.fat_canvas = (rup(image_min_side), rup(image_max_side))
        self.tall_canvas = (rup(image_max_side), rup(image_min_side))

    def __len__(self):
        tall = sum(1 for s in self.samples if s.width / s.height < 1)
        fat = len(self.samples) - tall
        if self.train:
            return tall // self.batch_size + fat // self.batch_size
        return -(-tall // self.batch_size) + -(-fat // self.batch_size)

    def _make_batch(self, idxs: List[int]) -> DetBatch:
        first = self.samples[idxs[0]]
        tall = first.width / first.height < 1
        ch, cw = self.tall_canvas if tall else self.fat_canvas
        bsz = len(idxs)
        images = np.zeros((bsz, ch, cw, 3), np.float32)
        boxes = np.zeros((bsz, MAX_GT_BOXES, 4), np.float32)
        labels = np.zeros((bsz, MAX_GT_BOXES), np.int32)
        valid = np.zeros((bsz, MAX_GT_BOXES), bool)
        scales = np.zeros((bsz,), np.float32)
        ids = []
        for j, i in enumerate(idxs):
            s = self.samples[i]
            img = load_image(s)
            bxs = s.boxes.copy()
            if self.train and self.rng.rand() < 0.5:  # hflip + box flip
                img = img[:, ::-1]
                if len(bxs):
                    bxs = bxs.copy()
                    x1 = bxs[:, 0].copy()
                    bxs[:, 0] = s.width - bxs[:, 2]
                    bxs[:, 2] = s.width - x1
            scale = compute_scale(s.width, s.height, self.min_side,
                                  self.max_side)
            img = resize_image(img, scale)
            h, w = img.shape[:2]
            h, w = min(h, ch), min(w, cw)
            images[j, :h, :w] = img[:h, :w]
            g = min(len(bxs), MAX_GT_BOXES)
            if g:
                boxes[j, :g] = bxs[:g] * scale
                labels[j, :g] = s.labels[:g]
                valid[j, :g] = True
            scales[j] = scale
            ids.append(s.image_id)
        return DetBatch(ids, images, scales, boxes, labels, valid)

    def __iter__(self) -> Iterator[DetBatch]:
        ratios = np.asarray([s.width / s.height for s in self.samples])
        if self.train:
            # NearestRatioRandomSampler parity: shuffle within tall/fat,
            # drop remainders, interleave batches randomly
            tall = np.nonzero(ratios < 1)[0]
            fat = np.nonzero(ratios >= 1)[0]
            self.rng.shuffle(tall)
            self.rng.shuffle(fat)
            bs = self.batch_size
            batches = [tall[i:i + bs] for i in
                       range(0, len(tall) - len(tall) % bs, bs)]
            batches += [fat[i:i + bs] for i in
                        range(0, len(fat) - len(fat) % bs, bs)]
            order = self.rng.permutation(len(batches))
            for k in order:
                yield self._make_batch(list(batches[k]))
        else:
            # eval: batches must be orientation-homogeneous — _make_batch
            # picks the canvas from the FIRST sample, so a tall image in a
            # fat batch would be silently cropped. Partition by orientation
            # (order preserved within each group; evaluation keys results
            # by image_id, so cross-group order is irrelevant).
            tall = np.nonzero(ratios < 1)[0]
            fat = np.nonzero(ratios >= 1)[0]
            for group in (tall, fat):
                for i in range(0, len(group), self.batch_size):
                    yield self._make_batch(
                        list(group[i:i + self.batch_size]))


def voc_detection_loaders(data_dir: str, batch_size: int,
                          image_min_side: float = 600.0,
                          image_max_side: float = 1000.0, seed: int = 0,
                          dataset: str = "voc2007",
                          synthetic_fallback: bool = True):
    """(train_loader, eval_loader, num_classes). ``dataset``:
    voc2007 | voc2007-trainval-test | voc20072012 (union trainvals,
    `Detection/dataset/voc20072012.py`)."""
    root07 = find_voc_root(data_dir, "2007") if data_dir else None
    if root07 is None:
        if not synthetic_fallback:
            raise FileNotFoundError(f"no VOC found under {data_dir!r}")
        train = synthetic_det_samples(64, seed=seed)
        test = synthetic_det_samples(16, seed=seed + 1000)
    else:
        train = load_voc_samples(root07, "trainval")
        if dataset == "voc20072012":
            root12 = find_voc_root(data_dir, "2012")
            if root12:
                train = train + load_voc_samples(root12, "trainval")
        test = load_voc_samples(root07, "test")
    return (DetectionLoader(train, batch_size, image_min_side,
                            image_max_side, True, seed),
            DetectionLoader(test, 1, image_min_side, image_max_side, False),
            21)
