"""Segmentation data pipelines: VOC2012(+SBD aug) and Cityscapes.

Behavioral port of `Segmentation/datasets/{voc,cityscapes}.py`. The paired
image+label transforms live in :mod:`afan.data.ext_transforms` (the FULL
`Segmentation/utils/ext_transforms.py` surface); the driver pipelines
(`args.py:109-164`) are:

* VOC train: ExtRandomScale(0.5-2.0) + ExtRandomCrop(crop, pad_if_needed,
  label pad = 255) + ExtRandomHorizontalFlip;
* Cityscapes train: ExtRandomCrop(crop) + ExtColorJitter(.5,.5,.5) +
  ExtRandomHorizontalFlip;
* Cityscapes 35-class table → 19 train ids with 255 ignore
  (`cityscapes.py:23-76`), encode/decode color maps.

Host-side numpy/PIL; labels use nearest-neighbor resampling throughout.
Eval batches are padded to a static canvas with label padding 255 (ignored
by both the loss and the confusion matrix), keeping eval jit-compiled at
one static shape. A deterministic synthetic fallback generates blob masks
so tests/benches run without datasets.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

IGNORE = 255

# Cityscapes id → train-id (19 classes), everything else 255
# (`datasets/cityscapes.py:23-56`)
_CITY_ID_TO_TRAIN = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}
CITY_ID_TO_TRAIN_LUT = np.full(256, IGNORE, np.uint8)
for k, v in _CITY_ID_TO_TRAIN.items():
    CITY_ID_TO_TRAIN_LUT[k] = v

# train-id → color (`cityscapes.py:58-76` decode_target)
CITY_TRAIN_COLORS = np.asarray([
    (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
    (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
    (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
    (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100), (0, 80, 100),
    (0, 0, 230), (119, 11, 32)], np.uint8)

VOC_SEG_CLASSES = 21
CITYSCAPES_CLASSES = 19


@dataclass
class SegSample:
    image_path: Optional[str]
    label_path: Optional[str]
    synthetic_seed: Optional[int] = None
    city_encode: bool = False


def _load_pair(s: SegSample, num_classes: int, size=(128, 128)
               ) -> Tuple[np.ndarray, np.ndarray]:
    if s.image_path is None:
        return _synth_pair(s.synthetic_seed, num_classes, size)
    from PIL import Image
    with Image.open(s.image_path) as im:
        img = np.asarray(im.convert("RGB"), np.float32) / 255.0
    with Image.open(s.label_path) as lm:
        lab = np.asarray(lm, np.uint8)
    if s.city_encode:
        lab = CITY_ID_TO_TRAIN_LUT[lab]
    return img, lab.astype(np.int32)


def _synth_pair(seed: int, num_classes: int, size) -> Tuple[np.ndarray, np.ndarray]:
    """Class-colored rectangles on noise; labels follow the rectangles."""
    h, w = size
    rng = np.random.RandomState(seed)
    img = rng.rand(h, w, 3).astype(np.float32) * 0.3
    lab = np.zeros((h, w), np.int32)
    for _ in range(rng.randint(2, 5)):
        c = rng.randint(1, num_classes)
        bw, bh = rng.randint(h // 4, h // 2), rng.randint(w // 4, w // 2)
        y, x = rng.randint(0, h - bh), rng.randint(0, w - bw)
        color = np.asarray([((c * 37) % 255) / 255.0, ((c * 91) % 255) / 255.0,
                            ((c * 151) % 255) / 255.0], np.float32)
        img[y:y + bh, x:x + bw] = 0.8 * color
        lab[y:y + bh, x:x + bw] = c
    return img, lab


def random_scale(img, lab, rng, lo=0.5, hi=2.0):
    """ExtRandomScale — thin wrapper over :mod:`.ext_transforms`."""
    from .ext_transforms import ExtRandomScale
    return ExtRandomScale((lo, hi))(img, lab, rng)


def random_crop(img, lab, rng, size: int, pad_if_needed: bool = True):
    """ExtRandomCrop — thin wrapper over :mod:`.ext_transforms`."""
    from .ext_transforms import ExtRandomCrop
    return ExtRandomCrop(size, pad_if_needed=pad_if_needed)(img, lab, rng)


def color_jitter(img, rng, brightness=0.5, contrast=0.5, saturation=0.5):
    """ExtColorJitter — thin wrapper over :mod:`.ext_transforms`."""
    from .ext_transforms import ExtColorJitter
    out, _ = ExtColorJitter(brightness, contrast, saturation)(
        img, np.zeros(img.shape[:2], np.int32), rng)
    return out


class SegLoader:
    def __init__(self, samples: Sequence[SegSample], batch_size: int,
                 num_classes: int, crop_size: int = 513, train: bool = True,
                 dataset: str = "voc", seed: int = 0,
                 eval_canvas: Optional[Tuple[int, int]] = None,
                 crop_val: bool = False):
        self.samples = list(samples)
        self.batch_size = batch_size
        self.num_classes = num_classes
        self.crop = crop_size
        self.train = train
        self.dataset = dataset
        self.rng = np.random.RandomState(seed)
        self.eval_canvas = eval_canvas
        # reference --crop_val (`Segmentation/args.py:70,123-129`):
        # resize shorter side to crop_size then center-crop, giving
        # uniform val batches instead of canvas padding
        self.crop_val = crop_val
        from .ext_transforms import (cityscapes_train_transform,
                                     voc_train_transform)
        self.transform = (voc_train_transform(crop_size)
                          if dataset == "voc"
                          else cityscapes_train_transform(crop_size))

    def __len__(self):
        n = len(self.samples)
        return (n // self.batch_size if self.train
                else -(-n // self.batch_size))

    def _train_item(self, s: SegSample):
        img, lab = _load_pair(s, self.num_classes,
                              size=(self.crop, self.crop))
        return self.transform(img, lab, self.rng)

    def _eval_item(self, s: SegSample):
        img, lab = _load_pair(s, self.num_classes,
                              size=(self.crop, self.crop))
        if self.crop_val:
            import cv2
            h, w = lab.shape
            scale = self.crop / min(h, w)
            nh, nw = max(self.crop, int(round(h * scale))), \
                max(self.crop, int(round(w * scale)))
            if (nh, nw) != (h, w):
                img = cv2.resize(img, (nw, nh),
                                 interpolation=cv2.INTER_LINEAR)
                lab = cv2.resize(lab.astype(np.int32), (nw, nh),
                                 interpolation=cv2.INTER_NEAREST)
            y0 = (nh - self.crop) // 2
            x0 = (nw - self.crop) // 2
            return (img[y0:y0 + self.crop, x0:x0 + self.crop],
                    lab[y0:y0 + self.crop, x0:x0 + self.crop])
        if self.eval_canvas:
            ch, cw = self.eval_canvas
            h, w = lab.shape
            out_i = np.zeros((ch, cw, 3), np.float32)
            out_l = np.full((ch, cw), IGNORE, np.int32)
            h, w = min(h, ch), min(w, cw)
            out_i[:h, :w] = img[:h, :w]
            out_l[:h, :w] = lab[:h, :w]
            return out_i, out_l
        return img, lab

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.samples)
        order = self.rng.permutation(n) if self.train else np.arange(n)
        for b in range(len(self)):
            sel = order[b * self.batch_size:(b + 1) * self.batch_size]
            items = [self._train_item(self.samples[i]) if self.train
                     else self._eval_item(self.samples[i]) for i in sel]
            imgs = np.stack([it[0] for it in items])
            labs = np.stack([it[1] for it in items])
            yield imgs, labs


def _find_voc_seg(data_root: str):
    for cand in (os.path.join(data_root, "VOCdevkit", "VOC2012"),
                 os.path.join(data_root, "VOC2012"), data_root):
        if os.path.isdir(os.path.join(cand, "SegmentationClass")):
            return cand
    return None


def voc_seg_loaders(data_root: str, batch_size: int, crop_size: int = 513,
                    year: str = "2012", seed: int = 0,
                    synthetic_fallback: bool = True,
                    val_batch_size: int = 1, crop_val: bool = False):
    """VOC segmentation (with SBD train_aug if `train_aug.txt` exists,
    `datasets/voc.py:72-160`)."""
    root = _find_voc_seg(data_root) if data_root else None
    if root is None:
        if not synthetic_fallback:
            raise FileNotFoundError(f"no VOC seg under {data_root!r}")
        train = [SegSample(None, None, seed + i) for i in range(64)]
        val = [SegSample(None, None, seed + 10000 + i) for i in range(16)]
        canvas = (crop_size, crop_size)
    else:
        def read_split(name):
            seg_dir = "SegmentationClassAug" if "aug" in name \
                else "SegmentationClass"
            path = os.path.join(root, "ImageSets", "Segmentation",
                                f"{name}.txt")
            with open(path) as f:
                ids = [l.strip() for l in f if l.strip()]
            return [SegSample(
                os.path.join(root, "JPEGImages", f"{i}.jpg"),
                os.path.join(root, seg_dir, f"{i}.png")) for i in ids]
        aug_txt = os.path.join(root, "ImageSets", "Segmentation",
                               "train_aug.txt")
        train = read_split("train_aug" if os.path.exists(aug_txt)
                           else "train")
        val = read_split("val")
        canvas = (512, 512)
    return (SegLoader(train, batch_size, VOC_SEG_CLASSES, crop_size, True,
                      "voc", seed),
            SegLoader(val, val_batch_size, VOC_SEG_CLASSES, crop_size,
                      False, "voc",
                      eval_canvas=None if crop_val else canvas,
                      crop_val=crop_val),
            VOC_SEG_CLASSES)


def cityscapes_loaders(data_root: str, batch_size: int,
                       crop_size: int = 768, seed: int = 0,
                       synthetic_fallback: bool = True,
                       val_batch_size: int = 1, crop_val: bool = False):
    img_root = os.path.join(data_root or "", "leftImg8bit")
    if not os.path.isdir(img_root):
        if not synthetic_fallback:
            raise FileNotFoundError(f"no Cityscapes under {data_root!r}")
        train = [SegSample(None, None, seed + i) for i in range(64)]
        val = [SegSample(None, None, seed + 10000 + i) for i in range(16)]
        canvas = (crop_size, crop_size)
    else:
        def collect(split):
            out = []
            sdir = os.path.join(img_root, split)
            for city in sorted(os.listdir(sdir)):
                for f in sorted(os.listdir(os.path.join(sdir, city))):
                    if f.endswith("_leftImg8bit.png"):
                        lab = f.replace("_leftImg8bit.png",
                                        "_gtFine_labelIds.png")
                        out.append(SegSample(
                            os.path.join(sdir, city, f),
                            os.path.join(data_root, "gtFine", split, city,
                                         lab), city_encode=True))
            return out
        train = collect("train")
        val = collect("val")
        canvas = (1024, 2048)
    return (SegLoader(train, batch_size, CITYSCAPES_CLASSES, crop_size,
                      True, "cityscapes", seed),
            SegLoader(val, val_batch_size, CITYSCAPES_CLASSES, crop_size,
                      False, "cityscapes",
                      eval_canvas=None if crop_val else canvas,
                      crop_val=crop_val),
            CITYSCAPES_CLASSES)
