"""Paired image+label transforms for segmentation — the full surface of
`Segmentation/utils/ext_transforms.py` (16 classes there), reimplemented
on numpy arrays (image HWC float32 in [0,1], label HW int32) instead of
PIL/torch tensors.

Conventions shared with the reference:
* every geometric transform applies identically to image and label, with
  the label resampled NEAREST;
* photometric transforms touch only the image;
* randomness: the reference draws from python's global ``random``; here
  every ``__call__`` takes an explicit ``np.random.RandomState`` so
  pipelines are deterministic per seed (documented divergence).

Documented behavioral divergences (reference quirks resolved):
* ``Pad``: the reference's ExtPad swaps h/w (PIL ``.size`` is (w, h)) and
  hardcodes 32 instead of its ``diviser`` argument — the evidently
  intended behavior (pad H and W up to multiples of ``divisor``) is
  implemented;
* ``RandomCrop(pad_if_needed)``: pads bottom/right with exactly the
  missing amount (image 0, label 255) instead of the reference's
  all-four-sides over-padding — same output size, same content
  distribution;
* ``RandomRotation`` fills revealed corners with 0 in BOTH image and
  label, matching the reference's F.rotate default (a quirk: corner
  label pixels become class 0, not ignore; pass ``label_fill=255`` for
  the sane variant).
"""
from __future__ import annotations

import numbers
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

IGNORE = 255

Pair = Tuple[np.ndarray, np.ndarray]


def _to_pil_img(img: np.ndarray):
    from PIL import Image
    return Image.fromarray((np.clip(img, 0.0, 1.0) * 255).astype(np.uint8))


def _to_pil_lab(lab: np.ndarray):
    from PIL import Image
    return Image.fromarray(lab.astype(np.int32), mode="I")


def _resize_pair(img: np.ndarray, lab: np.ndarray, size_hw: Tuple[int, int]
                 ) -> Pair:
    """Bilinear image / nearest label resize to (h, w)."""
    from PIL import Image
    nh, nw = size_hw
    im = _to_pil_img(img).resize((nw, nh), Image.BILINEAR)
    lm = _to_pil_lab(lab).resize((nw, nh), Image.NEAREST)
    return (np.asarray(im, np.float32) / 255.0, np.asarray(lm, np.int32))


def _size_pair(size) -> Tuple[int, int]:
    if isinstance(size, numbers.Number):
        return int(size), int(size)
    return int(size[0]), int(size[1])


class ExtCompose:
    """`ext_transforms.py::ExtCompose` — chains paired transforms."""

    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, img, lbl, rng: np.random.RandomState) -> Pair:
        for t in self.transforms:
            img, lbl = t(img, lbl, rng)
        return img, lbl


class ExtRandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img, lbl, rng) -> Pair:
        if rng.rand() < self.p:
            return img[:, ::-1].copy(), lbl[:, ::-1].copy()
        return img, lbl


class ExtRandomVerticalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img, lbl, rng) -> Pair:
        if rng.rand() < self.p:
            return img[::-1].copy(), lbl[::-1].copy()
        return img, lbl


class ExtCenterCrop:
    def __init__(self, size):
        self.size = _size_pair(size)

    def __call__(self, img, lbl, rng) -> Pair:
        th, tw = self.size
        h, w = lbl.shape
        y = max((h - th) // 2, 0)
        x = max((w - tw) // 2, 0)
        return (img[y:y + th, x:x + tw], lbl[y:y + th, x:x + tw])


class ExtRandomScale:
    """Uniform scale in ``scale_range`` applied to both H and W
    (`ext_transforms.py::ExtRandomScale`)."""

    def __init__(self, scale_range: Tuple[float, float] = (0.5, 2.0)):
        self.scale_range = scale_range

    def __call__(self, img, lbl, rng) -> Pair:
        s = rng.uniform(self.scale_range[0], self.scale_range[1])
        h, w = lbl.shape
        return _resize_pair(img, lbl, (int(h * s), int(w * s)))


class ExtScale:
    """Fixed scale factor (`ext_transforms.py::ExtScale`)."""

    def __init__(self, scale: float):
        self.scale = scale

    def __call__(self, img, lbl, rng) -> Pair:
        h, w = lbl.shape
        return _resize_pair(img, lbl,
                            (int(h * self.scale), int(w * self.scale)))


class ExtRandomRotation:
    """Rotate by a uniform angle in ``degrees``
    (`ext_transforms.py::ExtRandomRotation`); both image and label rotate
    NEAREST-filled with ``label_fill``/0 — see module docstring."""

    def __init__(self, degrees, expand: bool = False, label_fill: int = 0):
        if isinstance(degrees, numbers.Number):
            if degrees < 0:
                raise ValueError("single-number degrees must be positive")
            self.degrees = (-degrees, degrees)
        else:
            self.degrees = tuple(degrees)
        self.expand = expand
        self.label_fill = label_fill

    def __call__(self, img, lbl, rng) -> Pair:
        from PIL import Image
        angle = rng.uniform(self.degrees[0], self.degrees[1])
        im = _to_pil_img(img).rotate(angle, Image.BILINEAR,
                                     expand=self.expand, fillcolor=0)
        lm = _to_pil_lab(lbl).rotate(angle, Image.NEAREST,
                                     expand=self.expand,
                                     fillcolor=self.label_fill)
        return (np.asarray(im, np.float32) / 255.0, np.asarray(lm, np.int32))


class ExtPad:
    """Pad H/W up to multiples of ``divisor`` (intended ExtPad behavior;
    the reference's is buggy — see module docstring). Centered padding,
    image 0 / label ``label_fill``."""

    def __init__(self, divisor: int = 32, label_fill: int = IGNORE):
        self.divisor = divisor
        self.label_fill = label_fill

    def __call__(self, img, lbl, rng) -> Pair:
        h, w = lbl.shape
        d = self.divisor
        ph = (-h) % d
        pw = (-w) % d
        if not ph and not pw:
            return img, lbl
        img = np.pad(img, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2),
                           (0, 0)))
        lbl = np.pad(lbl, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)),
                     constant_values=self.label_fill)
        return img, lbl


class ExtToTensor:
    """uint8/float HWC image → float32 [0,1] HWC; label → int32. (The
    NHWC-numpy analog of ExtToTensor's CHW torch tensor.)"""

    def __init__(self, normalize: bool = True):
        self.normalize = normalize

    def __call__(self, img, lbl, rng) -> Pair:
        img = np.asarray(img)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / (255.0 if self.normalize else 1.0)
        else:
            img = img.astype(np.float32)
        return img, np.asarray(lbl, np.int32)


class ExtNormalize:
    """(img - mean) / std per channel; label untouched."""

    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img, lbl, rng) -> Pair:
        return (img - self.mean) / self.std, lbl


class ExtRandomCrop:
    """Random crop with optional fixed padding and pad_if_needed
    (`ext_transforms.py::ExtRandomCrop`); image 0-pad, label 255-pad."""

    def __init__(self, size, padding: int = 0, pad_if_needed: bool = False,
                 label_fill: int = IGNORE):
        self.size = _size_pair(size)
        self.padding = padding
        self.pad_if_needed = pad_if_needed
        self.label_fill = label_fill

    def __call__(self, img, lbl, rng) -> Pair:
        th, tw = self.size
        if self.padding > 0:
            p = self.padding
            img = np.pad(img, ((p, p), (p, p), (0, 0)))
            lbl = np.pad(lbl, ((p, p), (p, p)),
                         constant_values=self.label_fill)
        h, w = lbl.shape
        if self.pad_if_needed and (h < th or w < tw):
            ph, pw = max(th - h, 0), max(tw - w, 0)
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
            lbl = np.pad(lbl, ((0, ph), (0, pw)),
                         constant_values=self.label_fill)
            h, w = lbl.shape
        y = rng.randint(0, h - th + 1)
        x = rng.randint(0, w - tw + 1)
        return img[y:y + th, x:x + tw], lbl[y:y + th, x:x + tw]


class ExtResize:
    """Resize to (h, w), or match the short side to an int size
    (`ext_transforms.py::ExtResize`, torchvision semantics)."""

    def __init__(self, size):
        self.size = size

    def __call__(self, img, lbl, rng) -> Pair:
        h, w = lbl.shape
        if isinstance(self.size, numbers.Number):
            s = int(self.size)
            if h <= w:
                nh, nw = s, max(int(round(w * s / h)), 1)
            else:
                nh, nw = max(int(round(h * s / w)), 1), s
        else:
            nh, nw = _size_pair(self.size)
        return _resize_pair(img, lbl, (nh, nw))


class ExtColorJitter:
    """Random brightness/contrast/saturation/hue in a random order
    (`ext_transforms.py::ExtColorJitter`), on the float image."""

    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.brightness = self._rng_range(brightness, "brightness")
        self.contrast = self._rng_range(contrast, "contrast")
        self.saturation = self._rng_range(saturation, "saturation")
        self.hue = self._rng_range(hue, "hue", center=0.0,
                                   bound=(-0.5, 0.5), clip_zero=False)

    @staticmethod
    def _rng_range(value, name, center=1.0, bound=(0, float("inf")),
                   clip_zero=True):
        if isinstance(value, numbers.Number):
            if value < 0:
                raise ValueError(f"{name} must be non-negative")
            lo, hi = center - value, center + value
            if clip_zero:
                lo = max(lo, 0.0)
        else:
            lo, hi = value
            if not bound[0] <= lo <= hi <= bound[1]:
                raise ValueError(f"{name} range outside {bound}")
        if lo == hi == center:
            return None
        return (lo, hi)

    @staticmethod
    def _brightness(img, f):
        return img * f

    @staticmethod
    def _contrast(img, f):
        # torchvision adjusts around the mean of the grayscale image
        mean = (img @ np.asarray([0.299, 0.587, 0.114], np.float32)).mean()
        return (img - mean) * f + mean

    @staticmethod
    def _saturation(img, f):
        gray = (img @ np.asarray([0.299, 0.587, 0.114],
                                 np.float32))[..., None]
        return (img - gray) * f + gray

    @staticmethod
    def _hue(img, f):
        import colorsys  # noqa: F401  (documents intent; vector math below)
        # rotate hue in HSV space by f (fraction of the full circle)
        mx = img.max(axis=-1)
        mn = img.min(axis=-1)
        diff = mx - mn + 1e-12
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        h = np.where(mx == r, (g - b) / diff % 6.0,
                     np.where(mx == g, (b - r) / diff + 2.0,
                              (r - g) / diff + 4.0)) / 6.0
        h = (h + f) % 1.0
        s = np.where(mx > 0, diff / (mx + 1e-12), 0.0)
        i = np.floor(h * 6.0)
        fr = h * 6.0 - i
        p = mx * (1 - s)
        q = mx * (1 - fr * s)
        t = mx * (1 - (1 - fr) * s)
        i = i.astype(np.int32) % 6
        out = np.empty_like(img)
        for k, (rr, gg, bb) in enumerate([(mx, t, p), (q, mx, p), (p, mx, t),
                                          (p, q, mx), (t, p, mx),
                                          (mx, p, q)]):
            m = i == k
            out[..., 0] = np.where(m, rr, out[..., 0])
            out[..., 1] = np.where(m, gg, out[..., 1])
            out[..., 2] = np.where(m, bb, out[..., 2])
        return out

    def __call__(self, img, lbl, rng) -> Pair:
        ops = []
        if self.brightness is not None:
            f = rng.uniform(*self.brightness)
            ops.append(lambda im: self._brightness(im, f))
        if self.contrast is not None:
            fc = rng.uniform(*self.contrast)
            ops.append(lambda im: self._contrast(im, fc))
        if self.saturation is not None:
            fs = rng.uniform(*self.saturation)
            ops.append(lambda im: self._saturation(im, fs))
        if self.hue is not None:
            fh = rng.uniform(*self.hue)
            ops.append(lambda im: self._hue(im, fh))
        rng.shuffle(ops)
        for op in ops:
            img = op(img)
        return np.clip(img, 0.0, 1.0), lbl


class ExtLambda:
    """Apply a user function to the image only."""

    def __init__(self, fn: Callable[[np.ndarray], np.ndarray]):
        self.fn = fn

    def __call__(self, img, lbl, rng) -> Pair:
        return self.fn(img), lbl


def voc_train_transform(crop_size: int,
                        scale_range=(0.5, 2.0)) -> ExtCompose:
    """The reference VOC train pipeline (`args.py:118-124`):
    RandomScale + RandomCrop(pad_if_needed) + HFlip."""
    return ExtCompose([
        ExtRandomScale(scale_range),
        ExtRandomCrop(crop_size, pad_if_needed=True),
        ExtRandomHorizontalFlip(),
    ])


def cityscapes_train_transform(crop_size: int) -> ExtCompose:
    """The reference Cityscapes train pipeline (`args.py:139-146`):
    RandomCrop(pad_if_needed) + ColorJitter(.5,.5,.5) + HFlip."""
    return ExtCompose([
        ExtRandomCrop(crop_size, pad_if_needed=True),
        ExtColorJitter(0.5, 0.5, 0.5),
        ExtRandomHorizontalFlip(),
    ])
