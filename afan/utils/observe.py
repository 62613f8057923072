"""Observability: scalar logging, profiler traces, step timing.

The reference scatters this across tensorboardX
(`Detection/train_aug_final.py:51,165`), torch tensorboard + visdom
(`Segmentation/main_aug_final.py:34-38`), pickle dumps + matplotlib curves
(`Classification/main_perturb.py:138-150`), and wall-clock samples/sec
logging (`train_aug_final.py:171-179`). Here:

* :class:`ScalarWriter` — always writes append-only JSONL (greppable,
  dependency-free), and mirrors to TensorBoard when torch's SummaryWriter
  is importable;
* :func:`profile_trace` — ``jax.profiler`` trace capture (TPU timeline in
  TensorBoard / xprof), which the reference never had (SURVEY.md §5
  "tracing/profiling: ad-hoc only");
* :class:`StepTimer` — samples/sec + ETA with the same cadence semantics
  as the reference's display loop.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class ScalarWriter:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step),
                                  "ts": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def save_image_panel(path: str, image, target_rgb, pred_rgb) -> None:
    """input | target | prediction triptych PNG — the during-training
    image panels the reference shows in visdom
    (`Segmentation/utils/visualizer.py`, `main_aug_final.py:265-275`);
    file-based here (zero-egress hosts have no visdom server).

    ``image``: (H, W, 3) float in [0,1]; ``target_rgb``/``pred_rgb``:
    (H, W, 3) uint8 color-decoded label maps."""
    import numpy as np
    from PIL import Image
    img = (np.clip(np.asarray(image), 0.0, 1.0) * 255).astype(np.uint8)
    panel = np.concatenate(
        [img, np.asarray(target_rgb), np.asarray(pred_rgb)], axis=1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(panel).save(path)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace around a block of steps. View with
    TensorBoard's profile plugin / xprof."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """samples/sec + ETA at a display cadence
    (`Detection/train_aug_final.py:171-179`)."""

    def __init__(self, batch_size: int, total_steps: int,
                 display_every: int = 20):
        self.batch_size = batch_size
        self.total = total_steps
        self.every = display_every
        self._t = time.time()

    def tick(self, step: int) -> Optional[str]:
        if step % self.every:
            return None
        dt = time.time() - self._t
        self._t = time.time()
        sps = self.every / max(dt, 1e-9)
        eta_h = (self.total - step) / max(sps, 1e-9) / 3600
        return (f"{self.batch_size * sps:.2f} samples/sec; "
                f"ETA {eta_h:.1f} hrs")
