"""SAT spectrum sampling: interpolated clean→adversarial feature intensities.

Reference: ``get_sample_points`` at `Detection/attack_algo.py:236-245` and
`Segmentation/attack_algo.py:108-118` — a python list of ``number`` evenly
spaced ``torch.lerp`` points with ``list[0] == clean`` and
``list[-1] == adv``.

TPU-native design: instead of a list of ``number`` separate tensors (which
the reference forwards through the tail one at a time — ~6 sequential
forwards per step, `Detection/train_aug_final.py:128-146`), we materialize
one stacked ``(number, ...)`` tensor so the tail can be vmapped/batched over
the spectrum axis in a single fused forward.
"""
from __future__ import annotations

import jax.numpy as jnp


def spectrum_weights(number: int, dtype=jnp.float32) -> jnp.ndarray:
    """The ``number`` evenly spaced interpolation weights in [0, 1].

    Matches the reference construction: ``[0, 1/(n-1), ..., (n-2)/(n-1), 1]``.
    """
    if number < 2:
        raise ValueError("spectrum needs at least 2 points (clean and adv)")
    percent = 1.0 / (number - 1)
    ws = [0.0] + [i * percent for i in range(1, number - 1)] + [1.0]
    return jnp.asarray(ws, dtype=dtype)


def sample_points(clean: jnp.ndarray, adv: jnp.ndarray, number: int) -> jnp.ndarray:
    """Stacked spectrum ``(number, *clean.shape)``.

    ``out[0] == clean``, ``out[-1] == adv``, and
    ``out[i] == clean + w_i * (adv - clean)`` (torch.lerp semantics).
    """
    ws = spectrum_weights(number, dtype=clean.dtype)
    ws = ws.reshape((number,) + (1,) * clean.ndim)
    return clean[None] + ws * (adv - clean)[None]


def sample_points_list(clean: jnp.ndarray, adv: jnp.ndarray, number: int):
    """Reference-shaped API: a python list of ``number`` arrays."""
    stacked = sample_points(clean, adv, number)
    return [stacked[i] for i in range(number)]
