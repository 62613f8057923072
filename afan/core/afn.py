"""AFN — adversarial feature normalization ("mix_feature").

Reference: ``mix_feature`` at `Detection/attack_algo.py:254-265` and
`Segmentation/attack_algo.py:121-130`: re-statistics-match the clean feature
with the adversarial feature's mean/std, where the statistics are taken over
the **channel axis** (``dim=1`` of an NCHW torch tensor) — i.e. per-sample,
per-spatial-position stats, NOT AdaIN-style per-channel stats. The torch
``var`` default is unbiased (ddof=1); we reproduce that exactly.

This framework stores activations as NHWC (TPU-native layout), so the
channel axis is the last one.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-5


def mix_feature(
    clean_feature: jnp.ndarray,
    adv_feature: jnp.ndarray,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """``(clean - mu_cl) / sigma_cl * sigma_adv + mu_adv`` with channel-axis stats.

    ``channel_axis=-1`` for NHWC activations (this framework's layout);
    pass ``1`` to operate on NCHW tensors (the reference layout).
    """
    mean_cl = jnp.mean(clean_feature, axis=channel_axis, keepdims=True)
    std_cl = jnp.sqrt(jnp.var(clean_feature, axis=channel_axis, keepdims=True, ddof=1) + _EPS)
    mean_adv = jnp.mean(adv_feature, axis=channel_axis, keepdims=True)
    std_adv = jnp.sqrt(jnp.var(adv_feature, axis=channel_axis, keepdims=True, ddof=1) + _EPS)
    normalized = (clean_feature - mean_cl) / std_cl
    return normalized * std_adv + mean_adv


def mix_spectrum(
    clean_feature: jnp.ndarray,
    spectrum: jnp.ndarray,
    mask,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """Apply AFN to selected points of a stacked spectrum ``(N, ...)``.

    ``mask`` is a length-N sequence of 0/1 (static python values) mirroring
    the reference's ``mix_layer`` flag string (`train_aug_final.py:117-126`):
    entry i set → spectrum[i] is replaced by ``mix_feature(clean, spectrum[i])``.
    Entry 0 (the clean point) is conventionally 0 in the reference drivers;
    honoring a nonzero entry 0 is still well-defined (mix of clean with
    itself = identity up to eps) so no special-casing is needed.
    """
    pts = []
    for i in range(spectrum.shape[0]):
        if mask[i]:
            pts.append(mix_feature(clean_feature, spectrum[i], channel_axis))
        else:
            pts.append(spectrum[i])
    return jnp.stack(pts, axis=0)
