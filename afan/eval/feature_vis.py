"""SAT spectrum feature-map visualization — the analog of the reference's
`Detection/train_sat_vis.py:129-138` + `feature_map_save`
(`Detection/attack_algo.py:268-292`): compute the SE tap feature for a
batch, run the feature-PGD ascent, expand the interpolation spectrum, and
dump every spectrum point's feature map as a PNG (channel-mean heatmap —
the reference saves matplotlib images of the feature tensor) next to the
input image.

All device work is one jitted program; PNG encoding is host-side.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.attack import pgd
from ..core.spectrum import sample_points


def make_spectrum_features_fn(model, tap: int, gamma: float, steps: int,
                              eps: float, n_points: int):
    """(state, images, gt_boxes, gt_classes, gt_valid, rng) →
    (n_points, B, h, w, C) spectrum of SE features (point 0 = clean,
    point n-1 = adversarial)."""

    @jax.jit
    def fn(state, images, gt_boxes, gt_classes, gt_valid, rng):
        variables = state.variables()
        feat = model.apply(variables, images, tap, False,
                           method=model.backbone_head)
        feat = jax.lax.stop_gradient(feat)

        def se_loss(f):
            return model.apply(variables, images, gt_boxes, gt_classes,
                               gt_valid, rng, tap, f,
                               method=model.losses).total()

        adv = pgd(se_loss, feat, steps=steps, gamma=gamma, eps=eps,
                  rng=rng)
        return sample_points(feat, jax.lax.stop_gradient(adv), n_points)

    return fn


def save_spectrum_pngs(spectrum: np.ndarray, images: np.ndarray,
                       image_ids, outdir: str) -> int:
    """Write <id>_input.png + <id>_spec<k>.png heatmaps; returns file
    count. ``spectrum``: (N, B, h, w, C); ``images``: (B, H, W, 3) in
    [0, 1]."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(outdir, exist_ok=True)
    spectrum = np.asarray(spectrum)
    images = np.asarray(images)
    n = 0
    for b, image_id in enumerate(image_ids):
        plt.imsave(os.path.join(outdir, f"{image_id}_input.png"),
                   np.clip(images[b], 0, 1))
        n += 1
        for k in range(spectrum.shape[0]):
            heat = spectrum[k, b].mean(axis=-1)
            lo, hi = heat.min(), heat.max()
            heat = (heat - lo) / max(hi - lo, 1e-12)
            plt.imsave(os.path.join(outdir, f"{image_id}_spec{k}.png"),
                       heat, cmap="viridis")
            n += 1
    return n
