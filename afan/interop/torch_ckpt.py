"""Torch-checkpoint interop: load the reference's .pth checkpoints into
flax param trees (SURVEY.md §7.3 "torch-checkpoint interop" — lets the
94.82%-SA pretrained A-FAN ResNet-56s checkpoint, `README.md:46`, validate
eval parity before training parity).

Layout conversions:
* conv weights OIHW → HWIO;
* linear weights (out, in) → (in, out);
* BatchNorm weight/bias → scale/bias params; running_mean/var →
  batch_stats.

The restore is overlap-tolerant like the reference's partial state-dict
load (`Detection/model.py:200-217`): unknown keys are skipped and the
matched fraction is reported.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def torch_state_dict_to_numpy(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint (CPU) into {name: np.ndarray}. Accepts both
    bare state dicts and the reference's wrapper dicts
    ({'state_dict': ...} / {'model_state': ...})."""
    import torch  # cpu build available in this image
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model_state", "model_state_dict"):
            if key in obj:
                obj = obj[key]
                break
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def convert_conv(w: np.ndarray) -> np.ndarray:
    """torch conv OIHW → flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_linear(w: np.ndarray) -> np.ndarray:
    """torch linear (out, in) → flax (in, out)."""
    return np.transpose(w, (1, 0))


def _bn(sd: Dict[str, np.ndarray], prefix: str):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def load_torch_resnet_s(path: str, num_blocks=(9, 9, 9)
                        ) -> Tuple[Dict[str, Any], Dict[str, Any], float]:
    """Convert a reference `Classification/resnet_s.py` checkpoint into
    (params, batch_stats, matched_fraction) for :class:`ResNetS`.

    Reference module indices (`resnet_s.py:100-112`): 0 normalize, 1 conv,
    2 bn, 3 relu, 4..(4+sum(blocks)-1) BasicBlocks, then pool/flatten/
    linear at the end; the eta vector is the top-level param ``w``.
    """
    sd = torch_state_dict_to_numpy(path)
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    n_blocks = sum(num_blocks)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    matched = total = 0

    def take(fn, *keys):
        nonlocal matched, total
        total += 1
        if all(k in sd for k in keys):
            matched += 1
            return fn(*[sd[k] for k in keys])
        return None

    conv0 = take(convert_conv, "sequential_model.1.weight")
    if conv0 is not None:
        params["conv0"] = {"kernel": conv0}
    if "sequential_model.2.weight" in sd:
        p, s = _bn(sd, "sequential_model.2")
        params["bn0"], stats["bn0"] = p, s
        matched += 1
    total += 1

    for b in range(n_blocks):
        idx = 4 + b
        blk_p: Dict[str, Any] = {}
        blk_s: Dict[str, Any] = {}
        for conv_name in ("conv1", "conv2"):
            k = f"sequential_model.{idx}.{conv_name}.weight"
            total += 1
            if k in sd:
                blk_p[conv_name] = {"kernel": convert_conv(sd[k])}
                matched += 1
        for bn_name in ("bn1", "bn2"):
            prefix = f"sequential_model.{idx}.{bn_name}"
            total += 1
            if f"{prefix}.weight" in sd:
                p, s = _bn(sd, prefix)
                blk_p[bn_name], blk_s[bn_name] = p, s
                matched += 1
        if blk_p:
            params[f"blocks_{b}"] = blk_p
            stats[f"blocks_{b}"] = blk_s

    fc_idx = 4 + n_blocks + 2  # after pool+flatten
    wk = f"sequential_model.{fc_idx}.weight"
    bk = f"sequential_model.{fc_idx}.bias"
    total += 1
    if wk in sd:
        params["fc"] = {"kernel": convert_linear(sd[wk]), "bias": sd[bk]}
        matched += 1
    total += 1
    if "w" in sd:
        params["w"] = sd["w"]
        matched += 1

    import jax.numpy as jnp
    params = _to_jnp(params)
    stats = _to_jnp(stats)
    return params, stats, matched / max(total, 1)


def _to_jnp(tree):
    import jax
    import jax.numpy as jnp
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), tree)


def resnet_s_params_to_torch_sd(params: Dict[str, Any],
                                stats: Dict[str, Any],
                                num_blocks=(9, 9, 9)
                                ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`load_torch_resnet_s`: export a flax ResNetS tree
    to the reference's `sequential_model.*` torch layout (for
    reference-compatible checkpoints and round-trip eval-parity tests)."""
    out: Dict[str, np.ndarray] = {}

    def put_bn(prefix, p, s):
        out[f"{prefix}.weight"] = np.asarray(p["scale"])
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
        out[f"{prefix}.running_mean"] = np.asarray(s["mean"])
        out[f"{prefix}.running_var"] = np.asarray(s["var"])

    out["sequential_model.1.weight"] = np.transpose(
        np.asarray(params["conv0"]["kernel"]), (3, 2, 0, 1))
    put_bn("sequential_model.2", params["bn0"], stats["bn0"])
    n_blocks = sum(num_blocks)
    for b in range(n_blocks):
        idx = 4 + b
        blk_p, blk_s = params[f"blocks_{b}"], stats[f"blocks_{b}"]
        for conv in ("conv1", "conv2"):
            out[f"sequential_model.{idx}.{conv}.weight"] = np.transpose(
                np.asarray(blk_p[conv]["kernel"]), (3, 2, 0, 1))
        for bn in ("bn1", "bn2"):
            put_bn(f"sequential_model.{idx}.{bn}", blk_p[bn], blk_s[bn])
    fc_idx = 4 + n_blocks + 2
    out[f"sequential_model.{fc_idx}.weight"] = np.transpose(
        np.asarray(params["fc"]["kernel"]), (1, 0))
    out[f"sequential_model.{fc_idx}.bias"] = np.asarray(params["fc"]["bias"])
    if "w" in params:
        out["w"] = np.asarray(params["w"])
    return out
