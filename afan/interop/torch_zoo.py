"""Torchvision-layout ResNet + full-model (FasterRCNN / DeepLab) torch
checkpoint converters.

The reference NEVER trains detection/segmentation from scratch: it
overlap-loads ImageNet zoo weights into the backbone
(`Detection/backbone/resnet50_ori.py:281-293`, conv1..layer1 frozen per
`Detection/backbone/resnet50.py:36-38`;
`Segmentation/network/backbone/resnet.py:307-319`) and restores full-model
checkpoints by partial key overlap (`Detection/model.py:200-217`). These
converters are the TPU-side of that contract: a torchvision-layout
``state_dict`` (from the zoo, or from a reference training run) becomes a
flax ``(params, batch_stats)`` pair for :class:`afan.models.resnet.
ResNetTorso`, :class:`afan.models.frcnn.FasterRCNN`, or
:class:`afan.models.deeplab.modeling.DeepLab`; callers merge with
:func:`afan.train.checkpoint.overlap_restore`, which reports the matched
fraction exactly like the reference's "model weights are loaded" log.

Layout conversions (same as `torch_ckpt.py`): conv OIHW→HWIO, linear
(out,in)→(in,out), BN weight/bias→scale/bias + running stats→batch_stats.
With ``frozen_bn=True`` (detection) every BatchNorm lives one level deeper
(``.../bn1/bn/...``) because :class:`FrozenBatchNorm` wraps it.

An inverse (:func:`resnet_params_to_torch_sd`) exists so tests can
round-trip a randomly-initialized flax tree through the torch layout and
assert matched-fraction == 1.0 without torchvision (absent in this image).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .torch_ckpt import (convert_conv, convert_linear,
                         torch_state_dict_to_numpy)

_BN_LEAVES = {"weight": ("scale", "params"), "bias": ("bias", "params"),
              "running_mean": ("mean", "stats"),
              "running_var": ("var", "stats")}


def _set(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _route_resnet(key: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """torchvision resnet state-dict key → (flax path inside the torso,
    kind). kind: 'conv' | 'bn/params' | 'bn/stats'. None = not a torso
    tensor (fc head, normalize buffers, num_batches_tracked)."""
    parts = key.split(".")
    if key.endswith("num_batches_tracked"):
        return None
    if parts[0] in ("fc", "normalize"):
        return None
    if parts[0] == "conv1" and parts[1] == "weight":
        return ("conv1", "kernel"), "conv"
    if parts[0] == "bn1":
        leaf, coll = _BN_LEAVES[parts[1]]
        return ("bn1", leaf), f"bn/{coll}"
    m = re.fullmatch(r"layer([1-4])", parts[0])
    if m:
        base = (parts[0], f"block{int(parts[1])}")
        sub = parts[2]
        if sub.startswith("conv") and parts[3] == "weight":
            return base + (sub, "kernel"), "conv"
        if sub.startswith("bn"):
            leaf, coll = _BN_LEAVES[parts[3]]
            return base + (sub, leaf), f"bn/{coll}"
        if sub == "downsample":
            if parts[3] == "0" and parts[4] == "weight":
                return base + ("ds_conv", "kernel"), "conv"
            if parts[3] == "1":
                leaf, coll = _BN_LEAVES[parts[4]]
                return base + ("ds_bn", leaf), f"bn/{coll}"
    return None


def _place_resnet(params: Dict, stats: Dict, path: Tuple[str, ...],
                  kind: str, value: np.ndarray, frozen_bn: bool) -> None:
    if kind == "conv":
        _set(params, path, convert_conv(value))
        return
    coll = params if kind.endswith("params") else stats
    if frozen_bn:  # FrozenBatchNorm nests the actual BatchNorm as 'bn'
        path = path[:-1] + ("bn", path[-1])
    _set(coll, path, value)


def convert_torchvision_resnet(sd: Dict[str, np.ndarray],
                               frozen_bn: bool = True
                               ) -> Tuple[Dict, Dict, List[str]]:
    """torchvision resnet18/50/101 state dict → (params, batch_stats,
    skipped_keys) for :class:`ResNetTorso`. ``skipped_keys`` lists source
    tensors with no torso destination (fc head etc.)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    skipped: List[str] = []
    for k, v in sd.items():
        routed = _route_resnet(k)
        if routed is None:
            if not k.endswith("num_batches_tracked"):
                skipped.append(k)
            continue
        path, kind = routed
        _place_resnet(params, stats, path, kind, v, frozen_bn)
    return params, stats, skipped


def load_torchvision_backbone(path: str, frozen_bn: bool = True):
    """Load a torchvision resnet .pth from disk → (params, batch_stats,
    skipped). The detection/segmentation CLIs merge the result into the
    model's ``backbone`` subtree via ``overlap_restore`` (mirrors
    `resnet50_ori.py:281-293`)."""
    sd = torch_state_dict_to_numpy(path)
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    return convert_torchvision_resnet(sd, frozen_bn)


# ---------------------------------------------------------------------------
# inverse (flax → torch layout), used by round-trip tests and for exporting
# checkpoints back to reference-compatible layout
# ---------------------------------------------------------------------------

def _flatten_tree(tree: Dict, prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten_tree(v, prefix + (str(k),))
        else:
            yield prefix + (str(k),), v


def resnet_params_to_torch_sd(params: Dict, stats: Dict,
                              frozen_bn: bool = True
                              ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torchvision_resnet`: a ResNetTorso
    params/batch_stats pair → torchvision-layout numpy state dict."""
    out: Dict[str, np.ndarray] = {}

    def torch_name(path: Tuple[str, ...]) -> Optional[Tuple[str, str]]:
        # strip the FrozenBatchNorm 'bn' nesting level
        if frozen_bn and "bn" in path:
            path = tuple(p for p in path if p != "bn")
        leaf = path[-1]
        mods = path[:-1]
        names = []
        for m in mods:
            bm = re.fullmatch(r"block(\d+)", m)
            if bm:
                names.append(bm.group(1))
            elif m == "ds_conv":
                names.append("downsample.0")
            elif m == "ds_bn":
                names.append("downsample.1")
            else:
                names.append(m)
        return ".".join(names), leaf

    bn_inv = {"scale": "weight", "bias": "bias", "mean": "running_mean",
              "var": "running_var"}
    for path, v in _flatten_tree(params):
        mod, leaf = torch_name(path)
        v = np.asarray(v)
        if leaf == "kernel":
            out[f"{mod}.weight"] = np.transpose(v, (3, 2, 0, 1))
        else:
            out[f"{mod}.{bn_inv.get(leaf, leaf)}"] = v
    for path, v in _flatten_tree(stats):
        mod, leaf = torch_name(path)
        out[f"{mod}.{bn_inv[leaf]}"] = np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# full-model converters
# ---------------------------------------------------------------------------

def convert_torch_frcnn(sd: Dict[str, np.ndarray]
                        ) -> Tuple[Dict, Dict, List[str]]:
    """Reference `Detection/model.py` checkpoint → (params, batch_stats,
    skipped) for :class:`FasterRCNN`.

    Reference module names: ``features.*`` (the resnet*_ori torso — its
    layer4 doubles as the ROI 'hidden', stored again as
    ``detection.hidden.*`` because both attributes alias one module),
    ``rpn._features.0`` (3x3 trunk conv), ``rpn._anchor_objectness`` /
    ``rpn._anchor_transformer`` (1x1 heads), ``detection._proposal_class``
    / ``detection._proposal_transformer`` (linears).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    skipped: List[str] = []
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    conv_heads = {
        "rpn._features.0": ("rpn", "trunk"),
        "rpn._anchor_objectness": ("rpn", "objectness"),
        "rpn._anchor_transformer": ("rpn", "transformer"),
    }
    linear_heads = {
        "detection._proposal_class": ("roi_pred", "proposal_class"),
        "detection._proposal_transformer": ("roi_pred",
                                            "proposal_transformer"),
    }
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.startswith("features."):
            routed = _route_resnet(k[len("features."):])
            if routed is None:
                skipped.append(k)
                continue
            path, kind = routed
            _place_resnet(params.setdefault("backbone", {}),
                          stats.setdefault("backbone", {}),
                          path, kind, v, frozen_bn=True)
            continue
        if k.startswith("detection.hidden."):
            # alias of features.layer4 (same module object in the
            # reference); the features.* copy already covers it
            continue
        mod, leaf = k.rsplit(".", 1)
        if mod in conv_heads:
            path = conv_heads[mod]
            if leaf == "weight":
                _set(params, path + ("kernel",), convert_conv(v))
            else:
                _set(params, path + ("bias",), v)
            continue
        if mod in linear_heads:
            path = linear_heads[mod]
            if leaf == "weight":
                _set(params, path + ("kernel",), convert_linear(v))
            else:
                _set(params, path + ("bias",), v)
            continue
        skipped.append(k)
    return params, stats, skipped


def _convbnrelu(params, stats, sd, torch_conv, torch_bn, path):
    """Place a reference Sequential(conv, bn, relu) into a ConvBNReLU
    module at ``path`` (trainable BN — segmentation heads)."""
    placed = 0
    wk = f"{torch_conv}.weight"
    if wk in sd:
        _set(params, path + ("conv", "kernel"), convert_conv(sd[wk]))
        placed += 1
    if f"{torch_conv}.bias" in sd:
        _set(params, path + ("conv", "bias"), sd[f"{torch_conv}.bias"])
        placed += 1
    for tleaf, (fleaf, coll) in _BN_LEAVES.items():
        k = f"{torch_bn}.{tleaf}"
        if k in sd:
            tree = params if coll == "params" else stats
            _set(tree, path + ("bn", fleaf), sd[k])
            placed += 1
    return placed


def convert_torch_deeplab(sd: Dict[str, np.ndarray], plus: bool = True
                          ) -> Tuple[Dict, Dict, List[str]]:
    """Reference `Segmentation/network` DeepLabV3(+) checkpoint →
    (params, batch_stats, skipped) for :class:`DeepLab`.

    Reference names (`network/_deeplab.py`): V3+ classifier =
    {project.0/1 conv+bn, aspp.convs.{0..4} + aspp.project, classifier.0/1
    conv+bn + classifier.3 logits}; V3 = classifier.{0 aspp, 1/2 conv+bn,
    4 logits}. Separable-conv checkpoints (`convert_to_separable_conv`)
    are not handled (documented divergence — PARITY.md).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    skipped: List[str] = []
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    consumed = set()
    bparams = params.setdefault("backbone", {})
    bstats = stats.setdefault("backbone", {})
    for k, v in sd.items():
        if not k.startswith("backbone."):
            continue
        consumed.add(k)
        routed = _route_resnet(k[len("backbone."):])
        if routed is None:
            if not k.endswith("num_batches_tracked"):
                skipped.append(k)
            continue
        path, kind = routed
        _place_resnet(bparams, bstats, path, kind, v, frozen_bn=False)

    cls = ("classifier",)
    if plus:
        aspp_prefix = "classifier.aspp"
        final_prefix = "classifier.classifier"
        _convbnrelu(params, stats, sd, "classifier.project.0",
                    "classifier.project.1", cls + ("project",))
        for k in list(sd):
            if k.startswith("classifier.project."):
                consumed.add(k)
    else:
        # V3: Sequential(ASPP, conv3x3, bn, relu, conv1x1)
        aspp_prefix = "classifier.classifier.0"
        final_prefix = None
        _convbnrelu(params, stats, sd, "classifier.classifier.1",
                    "classifier.classifier.2", cls + ("classifier", "conv"))
        wk = "classifier.classifier.4.weight"
        if wk in sd:
            _set(params, cls + ("classifier", "logits", "kernel"),
                 convert_conv(sd[wk]))
            bk = "classifier.classifier.4.bias"
            if bk in sd:
                _set(params, cls + ("classifier", "logits", "bias"), sd[bk])
        for k in list(sd):
            if k.startswith("classifier.classifier."):
                consumed.add(k)

    # ASPP: convs.0 (1x1), convs.1-3 (atrous), convs.4 (pooling: 1=conv,
    # 2=bn), project
    branch_of = {0: "b0", 1: "b1", 2: "b2", 3: "b3"}
    for i, name in branch_of.items():
        _convbnrelu(params, stats, sd, f"{aspp_prefix}.convs.{i}.0",
                    f"{aspp_prefix}.convs.{i}.1", cls + ("aspp", name))
    _convbnrelu(params, stats, sd, f"{aspp_prefix}.convs.4.1",
                f"{aspp_prefix}.convs.4.2", cls + ("aspp", "pool"))
    _convbnrelu(params, stats, sd, f"{aspp_prefix}.project.0",
                f"{aspp_prefix}.project.1", cls + ("aspp", "project"))
    for k in list(sd):
        if k.startswith(f"{aspp_prefix}."):
            consumed.add(k)

    if plus and final_prefix:
        _convbnrelu(params, stats, sd, f"{final_prefix}.0",
                    f"{final_prefix}.1", cls + ("classifier", "conv"))
        wk = f"{final_prefix}.3.weight"
        if wk in sd:
            _set(params, cls + ("classifier", "logits", "kernel"),
                 convert_conv(sd[wk]))
            bk = f"{final_prefix}.3.bias"
            if bk in sd:
                _set(params, cls + ("classifier", "logits", "bias"), sd[bk])
        for k in list(sd):
            if k.startswith(f"{final_prefix}."):
                consumed.add(k)

    for k in sd:
        if k not in consumed and not k.endswith("num_batches_tracked"):
            skipped.append(k)
    return params, stats, skipped


def load_torch_frcnn(path: str):
    """Disk loader wrapping :func:`convert_torch_frcnn`."""
    return convert_torch_frcnn(torch_state_dict_to_numpy(path))


def load_torch_deeplab(path: str, plus: bool = True):
    """Disk loader wrapping :func:`convert_torch_deeplab`."""
    return convert_torch_deeplab(torch_state_dict_to_numpy(path), plus)
