"""CIFAR ResNet-s (He et al. option-A shortcuts) with static tap points.

Behavioral port of `Classification/resnet_s.py` — the 34-module sequential
CIFAR ResNet-56s with split forward ``forward(x, end_point, start_point)``
(`resnet_s.py:119-121`) and the learnable per-tap eta vector ``w``
(`resnet_s.py:113-114`) — rebuilt TPU-first:

* NHWC activation layout (XLA's native TPU conv layout), params float32 with
  configurable compute dtype (bfloat16 recommended on TPU; the MXU runs
  convolutions in bf16 at full throughput).
* The 34 sequential torch modules map 1:1 onto 34 :class:`StagedModule`
  stages so every reference tap index (``perturb_idx`` 13 default;
  learnable list [4, 8, 11, 14, 18, 21, 24, 28, 31],
  `Classification/main_learnable.py:59`) means the same cut here.

Stage map (identical indices to the reference ``nn.Sequential``):
  0: per-channel input normalization (CIFAR mean/std)
  1: conv3x3(3→16)   2: BN   3: ReLU
  4..12:  9 BasicBlocks @16
  13..21: 9 BasicBlocks @32 (first has stride 2, option-A shortcut)
  22..30: 9 BasicBlocks @64 (first has stride 2, option-A shortcut)
  31: global average pool   32: flatten   33: linear(64→classes)
"""
from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .taps import Stage, StagedModule

# CIFAR-10 statistics, as embedded in the reference model itself
# (`resnet_s.py:104` via advertorch NormalizeByChannelMeanStd).
CIFAR_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR_STD = (0.2470, 0.2435, 0.2616)

# torch kaiming_normal_ parity: untruncated normal, gain^2=2, fan_in
# (`resnet_s.py:43-47` applies it to every Conv2d and Linear).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class NormalizeByChannelMeanStd(nn.Module):
    """Input normalization as a model stage (not a data transform), matching
    the reference's embedding of normalization inside the network so that
    input-space attacks operate on [0,1] pixels."""
    mean: Sequence[float] = CIFAR_MEAN
    std: Sequence[float] = CIFAR_STD

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.mean, dtype=x.dtype)
        std = jnp.asarray(self.std, dtype=x.dtype)
        return (x - mean) / std


class BasicBlock(nn.Module):
    """conv-bn-relu-conv-bn + shortcut, option-A (pad) shortcut when the
    shape changes (`resnet_s.py:55-88`)."""
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_normal, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(1, 1), padding=1,
                    use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_normal, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)

        shortcut = x
        if self.stride != 1 or in_planes != self.planes:
            # Option A: stride-2 spatial subsample + zero-pad channels
            # (`resnet_s.py:68-72`; NCHW there, NHWC here).
            pad = self.planes // 4
            shortcut = x[:, ::2, ::2, :]
            shortcut = jnp.pad(shortcut, ((0, 0), (0, 0), (0, 0), (pad, pad)))
        return nn.relu(y + shortcut)


class ResNetS(StagedModule):
    """The CIFAR ResNet-s family (20/32/44/56/110 = num_blocks 3/5/7/9/18)."""
    num_blocks: Sequence[int] = (9, 9, 9)
    num_classes: int = 10
    init_weight: float = 1.0  # learnable-eta init (`resnet_s.py:113-114`)
    dtype: Any = jnp.float32

    def setup(self):
        blocks = []
        widths = (16, 32, 64)
        for stage_idx, (n, w) in enumerate(zip(self.num_blocks, widths)):
            for b in range(n):
                stride = 2 if (stage_idx > 0 and b == 0) else 1
                blocks.append(BasicBlock(planes=w, stride=stride,
                                         dtype=self.dtype))
        self.blocks = blocks
        self.stem_conv = nn.Conv(16, (3, 3), strides=(1, 1), padding=1,
                                 use_bias=False, dtype=self.dtype,
                                 kernel_init=kaiming_normal, name="conv0")
        self.stem_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name="bn0")
        self.normalize = NormalizeByChannelMeanStd()
        self.linear = nn.Dense(self.num_classes, dtype=self.dtype,
                               kernel_init=kaiming_normal, name="fc")
        # Learnable per-tap eta (`resnet_s.py:113-114`): 9 scalars, filled
        # with init_weight; trained by a separate optimizer in the
        # learnable-eta driver (`main_learnable.py:85-90`).
        self.w = self.param(
            "w", lambda rng: jnp.full((9,), self.init_weight, jnp.float32))

    @property
    def num_stages(self) -> int:
        # 4 stem stages + blocks + pool/flatten/linear. Static (computable
        # outside init/apply, unlike setup()-defined fields).
        return 4 + sum(self.num_blocks) + 3

    def stages(self) -> List[Stage]:
        stages: List[Stage] = [
            lambda x, train: self.normalize(x),
            lambda x, train: self.stem_conv(x),
            lambda x, train: self.stem_bn(x, use_running_average=not train),
            lambda x, train: nn.relu(x),
        ]
        for blk in self.blocks:
            stages.append(lambda x, train, blk=blk: blk(x, train))
        stages += [
            lambda x, train: jnp.mean(x, axis=(1, 2), keepdims=True),  # avgpool
            lambda x, train: x.reshape(x.shape[0], -1),                 # flatten
            lambda x, train: self.linear(x),
        ]
        return stages

    def eta(self):
        """The learnable eta vector (for the learnable-eps trainer)."""
        return self.w


def resnet20(**kw) -> ResNetS:
    return ResNetS(num_blocks=(3, 3, 3), **kw)


def resnet32(**kw) -> ResNetS:
    return ResNetS(num_blocks=(5, 5, 5), **kw)


def resnet44(**kw) -> ResNetS:
    return ResNetS(num_blocks=(7, 7, 7), **kw)


def resnet56(init_weight_eta: float = 1.0, **kw) -> ResNetS:
    """Factory matching `resnet_s.py:123-124`. 34 stages; tap indices are
    interchangeable with the reference's sequential indices."""
    return ResNetS(num_blocks=(9, 9, 9), init_weight=init_weight_eta, **kw)


def resnet110(**kw) -> ResNetS:
    return ResNetS(num_blocks=(18, 18, 18), **kw)


# The 9 tap points of the learnable-eta trainer (`main_learnable.py:59`).
LEARNABLE_TAPS = (4, 8, 11, 14, 18, 21, 24, 28, 31)
