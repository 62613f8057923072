"""DeepLabV3/V3+ heads with aspp/concat tap points — TPU-native port of
`Segmentation/network/_deeplab.py`.

Structure parity: ASPP with 4 conv branches (1x1 + three dilated 3x3) +
image pooling, 5*256→256 projection with dropout 0.1 (`:163-192`);
DeepLabHeadV3Plus projects the low-level feature to 48ch, upsamples the
ASPP output to its size, concatenates (304ch) and classifies (`:28-80`);
the head exposes the same 5 forward modes (None / aspp_head / aspp_tail /
concat_head / concat_tail) as explicit methods.

NHWC layout; bilinear resizes use half-pixel centers
(= torch align_corners=False).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

kaiming_in = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def resize_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """F.interpolate(mode='bilinear', align_corners=False) parity."""
    return jax.image.resize(x, (x.shape[0], size[0], size[1], x.shape[-1]),
                            method="bilinear")


class AtrousSeparableConv(nn.Module):
    """Depthwise (with dilation) + pointwise conv — the reference's
    AtrousSeparableConvolution (`_deeplab.py:115-139`), selected by
    ``convert_to_separable_conv`` when ``--separable_conv`` is set."""
    features: int
    kernel: int = 3
    dilation: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel // 2) * self.dilation
        ch_in = x.shape[-1]
        x = nn.Conv(ch_in, (self.kernel, self.kernel), padding=pad,
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=ch_in, use_bias=self.use_bias,
                    dtype=self.dtype, kernel_init=kaiming_in,
                    name="depthwise")(x)
        return nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                       dtype=self.dtype, kernel_init=kaiming_in,
                       name="pointwise")(x)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    bn_momentum: float = 0.99
    separable: bool = False   # --separable_conv: k>1 convs go depthwise
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel // 2) * self.dilation
        if self.separable and self.kernel > 1:
            x = AtrousSeparableConv(self.features, self.kernel,
                                    self.dilation, dtype=self.dtype,
                                    name="conv")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        padding=pad,
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False, dtype=self.dtype,
                        kernel_init=kaiming_in, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (`_deeplab.py:163-192`)."""
    atrous_rates: Sequence[int] = (12, 24, 36)
    out_channels: int = 256
    bn_momentum: float = 0.99
    separable: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rng=None):
        r1, r2, r3 = self.atrous_rates
        branches = [
            ConvBNReLU(self.out_channels, 1, bn_momentum=self.bn_momentum,
                       dtype=self.dtype, name="b0")(x, train),
            ConvBNReLU(self.out_channels, 3, r1, self.bn_momentum,
                       self.separable, self.dtype, name="b1")(x, train),
            ConvBNReLU(self.out_channels, 3, r2, self.bn_momentum,
                       self.separable, self.dtype, name="b2")(x, train),
            ConvBNReLU(self.out_channels, 3, r3, self.bn_momentum,
                       self.separable, self.dtype, name="b3")(x, train),
        ]
        # image pooling: global mean → 1x1 conv-bn-relu → broadcast back
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvBNReLU(self.out_channels, 1,
                            bn_momentum=self.bn_momentum, dtype=self.dtype,
                            name="pool")(pooled, train)
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], x.shape[1], x.shape[2], self.out_channels))
        branches.append(pooled)
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNReLU(self.out_channels, 1, bn_momentum=self.bn_momentum,
                       dtype=self.dtype, name="project")(y, train)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        return y


class Classifier3x3(nn.Module):
    """conv3x3-bn-relu + 1x1 logits (`_deeplab.py:39-44`)."""
    num_classes: int
    hidden: int = 256
    bn_momentum: float = 0.99
    separable: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.hidden, 3, bn_momentum=self.bn_momentum,
                       separable=self.separable, dtype=self.dtype,
                       name="conv")(x, train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       kernel_init=kaiming_in, name="logits")(x)


class DeepLabHeadV3Plus(nn.Module):
    """The V3+ decoder with its two SD tap points (`_deeplab.py:28-80`)."""
    num_classes: int
    aspp_dilate: Sequence[int] = (12, 24, 36)
    bn_momentum: float = 0.99
    separable: bool = False   # convert_to_separable_conv parity
    dtype: Any = jnp.float32

    def setup(self):
        self.project = ConvBNReLU(48, 1, bn_momentum=self.bn_momentum,
                                  dtype=self.dtype, name="project")
        self.aspp = ASPP(self.aspp_dilate, bn_momentum=self.bn_momentum,
                         separable=self.separable, dtype=self.dtype,
                         name="aspp")
        self.classifier = Classifier3x3(self.num_classes,
                                        bn_momentum=self.bn_momentum,
                                        separable=self.separable,
                                        dtype=self.dtype, name="classifier")

    def _concat(self, low_level, aspp_out, train):
        low = self.project(low_level, train)
        up = resize_bilinear(aspp_out, (low.shape[1], low.shape[2]))
        return jnp.concatenate([low, up], axis=-1)   # 48 + 256 = 304

    def __call__(self, out, low_level, train: bool = False):
        """return_type=None (`:49-54`)."""
        return self.classifier(
            self._concat(low_level, self.aspp(out, train), train), train)

    def aspp_head(self, out, train: bool = False):
        """`:56-59` — the 'aspp' SD tap feature."""
        return self.aspp(out, train)

    def aspp_tail(self, adv_aspp, low_level, train: bool = False):
        """`:61-66` — classify from an adversarial aspp feature."""
        return self.classifier(self._concat(low_level, adv_aspp, train),
                               train)

    def concat_head(self, out, low_level, train: bool = False):
        """`:68-74` — the 'concat' SD tap feature (304ch)."""
        return self._concat(low_level, self.aspp(out, train), train)

    def concat_tail(self, adv_concat, train: bool = False):
        """`:76-79`."""
        return self.classifier(adv_concat, train)


class DeepLabHead(nn.Module):
    """Plain V3 head: ASPP + classifier, no low-level branch
    (`_deeplab.py:93-114`). Tap points: 'aspp' only."""
    num_classes: int
    aspp_dilate: Sequence[int] = (12, 24, 36)
    bn_momentum: float = 0.99
    separable: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.aspp = ASPP(self.aspp_dilate, bn_momentum=self.bn_momentum,
                         separable=self.separable, dtype=self.dtype,
                         name="aspp")
        self.classifier = Classifier3x3(self.num_classes,
                                        bn_momentum=self.bn_momentum,
                                        separable=self.separable,
                                        dtype=self.dtype, name="classifier")

    def __call__(self, out, low_level=None, train: bool = False):
        return self.classifier(self.aspp(out, train), train)

    def aspp_head(self, out, train: bool = False):
        return self.aspp(out, train)

    def aspp_tail(self, adv_aspp, low_level=None, train: bool = False):
        return self.classifier(adv_aspp, train)
