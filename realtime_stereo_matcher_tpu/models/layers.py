"""Shared Flax building blocks for the stereo model zoo.

Geometry conventions match the reference's torch layers (explicit torch-style
symmetric padding where the reference used ``padding=p``; TF-SAME where the
reference implemented SAME itself), so every feature map has the same shape at
every depth as the reference network -- but layouts are NHWC / NDHWC
(channels-last = TPU lane dim) and all code is functional Flax.

BatchNorm: torch ``momentum=0.1`` == flax ``momentum=0.9``; eps 1e-5.  When a
batch axis is sharded with jit-level shardings, the batch statistics reduce
over the *global* batch automatically (XLA inserts the cross-chip psum), which
upgrades the reference's per-replica DataParallel BN to sync-BN.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm defaults
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def torch_pad(p: int | tuple, ndim: int = 2):
    """Explicit symmetric padding matching torch Conv2d/Conv3d padding=p."""
    if isinstance(p, int):
        return tuple((p, p) for _ in range(ndim))
    return tuple((x, x) for x in p)


class ConvBN(nn.Module):
    """Conv (2D or 3D) + BatchNorm + optional activation.

    The workhorse for the reference's ``conv_3x3`` / ``convbn`` /
    ``cost_filter`` stacks (reference model/mobile_stereo_net.py:30-43,103-117,
    model/mobile_stereo_net_v4.py:208-220).
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: str | Sequence = ((1, 1), (1, 1))
    dilation: Sequence[int] | None = None
    groups: int = 1
    use_bn: bool = True
    use_bias: bool = False
    act: Callable | None = nn.relu
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=self.padding,
            kernel_dilation=tuple(self.dilation) if self.dilation else None,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x


def conv3x3(features: int, stride: int = 1, dilation: int = 1, *, act=nn.relu,
            dtype=None) -> ConvBN:
    """Reference ``conv_3x3``: Conv2d(3, s, padding=d, dilation=d) + BN + ReLU."""
    return ConvBN(
        features,
        kernel_size=(3, 3),
        strides=(stride, stride),
        padding=torch_pad(dilation),
        dilation=(dilation, dilation),
        act=act,
        dtype=dtype,
    )


class ResBlock(nn.Module):
    """Two conv3x3(+BN+ReLU) with additive skip (reference
    model/mobile_stereo_net.py:46-56)."""

    features: int
    dilation: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = conv3x3(self.features, dilation=self.dilation, dtype=self.dtype)(x, train)
        y = conv3x3(self.features, dilation=self.dilation, dtype=self.dtype)(y, train)
        return y + x


def leaky_relu_01(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def leaky_relu_02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class MobileV2Residual(nn.Module):
    """MobileNetV2 inverted-residual block (reference
    model/mobile_stereo_net_v4.py:91-148): pw-expand + dw + pw-linear, skip
    when stride==1 and inp==oup."""

    in_features: int
    features: int
    stride: int
    expanse_ratio: int
    dilation: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.in_features * self.expanse_ratio)
        use_res = self.stride == 1 and self.in_features == self.features
        pad = self.dilation

        y = x
        if self.expanse_ratio != 1:
            y = ConvBN(hidden, kernel_size=(1, 1), padding="VALID", act=relu6,
                       dtype=self.dtype)(y, train)
        y = ConvBN(
            hidden,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=torch_pad(pad),
            dilation=(self.dilation, self.dilation),
            groups=hidden,
            act=relu6,
            dtype=self.dtype,
        )(y, train)
        y = ConvBN(self.features, kernel_size=(1, 1), padding="VALID", act=None,
                   dtype=self.dtype)(y, train)
        return x + y if use_res else y


class ConvBNDws(nn.Module):
    """Depthwise-separable conv block (reference mobile_stereo_net_v4.py:26-65):
    dw 3x3 + BN + ReLU6, then pw 1x1 + BN (+ ReLU6 if second_relu)."""

    in_features: int
    features: int
    stride: int
    pad: int
    dilation: int
    second_relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.dilation if self.dilation > 1 else self.pad
        x = ConvBN(
            self.in_features,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=torch_pad(p),
            dilation=(self.dilation, self.dilation),
            groups=self.in_features,
            act=relu6,
            dtype=self.dtype,
        )(x, train)
        x = ConvBN(self.features, kernel_size=(1, 1), padding="VALID",
                   act=relu6 if self.second_relu else None, dtype=self.dtype)(x, train)
        return x


class MobileV1Residual(nn.Module):
    """MobileNetV1-style residual (reference mobile_stereo_net_v4.py:68-88)."""

    in_features: int
    features: int
    stride: int
    downsample: bool
    pad: int
    dilation: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBNDws(self.in_features, self.features, self.stride, self.pad,
                        self.dilation, dtype=self.dtype)(x, train)
        out = ConvBNDws(self.features, self.features, 1, self.pad, self.dilation,
                        second_relu=False, dtype=self.dtype)(out, train)
        if self.downsample:
            x = ConvBN(self.features, kernel_size=(1, 1),
                       strides=(self.stride, self.stride), padding="VALID",
                       act=None, dtype=self.dtype)(x, train)
        return out + x


class ConvTransposeBN(nn.Module):
    """ConvTranspose + optional BN + activation.

    Covers the reference's up-projections: k2s2 (v3 U-Net), k3s2p1op1 (v4
    hourglass), k4s2p1 (DispNetC).  All are exact 2x upsamplers.  Numerically
    verified torch mappings (tests/test_torch_parity.py): k4s2p1 == 'SAME',
    k2s2 == 'VALID', k3s2p1op1 == explicit ((1, 2), (1, 2)) -- torch puts the
    output_padding row/column on the high side, which 'SAME' does not.
    """

    features: int
    kernel_size: Sequence[int] = (4, 4)
    strides: Sequence[int] = (2, 2)
    padding: str | Sequence = "SAME"
    use_bn: bool = True
    use_bias: bool = False
    act: Callable | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


def normalize_images(img: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """[0, 255] -> [-1, 1] (reference model/*.py forward preamble)."""
    x = img.astype(dtype or jnp.float32)
    return 2.0 * (x / 255.0) - 1.0
