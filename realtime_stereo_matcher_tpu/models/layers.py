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

import jax
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


class GroupedBatchNorm(nn.Module):
    """BatchNorm over ``groups`` independent sub-batches stacked along axis 0.

    ``x`` is (G*b, ..., C); each group of ``b`` consecutive images is
    normalized by its OWN batch statistics, and the running stats receive the
    groups' updates *sequentially* in group order (closed form:
    ``r' = m^G r + sum_g m^(G-1-g) (1-m) batch_g``).  With G=1 this is
    exactly ``nn.BatchNorm``.

    This makes one batched pass numerically equivalent in train mode (within
    float rounding -- the folded ``x*s + b`` affine rounds differently from
    flax's ``(x-mean)*inv*scale + bias``; pinned at rtol 2e-5 by
    tests/test_model_v4.py) to applying
    the same module G times on the sub-batches in sequence -- the pattern the
    reference uses for its siamese extractors (e.g. reference
    mobile_stereo_net_v4.py:434-441 runs feature_extraction on left then
    right, updating each BatchNorm twice).  Batching the two passes halves
    the XLA op count without changing training dynamics.

    Parameter/stat tree matches ``nn.BatchNorm`` (scale/bias + mean/var), so
    it is a drop-in replacement under the same module name.
    """

    groups: int = 2
    use_running_average: bool = False
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        # call-time override mirrors nn.BatchNorm's -- train/freeze.py's BN
        # interceptor relies on it
        if use_running_average is None:
            use_running_average = self.use_running_average
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        dt = self.dtype or x.dtype
        g = self.groups

        if use_running_average:
            mu = jnp.asarray(ra_mean.value, jnp.float32)
            var = jnp.asarray(ra_var.value, jnp.float32)
            inv = jax.lax.rsqrt(var + self.epsilon)
            s = (jnp.asarray(scale, jnp.float32) * inv).astype(dt)
            b = (jnp.asarray(bias, jnp.float32) - mu * jnp.asarray(
                scale, jnp.float32) * inv).astype(dt)
            return x.astype(dt) * s + b

        # the group split only exists in train mode; eval above is a plain
        # running-stats affine, valid for any batch (e.g. per-view batch-1
        # inference passes through a bn_groups=2 module)
        assert x.shape[0] % g == 0, (x.shape, g)
        xg = x.reshape(g, -1, *x.shape[1:])          # (G, b, ..., C)
        red = tuple(range(1, xg.ndim - 1))
        xf = xg.astype(jnp.float32)
        mu = jnp.mean(xf, axis=red)                  # (G, C)
        var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mu)
        if not self.is_initializing():
            m = self.momentum
            w = m ** jnp.arange(g - 1, -1, -1, dtype=jnp.float32)  # (G,)
            upd = (1.0 - m) * jnp.einsum("g,gc->c", w, mu)
            ra_mean.value = m ** g * jnp.asarray(ra_mean.value,
                                                 jnp.float32) + upd
            upd_v = (1.0 - m) * jnp.einsum("g,gc->c", w, var)
            ra_var.value = m ** g * jnp.asarray(ra_var.value,
                                                jnp.float32) + upd_v
        inv = jax.lax.rsqrt(var + self.epsilon)      # (G, C)
        s = (jnp.asarray(scale, jnp.float32)[None] * inv)
        b = (jnp.asarray(bias, jnp.float32)[None]
             - mu * jnp.asarray(scale, jnp.float32)[None] * inv)
        bshape = (g,) + (1,) * (xg.ndim - 2) + (x.shape[-1],)
        out = xg.astype(dt) * s.reshape(bshape).astype(dt) \
            + b.reshape(bshape).astype(dt)
        return out.reshape(x.shape)


class ConvBN(nn.Module):
    """Conv (2D or 3D) + BatchNorm + optional activation.

    The workhorse for the reference's ``conv_3x3`` / ``convbn`` /
    ``cost_filter`` stacks (reference model/mobile_stereo_net.py:30-43,103-117,
    model/mobile_stereo_net_v4.py:208-220).

    ``bn_groups > 1``: the leading batch axis carries that many independent
    sub-batches (e.g. a siamese extractor's left/right stacked) -- BatchNorm
    runs as :class:`GroupedBatchNorm` with per-group statistics and
    sequential running updates, keeping train-mode numerics identical to
    separate per-view passes while the convs run batched.
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
    bn_groups: int = 1
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
            if self.bn_groups > 1:
                x = GroupedBatchNorm(
                    groups=self.bn_groups,
                    use_running_average=not train,
                    momentum=BN_MOMENTUM,
                    epsilon=BN_EPS,
                    dtype=self.dtype,
                    name="BatchNorm_0",
                )(x)
            else:
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
    bn_groups: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.in_features * self.expanse_ratio)
        use_res = self.stride == 1 and self.in_features == self.features
        pad = self.dilation

        y = x
        if self.expanse_ratio != 1:
            y = ConvBN(hidden, kernel_size=(1, 1), padding="VALID", act=relu6,
                       bn_groups=self.bn_groups, dtype=self.dtype)(y, train)
        y = ConvBN(
            hidden,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=torch_pad(pad),
            dilation=(self.dilation, self.dilation),
            groups=hidden,
            act=relu6,
            bn_groups=self.bn_groups,
            dtype=self.dtype,
        )(y, train)
        y = ConvBN(self.features, kernel_size=(1, 1), padding="VALID", act=None,
                   bn_groups=self.bn_groups, dtype=self.dtype)(y, train)
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
    bn_groups: int = 1
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
            bn_groups=self.bn_groups,
            dtype=self.dtype,
        )(x, train)
        x = ConvBN(self.features, kernel_size=(1, 1), padding="VALID",
                   act=relu6 if self.second_relu else None,
                   bn_groups=self.bn_groups, dtype=self.dtype)(x, train)
        return x


class MobileV1Residual(nn.Module):
    """MobileNetV1-style residual (reference mobile_stereo_net_v4.py:68-88)."""

    in_features: int
    features: int
    stride: int
    downsample: bool
    pad: int
    dilation: int
    bn_groups: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBNDws(self.in_features, self.features, self.stride, self.pad,
                        self.dilation, bn_groups=self.bn_groups,
                        dtype=self.dtype)(x, train)
        out = ConvBNDws(self.features, self.features, 1, self.pad, self.dilation,
                        second_relu=False, bn_groups=self.bn_groups,
                        dtype=self.dtype)(out, train)
        if self.downsample:
            x = ConvBN(self.features, kernel_size=(1, 1),
                       strides=(self.stride, self.stride), padding="VALID",
                       act=None, bn_groups=self.bn_groups,
                       dtype=self.dtype)(x, train)
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
