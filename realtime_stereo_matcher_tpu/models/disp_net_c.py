"""MobileDispNetC: DispNetC-style correlation encoder-decoder.

TPU-native (NHWC, Flax) re-design of reference model/mobile_disp_net_c.py:
siamese conv1/conv2 encoder, mean-correlation volume (max_disp/4 levels at
1/4 resolution, built on the MXU as one batched matmul -- see
ops/cost_volume.py:correlation_cost_volume), redirect conv, ResBlock encoder
down to 1/64, and five UpsampleBlocks each emitting an intermediate disparity;
six multi-scale predictions, all bilinearly upsampled to full resolution and
negated (reference forward :337-412).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from realtime_stereo_matcher_tpu.models.layers import (
    BN_EPS,
    BN_MOMENTUM,
    ConvBN,
    leaky_relu_01,
    normalize_images,
    torch_pad,
)
from realtime_stereo_matcher_tpu.ops import (
    correlation_cost_volume,
    pad_to_multiple,
    resize_bilinear,
    soft_argmin,
)


def disparity_regression(corr_volume: jnp.ndarray, max_disp: int):
    """Softmax disparity regression over a (B, D, H, W) correlation volume
    (reference model/mobile_disp_net_c.py:208-220 -- defined there but, like
    here, not used by the DispNetC forward, which regresses disparity through
    its decoder heads instead).

    Returns ``sum_d d * softmax(corr)[d]`` as (B, 1, H, W).
    """
    assert corr_volume.ndim == 4, corr_volume.shape
    assert corr_volume.shape[1] == max_disp, (corr_volume.shape, max_disp)
    return soft_argmin(corr_volume, axis=1, keepdims=True)


class Conv2dBlock(nn.Module):
    """Conv + (BN) + LeakyReLU(0.1) (reference mobile_disp_net_c.py:9-55)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    with_batch_norm: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel_size - 1) // 2
        return ConvBN(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=torch_pad(p),
            use_bn=self.with_batch_norm,
            act=leaky_relu_01,
            dtype=self.dtype,
        )(x, train)


class ResBlockC(nn.Module):
    """conv-BN-ReLU-conv-BN + (1x1 shortcut) + ReLU
    (reference mobile_disp_net_c.py:112-141).  Convs carry bias like torch's
    default Conv2d there."""

    in_features: int
    features: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        if self.stride != 1 or self.features != self.in_features:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               padding="VALID", use_bias=True,
                               dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                    dtype=self.dtype)(residual)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=torch_pad(1), use_bias=True, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=torch_pad(1), use_bias=True,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype)(y)
        return nn.relu(y + residual)


class UpsampleBlock(nn.Module):
    """Deconv + skip-concat + disparity side-predict
    (reference mobile_disp_net_c.py:144-185).

    Returns (disp_map at input res, merged features at 2x res).
    """

    features: int
    with_batch_norm: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, bottom, skip, train: bool = False):
        # ConvTranspose2d(k=4, s=2, p=1): exact 2x upsample
        y = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding="SAME", use_bias=False,
                             dtype=self.dtype)(bottom)
        if self.with_batch_norm:
            y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype)(y)
        y = leaky_relu_01(y)

        disp = nn.Conv(1, (3, 3), padding=torch_pad(1), use_bias=False,
                       dtype=self.dtype)(bottom)
        disp_2x = nn.ConvTranspose(1, (4, 4), strides=(2, 2), padding="SAME",
                                   use_bias=False, dtype=self.dtype)(disp)

        merged = jnp.concatenate([skip, y, disp_2x], axis=-1)
        merged = nn.Conv(self.features, (3, 3), padding=torch_pad(1),
                         use_bias=False, dtype=self.dtype)(merged)
        return disp, merged


def disparity_interpolate(disp, out_hw):
    """Bilinear upsample with width-ratio rescale
    (reference mobile_disp_net_c.py:223-234)."""
    src_w = disp.shape[2]
    if disp.shape[1:3] == tuple(out_hw):
        return disp
    scale = float(out_hw[1]) / src_w
    return resize_bilinear(disp * scale, out_hw)


class MobileDispNetC(nn.Module):
    """Reference model/mobile_disp_net_c.py:237-412.

    forward: (left, right) uint8-range NHWC -> [6 x (B, H, W, 1)] negative
    disparity, coarse to fine.
    """

    hidden_dim: int = 32
    max_disp: int = 192
    with_batch_norm: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, l_img, r_img, train: bool = False):
        hd = self.hidden_dim
        bn = self.with_batch_norm
        down_factor = 6
        align = 2 ** down_factor

        left = normalize_images(l_img, self.dtype)
        right = normalize_images(r_img, self.dtype)
        left, orig_hw = pad_to_multiple(left, align)
        right, _ = pad_to_multiple(right, align)

        conv1 = Conv2dBlock(hd, 7, 2, bn, dtype=self.dtype)
        conv2 = Conv2dBlock(hd * 2, 5, 2, bn, dtype=self.dtype)
        l_conv1 = conv1(left, train)
        r_conv1 = conv1(right, train)
        l_conv2 = conv2(l_conv1, train)
        r_conv2 = conv2(r_conv1, train)

        l_redir = Conv2dBlock(hd, 1, 1, bn, dtype=self.dtype)(l_conv2, train)
        corr = correlation_cost_volume(l_conv2, r_conv2, self.max_disp // 4)
        # (B, D, h, w) -> NHWC channels
        corr = jnp.transpose(corr, (0, 2, 3, 1)).astype(l_redir.dtype)

        x = jnp.concatenate([l_redir, corr], axis=-1)
        x = Conv2dBlock(hd * 4, 5, 2, bn, dtype=self.dtype)(x, train)
        out_conv3 = Conv2dBlock(hd * 4, 3, 1, False, dtype=self.dtype)(x, train)

        out_res4 = ResBlockC(hd * 4, hd * 8, 2, dtype=self.dtype)(out_conv3, train)
        out_res5 = ResBlockC(hd * 8, hd * 16, 2, dtype=self.dtype)(out_res4, train)
        out_res6 = ResBlockC(hd * 16, hd * 32, 2, dtype=self.dtype)(out_res5, train)

        disp06, up5 = UpsampleBlock(hd * 16, bn, dtype=self.dtype)(
            out_res6, out_res5, train)
        disp05, up4 = UpsampleBlock(hd * 8, bn, dtype=self.dtype)(up5, out_res4, train)
        disp04, up3 = UpsampleBlock(hd * 4, bn, dtype=self.dtype)(up4, out_conv3, train)
        disp03, up2 = UpsampleBlock(hd * 2, bn, dtype=self.dtype)(up3, l_conv2, train)
        disp02, up1 = UpsampleBlock(hd, bn, dtype=self.dtype)(up2, l_conv1, train)
        disp01 = nn.Conv(1, (3, 3), padding=torch_pad(1), use_bias=False,
                         dtype=self.dtype)(up1)

        out_hw = left.shape[1:3]
        multi_scale = [disp06, disp05, disp04, disp03, disp02, disp01]
        return [
            -1.0 * disparity_interpolate(d, out_hw)[:, : orig_hw[0], : orig_hw[1], :]
            for d in multi_scale
        ]
