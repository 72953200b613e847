"""MobileStereoNet v1/v2/v3: StereoNet-style coarse-to-fine networks.

TPU-native (NHWC, Flax) re-designs with the same architecture family as the
reference:

* v1 (reference model/mobile_stereo_net.py:90-158): fixed 32-dim encoder at
  1/8 res, 24-level difference cost volume, 5-layer 3D-conv filter,
  soft-argmin, 3 cascaded RGB-guided 2x refinements.
* v2 (reference model/mobile_stereo_net_v2.py:137-232): v1 with parameterized
  dims; refinement additionally sees the right RGB warped by the current
  disparity.
* v3 (reference model/mobile_stereo_net_v3.py:249-336): v2 with a U-Net
  feature pyramid; refinements consume pyramid features instead of RGB.

All three return coarse-to-fine lists of full-resolution **negative**
disparity maps (B, H, W, 1) -- the repo-wide negative-flow convention.

TPU design notes:
* The cost volume is one dense (B, D, H/8, W/8, C) gather (ops/cost_volume.py)
  feeding NDHWC 3D convolutions -- no per-disparity Python loop.
* The final full-res upsample uses *nearest* interpolation ``x * scale``
  exactly like the reference's mode-less ``F.interpolate`` call
  (model/mobile_stereo_net.py:156).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from realtime_stereo_matcher_tpu.models.layers import (
    ConvBN,
    ConvTransposeBN,
    ResBlock,
    conv3x3,
    leaky_relu_02,
    normalize_images,
    torch_pad,
)
from realtime_stereo_matcher_tpu.ops import (
    difference_cost_volume,
    pad_to_multiple,
    resize_bilinear,
    resize_nearest,
    soft_argmin,
    warp_by_flow_map,
    warp_by_flow_map_matmul,
)


class CostFilter3D(nn.Module):
    """Five 3x3x3 Conv3d(+BN+ReLU) layers collapsing C -> 1
    (reference model/mobile_stereo_net.py:103-117).  Input NDHWC."""

    hidden_dim: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, vol, train: bool = False):
        p3 = torch_pad(1, ndim=3)
        for _ in range(4):
            vol = ConvBN(self.hidden_dim, kernel_size=(3, 3, 3), strides=(1, 1, 1),
                         padding=p3, dtype=self.dtype)(vol, train)
        vol = nn.Conv(1, kernel_size=(3, 3, 3), padding=p3, use_bias=True,
                      dtype=self.dtype)(vol)
        return vol[..., 0]  # (B, D, H, W)


class FeatureEncoder(nn.Module):
    """Strided conv encoder: k stride-2 conv3x3+ResBlock stages + final conv
    (reference model/mobile_stereo_net.py:97-101)."""

    hidden_dim: int = 32
    down_factor: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.down_factor):
            x = conv3x3(self.hidden_dim, stride=2, dtype=self.dtype)(x, train)
            x = ResBlock(self.hidden_dim, dtype=self.dtype)(x, train)
        x = nn.Conv(self.hidden_dim, kernel_size=(3, 3), padding=torch_pad(1),
                    use_bias=True, dtype=self.dtype)(x)
        return x


class RefineNet(nn.Module):
    """Dilated-ResBlock refinement: upsample disp 2x, concat guidance, predict
    residual, ReLU (reference model/mobile_stereo_net.py:59-87 /
    _v2.py:99-134 / _v3.py:100-143).

    ``warp_guidance=True`` warps the second guidance map by the upsampled
    disparity before concatenation (v2/v3 behavior).
    """

    hidden_dim: int = 32
    dilations: Sequence[int] = (1, 2, 4, 8, 1, 1)
    warp_guidance: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, disp, l_guide, r_guide=None, train: bool = False):
        h2 = disp.shape[1] * 2
        w2 = disp.shape[2] * 2
        disp = resize_bilinear(disp, (h2, w2)) * 2.0

        if l_guide.shape[1:3] != (h2, w2):
            l_guide = resize_bilinear(l_guide, (h2, w2))
        feats = [disp, l_guide]
        if r_guide is not None:
            if r_guide.shape[1:3] != (h2, w2):
                r_guide = resize_bilinear(r_guide, (h2, w2))
            if self.warp_guidance:
                if r_guide.shape[-1] > 8:
                    # wide guidance (v3's 32ch pyramid): selection-matrix warp
                    # puts the C-dependent work on the MXU; mathematically
                    # identical to the gather path for 1-channel flows
                    # (ops/sampling.py, ~10x fwd+bwd at the full-res level)
                    r_guide = warp_by_flow_map_matmul(r_guide, disp)
                else:
                    r_guide = warp_by_flow_map(r_guide, disp)
            feats.append(r_guide)
        x = jnp.concatenate(feats, axis=-1)

        x = conv3x3(self.hidden_dim, dtype=self.dtype)(x, train)
        for d in self.dilations:
            x = ResBlock(self.hidden_dim, dilation=d, dtype=self.dtype)(x, train)
        x = nn.Conv(1, kernel_size=(3, 3), padding=torch_pad(1), use_bias=True,
                    dtype=self.dtype)(x)
        return nn.relu(disp + x)


class UNetFeatureExtractor(nn.Module):
    """U-Net pyramid encoder (reference model/mobile_stereo_net_v3.py:193-246).

    Returns the up-path pyramid coarse -> fine:
    [1/2^k, ..., 1/2, 1/1] x hidden_dim channels.
    """

    hidden_dims: Sequence[int]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = self.hidden_dims
        down_factor = len(dims) - 1

        down_pyramid = []
        for i in range(down_factor + 1):
            if i == 0:
                x = nn.Conv(dims[0], (3, 3), padding=torch_pad(1), use_bias=True,
                            dtype=self.dtype)(x)
                x = leaky_relu_02(x)
            else:
                # SameConv2d(k=4, s=2) == TF-SAME geometry (reference _v3.py:146-167)
                x = nn.Conv(dims[i], (4, 4), strides=(2, 2), padding="SAME",
                            use_bias=True, dtype=self.dtype)(x)
                x = leaky_relu_02(x)
                n_convs = 3 if i == down_factor else 1
                for _ in range(n_convs):
                    x = nn.Conv(dims[i], (3, 3), padding=torch_pad(1),
                                use_bias=True, dtype=self.dtype)(x)
                    x = leaky_relu_02(x)
            down_pyramid.append(x)

        up_pyramid = [down_pyramid[-1]]
        for i in range(down_factor):
            j = down_factor - i
            y = nn.ConvTranspose(dims[j - 1], (2, 2), strides=(2, 2),
                                 padding="VALID", use_bias=True,
                                 dtype=self.dtype)(up_pyramid[i])
            y = leaky_relu_02(y)
            y = jnp.concatenate([y, down_pyramid[j - 1]], axis=-1)
            y = nn.Conv(dims[j - 1], (1, 1), padding="VALID", use_bias=True,
                        dtype=self.dtype)(y)
            y = leaky_relu_02(y)
            for _ in range(2):
                y = nn.Conv(dims[j - 1], (3, 3), padding=torch_pad(1),
                            use_bias=True, dtype=self.dtype)(y)
                y = leaky_relu_02(y)
            up_pyramid.append(y)
        return up_pyramid


def _coarse_disparity(l_feat, r_feat, max_disp, cost_filter, train):
    """Difference volume -> 3D filter -> soft-argmin (shared v1/v2/v3 core).

    Note: the reference applies softmax directly to the filtered cost (higher
    filtered value = more weight), see model/mobile_stereo_net.py:144-147.
    """
    vol = difference_cost_volume(l_feat, r_feat, max_disp)
    cost = cost_filter(vol, train)  # (B, D, h, w)
    disp = soft_argmin(cost, axis=1)  # (B, h, w)
    return disp[..., None]


def _full_res_nearest(disp, out_hw, orig_hw):
    """Reference full-res upsample: nearest interp of (disp * scale), cropped
    to the pre-pad size (model/mobile_stereo_net.py:154-156)."""
    scale = out_hw[1] / disp.shape[2]
    up = resize_nearest(disp * scale, out_hw)
    return up[:, : orig_hw[0], : orig_hw[1], :]


class MobileStereoNet(nn.Module):
    """v1 -- reference model/mobile_stereo_net.py:90-158.

    forward: (left, right) uint8-range NHWC -> [3 x (B, H, W, 1)] negative
    disparity, coarse to fine.
    """

    down_factor: int = 3
    max_disp: int = 192
    hidden_dim: int = 32
    refine_dilates: Sequence[int] = (1, 2, 4, 8, 1, 1)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left_img, right_img, train: bool = False):
        align = 2 ** self.down_factor
        vol_disp = (self.max_disp + 1) // align

        left = normalize_images(left_img, self.dtype)
        right = normalize_images(right_img, self.dtype)
        left, orig_hw = pad_to_multiple(left, align)
        right, _ = pad_to_multiple(right, align)

        encoder = FeatureEncoder(self.hidden_dim, self.down_factor, dtype=self.dtype)
        lf = encoder(left, train)
        rf = encoder(right, train)

        x = _coarse_disparity(
            lf, rf, vol_disp,
            CostFilter3D(self.hidden_dim, dtype=self.dtype), train)

        multi_scale = []
        out_hw = left.shape[1:3]
        for _ in range(self.down_factor):
            x = RefineNet(self.hidden_dim, self.refine_dilates,
                          dtype=self.dtype)(x, left, train=train)
            multi_scale.append(_full_res_nearest(x, out_hw, orig_hw))
        return [-1.0 * m for m in multi_scale]


class MobileStereoNetV2(nn.Module):
    """v2 -- reference model/mobile_stereo_net_v2.py:137-232: refinement sees
    left RGB and right RGB warped by the current disparity."""

    down_factor: int = 3
    max_disp: int = 192
    refine_dim: int = 7  # 1 disp + 3 left rgb + 3 warped right rgb
    refine_dilates: Sequence[int] = (1, 2, 4, 8, 1, 1)
    hidden_dim: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left_img, right_img, train: bool = False):
        align = 2 ** self.down_factor
        vol_disp = (self.max_disp + 1) // align

        left = normalize_images(left_img, self.dtype)
        right = normalize_images(right_img, self.dtype)
        left, orig_hw = pad_to_multiple(left, align)
        right, _ = pad_to_multiple(right, align)

        encoder = FeatureEncoder(self.hidden_dim, self.down_factor, dtype=self.dtype)
        lf = encoder(left, train)
        rf = encoder(right, train)

        x = _coarse_disparity(
            lf, rf, vol_disp,
            CostFilter3D(self.hidden_dim, dtype=self.dtype), train)

        multi_scale = []
        out_hw = left.shape[1:3]
        for _ in range(self.down_factor):
            x = RefineNet(self.hidden_dim, self.refine_dilates, warp_guidance=True,
                          dtype=self.dtype)(x, left, right, train=train)
            multi_scale.append(_full_res_nearest(x, out_hw, orig_hw))
        return [-1.0 * m for m in multi_scale]


class MobileStereoNetV3(nn.Module):
    """v3 -- reference model/mobile_stereo_net_v3.py:249-336: U-Net pyramid
    features; refinement i consumes pyramid level i+1 of both views."""

    down_factor: int = 3
    max_disp: int = 192
    refine_dilates: Sequence[int] = (1, 2, 4, 8, 1, 1)
    hidden_dim: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left_img, right_img, train: bool = False):
        align = 2 ** self.down_factor
        vol_disp = (self.max_disp + 1) // align

        left = normalize_images(left_img, self.dtype)
        right = normalize_images(right_img, self.dtype)
        left, orig_hw = pad_to_multiple(left, align)
        right, _ = pad_to_multiple(right, align)

        extractor = UNetFeatureExtractor(
            hidden_dims=(self.hidden_dim,) * (self.down_factor + 1),
            dtype=self.dtype)
        l_fmaps = extractor(left, train)
        r_fmaps = extractor(right, train)

        x = _coarse_disparity(
            l_fmaps[0], r_fmaps[0], vol_disp,
            CostFilter3D(self.hidden_dim, dtype=self.dtype), train)

        multi_scale = []
        out_hw = left.shape[1:3]
        for i in range(self.down_factor):
            x = RefineNet(self.hidden_dim, self.refine_dilates, warp_guidance=True,
                          dtype=self.dtype)(x, l_fmaps[i + 1], r_fmaps[i + 1],
                                            train=train)
            multi_scale.append(_full_res_nearest(x, out_hw, orig_hw))
        return [-1.0 * m for m in multi_scale]
