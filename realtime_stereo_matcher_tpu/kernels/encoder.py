"""FeatureEncoder on fused Pallas convs (inference path).

The v1/v2 encoder (reference model/mobile_stereo_net.py:97-101) is three
(stride-2 conv3x3 + ResBlock) stages and a head conv -- 10 convolutions whose
first stages run at 360p/720p-adjacent resolutions where XLA's C<=32 spatial
convolution is lane-starved (~3.2 ms for both images at 720p).  This module
runs the whole encoder in the flat lane-folded layout of
:mod:`realtime_stereo_matcher_tpu.kernels.conv3x3`:

* stride-2 convs use the native stride-2 fold (:func:`fold_conv3x3_s2_weights`,
  2 K=256 matmuls per row tap over input tile pairs) -- 2.7x fewer MXU units
  than stride-1-then-subsample;
* ResBlock convs use the 6-matmul split-window fold, with the residual added
  in the epilogue;
* activations stay flat across all 10 convs: fold once at the image, unfold
  once at the 1/8 feature map.

Weight folding happens once at plan-build time (numpy, outside jit).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from realtime_stereo_matcher_tpu.kernels import conv3x3 as k3
from realtime_stereo_matcher_tpu.kernels.refine_stack import _fold_convbn


@dataclasses.dataclass(frozen=True)
class S2Spec:
    """One fused stride-2 conv (weights in the (6, 256, 128) s2 fold)."""

    blocks: jnp.ndarray
    scale: jnp.ndarray
    bias: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class EncoderPlan:
    """down_factor x (stride-2 conv, ResBlock conv pair) + head conv."""

    stages: tuple       # tuple[(S2Spec, ConvSpec, ConvSpec), ...]
    head: object        # ConvSpec (relu=False, plain bias epilogue)


def build_encoder_plan(params, batch_stats, down_factor: int = 3,
                       c_pad: int = 32) -> EncoderPlan:
    """Fold FeatureEncoder Flax params (models/stereo_net.py:71-88) into a
    kernel plan.  Layout: ConvBN_i (stride-2), ResBlock_i (ConvBN_0/1) per
    stage, Conv_0 head."""
    from realtime_stereo_matcher_tpu.kernels.refine_stack import ConvSpec

    def fold_bn(sub_p, sub_s):
        return k3.fold_bn_scale_bias(
            jnp.asarray(sub_p["scale"], jnp.float32),
            jnp.asarray(sub_p["bias"], jnp.float32),
            jnp.asarray(sub_s["mean"], jnp.float32),
            jnp.asarray(sub_s["var"], jnp.float32),
            1e-5, np.asarray(sub_p["scale"]).shape[0], c_pad)

    stages = []
    for i in range(down_factor):
        cb_p = params[f"ConvBN_{i}"]
        cb_s = batch_stats[f"ConvBN_{i}"]
        w = np.asarray(cb_p["Conv_0"]["kernel"], np.float32)
        blocks = k3.fold_conv3x3_s2_weights(w, c_in_pad=c_pad, c_out_pad=c_pad)
        scale, bias = fold_bn(cb_p["BatchNorm_0"], cb_s["BatchNorm_0"])
        down = S2Spec(blocks, scale, bias)

        rb_p = params[f"ResBlock_{i}"]
        rb_s = batch_stats[f"ResBlock_{i}"]
        rb = []
        phase = 0
        for ci in range(2):
            blk, sc, bi = _fold_convbn(
                rb_p[f"ConvBN_{ci}"]["Conv_0"],
                rb_p[f"ConvBN_{ci}"]["BatchNorm_0"],
                rb_s[f"ConvBN_{ci}"]["BatchNorm_0"], 1, c_pad, phase)
            # residual (history index 0 = the ResBlock input) after conv 2;
            # two split-window convs net zero phase flips, so the phases match
            rb.append(ConvSpec(blk, sc, bi, 1, True,
                               0 if ci == 1 else None, phase))
            phase = 2 - phase
        stages.append((down, rb[0], rb[1]))

    head_p = params["Conv_0"]
    w = np.asarray(head_p["kernel"], np.float32)
    blocks = k3.fold_conv3x3_split_weights(w, dilation=1, phase_in=0,
                                           c_in_pad=c_pad, c_out_pad=c_pad)
    scale, bias = k3.plain_scale_bias(
        jnp.asarray(head_p["bias"], jnp.float32)
        if head_p.get("bias") is not None else None, w.shape[-1], c_pad)
    head = ConvSpec(blocks, scale, bias, 1, False, None, 0)
    return EncoderPlan(tuple(stages), head)


def fast_encoder(img, plan: EncoderPlan, *, c_out: int = 32,
                 dtype=jnp.bfloat16):
    """Kernel-path FeatureEncoder: (1, H, W, C<=32) normalized image ->
    (1, H/2^k, W/2^k, c_out) features.  Requires W % 64 == 0 at every level
    (i.e. W % (64 << k)) and H % 2^k == 0."""
    h, w = img.shape[1:3]
    xf = k3.to_flat(img.astype(dtype), 32)
    for down, rb1, rb2 in plan.stages:
        xf = k3.fused_conv3x3_s2_flat(xf, down.blocks, down.scale, down.bias)
        x0 = xf
        xf = k3.fused_conv3x3_flat(xf, rb1.blocks, rb1.scale, rb1.bias,
                                   phase_in=0)
        xf = k3.fused_conv3x3_flat(xf, rb2.blocks, rb2.scale, rb2.bias,
                                   residual=x0, phase_in=2)
        h, w = h // 2, w // 2
    xf = k3.fused_conv3x3_flat(xf, plan.head.blocks, plan.head.scale,
                               plan.head.bias, relu=False, phase_in=0)
    return k3.from_flat(xf, h, w, c_out, 32, phase=2)
