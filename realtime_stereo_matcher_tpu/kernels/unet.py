"""MobileStereoNetV3's U-Net pyramid extractor on the fused conv kernels.

The U-Net (models/stereo_net.py UNetFeatureExtractor; reference
model/mobile_stereo_net_v3.py:193-246) is plain bias convs + leaky ReLU(0.2)
-- no BatchNorm -- over a 32-channel pyramid.  At 720p its two per-view
passes cost 28 ms of the 47 ms v3 fast path (benchmarks/v3_profile.py): the
3x3 convolutions at full/half/quarter resolution are exactly the
lane-starved C=32 shape the fused Pallas conv (kernels/conv3x3.py) runs ~4x
faster than XLA.

Execution split per level (plan built once from the Flax params):

* XLA: the 3->32 stem conv, the k4s2 TF-SAME downsamplers, the 1/8-res
  bottleneck stack (too small to pay kernel setup + its height breaks the
  tile-divisor invariant), the k2s2 up-projections (re-expressed as one
  einsum + pixel shuffle -- each output pixel has exactly one tap) and the
  1x1 skip-mix convs.
* Pallas kernels (leaky-ReLU epilogue): every plain 3x3 conv at 1/4, 1/2 and
  full resolution -- one flat-layout fold per level, 1-2 fused convs, unfold.

``fast_unet`` reproduces ``UNetFeatureExtractor.apply`` (same pyramid,
coarse -> fine) for batch-1 NHWC inputs at kernel-compatible padded shapes
(models/fast_infer.py _alignment_pad); parity is pinned by
tests/test_kernel_unet.py.

MEASURED OUTCOME (720p, v5e, 2026-08-21) and why this is NOT wired into
models/fast_infer.py yet: one view costs 17.8 ms here vs 15.8 ms/view in the
batch-2 XLA pass.  The kernel convs themselves win 4x (full-res fold + 2
fused convs + unfold: 1.7 ms vs ~7 ms XLA), but the XLA glue between levels
dominates: the stem (1.5 ms), each k4s2 downsampler (1.9 ms at 1/2), the
up-projection pixel interleave (3.5 ms at full res -- pure relayout; dot,
einsum and stack-reshape formulations all measure 3.5-4.4 ms) and the 1x1
skip-mix (1.35 ms as a reshape-dot, 4 ms as an XLA conv).  The profitable
next step is keeping the entire U-Net in the flat lane-folded layout
(fold once, express k4s2 / 2x-up / concat-mix as lane-block matmuls, unfold
once); until then the XLA batch-2 extractor stays the production path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from realtime_stereo_matcher_tpu.kernels import conv3x3 as k3

LEAK = 0.2


@dataclasses.dataclass(frozen=True)
class KConv:
    """One fused kernel conv: folded blocks + bias epilogue."""

    blocks: jnp.ndarray     # (6, 128, 128) split-window fold
    scale: jnp.ndarray      # (128,) f32
    bias: jnp.ndarray       # (128,) f32
    phase_in: int


@dataclasses.dataclass(frozen=True)
class UNetPlan:
    conv0_w: jnp.ndarray                 # (3, 3, 3, 32)
    conv0_b: jnp.ndarray
    down: tuple                          # per level: (k4_w, k4_b, convs)
    #   convs: tuple[KConv, ...] (kernel) or tuple of (w, b) (XLA, 1/8 level)
    up: tuple                            # per level: (ct_w, ct_b, mix_w,
    #   mix_b, kconvs)
    down_factor: int


def _kconv(params, name, phase_in):
    w = np.asarray(params[name]["kernel"], np.float32)
    blocks = k3.fold_conv3x3_split_weights(w, dilation=1, phase_in=phase_in,
                                           c_in_pad=32, c_out_pad=32)
    scale, bias = k3.plain_scale_bias(
        jnp.asarray(params[name]["bias"], jnp.float32), w.shape[-1], 32)
    return KConv(blocks, scale, bias, phase_in)


def build_unet_plan(params, down_factor: int = 3) -> UNetPlan:
    """Fold a UNetFeatureExtractor param subtree into the execution plan.

    Module naming (flax auto-order, models/stereo_net.py:146-185):
    Conv_0 stem; per down level i: Conv_{k} k4s2 then 1 (or 3 at the
    bottleneck) 3x3 convs; per up level: ConvTranspose_j, 1x1 mix, two 3x3.
    """
    assert down_factor == 3, "plan mirrors the v3 config (down_factor=3)"
    p = params
    down = []
    # level 1 (1/2): Conv_1 k4s2 + Conv_2; level 2 (1/4): Conv_3 + Conv_4
    for k4, c3 in ((("Conv_1"), ("Conv_2",)), (("Conv_3"), ("Conv_4",))):
        down.append((
            jnp.asarray(p[k4]["kernel"], jnp.float32),
            jnp.asarray(p[k4]["bias"], jnp.float32),
            tuple(_kconv(p, n, 0) for n in c3),
        ))
    # bottleneck (1/8): Conv_5 k4s2 + Conv_6..8 in XLA
    down.append((
        jnp.asarray(p["Conv_5"]["kernel"], jnp.float32),
        jnp.asarray(p["Conv_5"]["bias"], jnp.float32),
        tuple((jnp.asarray(p[n]["kernel"], jnp.float32),
               jnp.asarray(p[n]["bias"], jnp.float32))
              for n in ("Conv_6", "Conv_7", "Conv_8")),
    ))

    up = []
    for j, (ct, mix, ca, cb) in enumerate((
            ("ConvTranspose_0", "Conv_9", "Conv_10", "Conv_11"),
            ("ConvTranspose_1", "Conv_12", "Conv_13", "Conv_14"),
            ("ConvTranspose_2", "Conv_15", "Conv_16", "Conv_17"))):
        up.append((
            # flax ConvTranspose places tap (a, b) at output (2i+1-a, 2j+1-b)
            # -- pre-flip so the einsum's direct tap indexing matches
            # (tests/test_kernel_unet.py pins this numerically)
            jnp.asarray(p[ct]["kernel"], jnp.float32)[::-1, ::-1],
            jnp.asarray(p[ct]["bias"], jnp.float32),
            jnp.asarray(p[mix]["kernel"], jnp.float32),
            jnp.asarray(p[mix]["bias"], jnp.float32),
            (_kconv(p, ca, 0), _kconv(p, cb, 2)),
        ))
    return UNetPlan(
        jnp.asarray(p["Conv_0"]["kernel"], jnp.float32),
        jnp.asarray(p["Conv_0"]["bias"], jnp.float32),
        tuple(down), tuple(up), down_factor)


def _leaky(x):
    return jnp.maximum(x, 0) + jnp.asarray(LEAK, x.dtype) * jnp.minimum(x, 0)


def _conv(x, w, b, *, strides=(1, 1), padding):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _leaky(y + b.astype(x.dtype))


def _upsample2x(x, w, b):
    """flax nn.ConvTranspose(k=2, s=2, 'VALID') == one einsum + pixel
    shuffle: every output pixel has exactly one (a, b) tap."""
    bsz, h, wd, c = x.shape
    y = jnp.einsum("bhwc,ijco->bhiwjo", x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    y = y.astype(x.dtype).reshape(bsz, 2 * h, 2 * wd, w.shape[-1])
    return _leaky(y + b.astype(x.dtype))


def _run_kconvs(x, kconvs):
    """Fold once, run the fused convs (leaky epilogue), unfold."""
    b, h, w, c = x.shape
    assert b == 1, "kernel path is the batch-1 latency path"
    xf = k3.to_flat(x, 32)
    phase = 0
    for kc in kconvs:
        assert kc.phase_in == phase, (kc.phase_in, phase)
        xf = k3.fused_conv3x3_flat(xf, kc.blocks, kc.scale, kc.bias,
                                   dilation=1, relu=LEAK, phase_in=phase)
        phase = 2 - phase
    return k3.from_flat(xf, h, w, c, 32, phase=phase)


def fast_unet(x: jnp.ndarray, plan: UNetPlan, *, dtype=jnp.bfloat16):
    """UNetFeatureExtractor forward (batch 1) -> pyramid [coarse..full]."""
    x = x.astype(dtype)
    y = _conv(x, plan.conv0_w, plan.conv0_b, padding=((1, 1), (1, 1)))
    down = [y]
    for i, (k4w, k4b, convs) in enumerate(plan.down):
        y = _conv(down[-1], k4w, k4b, strides=(2, 2), padding="SAME")
        if convs and isinstance(convs[0], KConv):
            y = _run_kconvs(y, convs)
        else:  # bottleneck level: XLA convs
            for w, b in convs:
                y = _conv(y, w, b, padding=((1, 1), (1, 1)))
        down.append(y)

    up = [down[-1]]
    for j, (ctw, ctb, mixw, mixb, kconvs) in enumerate(plan.up):
        y = _upsample2x(up[-1], ctw, ctb)
        y = jnp.concatenate([y, down[plan.down_factor - 1 - j]], axis=-1)
        y = _conv(y, mixw, mixb, padding="VALID")
        y = _run_kconvs(y, kconvs)
        up.append(y)
    return up
