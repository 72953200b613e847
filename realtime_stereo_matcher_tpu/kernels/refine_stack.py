"""RefineNet cascade on the fused Pallas conv3x3 kernel (inference path).

The reference's RefineNet (model/mobile_stereo_net.py:59-87 and the v2/v3
variants) is 1 entry conv + 6 dilated ResBlocks (2 convs each) + 1 head conv
-- 14 3x3 convs at up to full 720p resolution, the dominant inference cost.
This module runs that stack entirely in the flat lane-folded layout of
:mod:`realtime_stereo_matcher_tpu.kernels.conv3x3`: pad/fold once, 14 fused
conv+BN+ReLU(+residual) kernels back-to-back, unfold once.

Precision: the disparity state is carried in float32 outside the stack (bf16
would quantize sub-pixel disparity at ~0.8px granularity); inside the stack
activations are bf16 features with f32 matmul accumulation, and the final
``relu(disp + delta)`` runs in f32.

Weight folding happens **once at plan-build time** (numpy, outside jit) via
:func:`build_refine_plan`; the jitted forward closes over the folded blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from realtime_stereo_matcher_tpu.kernels import conv3x3 as k3
from realtime_stereo_matcher_tpu.ops import (
    resize_bilinear,
    warp_by_flow_map,
    warp_by_flow_map_banded,
    warp_by_flow_map_matmul_banded,
)

LANES = k3.LANES


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    """One fused conv in the stack (weights already lane-folded)."""

    blocks: jnp.ndarray       # (9|6, 128, 128) from the 9-block / split fold
    scale: jnp.ndarray        # (128,) f32 epilogue scale (BN folded)
    bias: jnp.ndarray         # (128,) f32 epilogue bias
    dilation: int
    relu: bool
    res_from: int | None      # history index whose activation is added post-ReLU
    phase_in: int = 0         # pixel phase of the input activation (0 or 2)


@dataclasses.dataclass(frozen=True)
class RefinePlan:
    """Execution plan for one RefineNet: optional entry-conv handling (when
    the concat input exceeds the 32-channel lane fold, e.g. v3's 65ch) plus
    the lane-folded kernel stack.

    v3's 65-ch entry (disp ‖ l_fmap32 ‖ warped_r_fmap32) is split by input
    channel -- conv(concat(a, b, c)) == conv_a(a) + conv_b(b) + conv_c(c) --
    so the two 32-ch parts run on the fused kernel (BN scale pre-folded into
    the weights, summed via the linear residual input) and only the 1-ch
    disparity tap stays as a 9-shift vector op; ``entry_w`` is the XLA
    fallback for non-(1+2*32) widths."""

    specs: tuple               # tuple[ConvSpec, ...]
    entry_w: jnp.ndarray | None = None      # (3, 3, C_in, 32) HWIO
    entry_scale: jnp.ndarray | None = None  # (32,) eval-BN folded
    entry_bias: jnp.ndarray | None = None   # (32,)
    final_phase: int = 0       # pixel phase of the head conv's output
    entry_l: jnp.ndarray | None = None      # (6, 128, 128) split fold, l part
    entry_r: jnp.ndarray | None = None      # (6, 128, 128) split fold, r part
    entry_d: jnp.ndarray | None = None      # (3, 3, 32) disp-tap weights
    entry_b128: jnp.ndarray | None = None   # (128,) folded BN bias, tiled


def _fold_convbn(conv_p, bn_p, bn_s, dilation, c_pad=32, phase_in=0):
    """Flax ConvBN params -> (blocks, scale, bias) with eval-mode BN folded.

    Dilation <= 2 uses the 6-matmul split-window fold (flips the pixel phase,
    see kernels/conv3x3.py); larger dilations the 9-block fold."""
    w = np.asarray(conv_p["kernel"], np.float32)  # HWIO
    c_out = w.shape[-1]
    if dilation <= 2:
        blocks = k3.fold_conv3x3_split_weights(
            w, dilation=dilation, phase_in=phase_in,
            c_in_pad=c_pad, c_out_pad=c_pad)
    else:
        blocks = k3.fold_conv3x3_weights(w, dilation=dilation,
                                         c_in_pad=c_pad, c_out_pad=c_pad)
    scale, bias = k3.fold_bn_scale_bias(
        jnp.asarray(bn_p["scale"], jnp.float32),
        jnp.asarray(bn_p["bias"], jnp.float32),
        jnp.asarray(bn_s["mean"], jnp.float32),
        jnp.asarray(bn_s["var"], jnp.float32),
        1e-5, c_out, c_pad)
    return blocks, scale, bias


def _fold_bn_eval(bn_p, bn_s):
    """Eval-mode BN -> unfolded (C,) scale/bias for an XLA epilogue."""
    scale = np.asarray(bn_p["scale"], np.float32) / np.sqrt(
        np.asarray(bn_s["var"], np.float32) + 1e-5)
    bias = (np.asarray(bn_p["bias"], np.float32)
            - np.asarray(bn_s["mean"], np.float32) * scale)
    return jnp.asarray(scale), jnp.asarray(bias)


def build_refine_plan(params, batch_stats,
                      dilations: Sequence[int] = (1, 2, 4, 8, 1, 1),
                      c_pad: int = 32, entry_channels: int = 32,
                      entry_split: bool = False) -> RefinePlan:
    """Fold one RefineNet's Flax params into a kernel execution plan.

    ``params`` / ``batch_stats`` are the ``RefineNet_i`` sub-trees of the
    MobileStereoNet variables.  Layout (from models/stereo_net.py:102-124):
    ConvBN_0 entry conv, ResBlock_0..N-1 (ConvBN_0, ConvBN_1 each), Conv_0
    head.  ``res_from`` indexes the activation *history*: history[j] is the
    output of specs[j-1] (history[0] is the stack input).

    ``entry_split``: the caller asserts the entry conv's input layout is
    exactly disp(1) ‖ l_fmap(c_pad) ‖ r_fmap(c_pad) — v3's refine entry —
    and the conv is split into two fused c_pad-channel kernel convs plus a
    9-shift disparity tap (fast_refine's entry_l branch).  This is an
    explicit opt-in, NOT inferred from channel count, because a future
    1+2*c_pad-channel entry with a different concat layout would be
    silently mis-split.  Otherwise, if ``entry_channels`` exceeds the lane
    fold, the entry conv is kept as an XLA conv with eval-folded BN.
    """
    specs: list[ConvSpec] = []
    entry_w = entry_scale = entry_bias = None
    entry_l = entry_r = entry_d = entry_b128 = None
    phase = 0                    # pixel phase entering the next conv
    hist_phase = [0]             # phase of each history entry

    def push(spec, phase_out):
        specs.append(spec)
        hist_phase.append(phase_out)

    if entry_split:
        assert entry_channels == 1 + 2 * c_pad, (entry_channels, c_pad)
        # v3 kernel-entry split (see RefinePlan docstring): BN scale folds
        # into the per-part weights, BN bias rides the second kernel conv
        w = np.asarray(params["ConvBN_0"]["Conv_0"]["kernel"], np.float32)
        scale, bias = _fold_bn_eval(params["ConvBN_0"]["BatchNorm_0"],
                                    batch_stats["ConvBN_0"]["BatchNorm_0"])
        s = np.asarray(scale, np.float32)
        entry_l = k3.fold_conv3x3_split_weights(
            w[:, :, 1:1 + c_pad] * s, dilation=1, phase_in=0,
            c_in_pad=c_pad, c_out_pad=c_pad)
        entry_r = k3.fold_conv3x3_split_weights(
            w[:, :, 1 + c_pad:] * s, dilation=1, phase_in=0,
            c_in_pad=c_pad, c_out_pad=c_pad)
        entry_d = jnp.asarray(w[:, :, 0] * s)              # (3, 3, 32)
        entry_b128 = jnp.asarray(np.tile(np.asarray(bias, np.float32), 4))
        phase = 2                # split-fold entry output phase
        hist_phase = [2]
    elif entry_channels > c_pad:
        entry_w = jnp.asarray(params["ConvBN_0"]["Conv_0"]["kernel"],
                              jnp.float32)
        entry_scale, entry_bias = _fold_bn_eval(
            params["ConvBN_0"]["BatchNorm_0"],
            batch_stats["ConvBN_0"]["BatchNorm_0"])
    else:
        blocks, scale, bias = _fold_convbn(
            params["ConvBN_0"]["Conv_0"], params["ConvBN_0"]["BatchNorm_0"],
            batch_stats["ConvBN_0"]["BatchNorm_0"], 1, c_pad, phase)
        push(ConvSpec(blocks, scale, bias, 1, True, None, phase), 2 - phase)
        phase = 2 - phase

    for bi, d in enumerate(dilations):
        rb_p = params[f"ResBlock_{bi}"]
        rb_s = batch_stats[f"ResBlock_{bi}"]
        block_in = len(specs)  # history index of this ResBlock's input
        for ci in range(2):
            blocks, scale, bias = _fold_convbn(
                rb_p[f"ConvBN_{ci}"]["Conv_0"],
                rb_p[f"ConvBN_{ci}"]["BatchNorm_0"],
                rb_s[f"ConvBN_{ci}"]["BatchNorm_0"], d, c_pad, phase)
            res = block_in if ci == 1 else None
            phase_out = 2 - phase if d <= 2 else phase
            if res is not None:
                # the residual is added at the conv's output phase; a
                # ResBlock always nets zero phase flips, so this holds
                assert hist_phase[res] == phase_out, (res, d)
            push(ConvSpec(blocks, scale, bias, d, True, res, phase),
                 phase_out)
            phase = phase_out

    head = params["Conv_0"]
    w = np.asarray(head["kernel"], np.float32)
    blocks = k3.fold_conv3x3_split_weights(w, dilation=1, phase_in=phase,
                                           c_in_pad=c_pad, c_out_pad=c_pad)
    scale, bias = k3.plain_scale_bias(
        jnp.asarray(head.get("bias"), jnp.float32)
        if head.get("bias") is not None else None, w.shape[-1], c_pad)
    push(ConvSpec(blocks, scale, bias, 1, False, None, phase), 2 - phase)
    return RefinePlan(tuple(specs), entry_w, entry_scale, entry_bias,
                      final_phase=2 - phase, entry_l=entry_l,
                      entry_r=entry_r, entry_d=entry_d,
                      entry_b128=entry_b128)


def _disp_tap(disp, wd, dtype):
    """1-channel 3x3 SAME conv as 9 shifted scalar broadcasts:
    (1, H, W, 1) f32 disp x (3, 3, 32) weights -> (1, H, W, 32)."""
    h, w = disp.shape[1:3]
    dp = jnp.pad(disp[..., 0].astype(dtype), ((0, 0), (1, 1), (1, 1)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            part = dp[:, dy:dy + h, dx:dx + w, None] * wd[dy, dx].astype(dtype)
            acc = part if acc is None else acc + part
    return acc


def run_refine_stack(xf: jnp.ndarray, specs: Sequence[ConvSpec]) -> jnp.ndarray:
    """Run the folded conv plan on a flat activation; returns the head's flat
    output (channel 0 of each fold position is the residual-disparity delta)."""
    history = [xf]
    for spec in specs:
        res = history[spec.res_from] if spec.res_from is not None else None
        y = k3.fused_conv3x3_flat(
            history[-1], spec.blocks, spec.scale, spec.bias,
            dilation=spec.dilation, relu=spec.relu, residual=res,
            phase_in=spec.phase_in)
        history.append(y)
    return history[-1]


def fast_refine(disp, l_guide, r_guide, plan: RefinePlan, *,
                warp_guidance: bool = False, dtype=jnp.bfloat16,
                max_shift: int = 192):
    """Kernel-path replacement for RefineNet.__call__
    (models/stereo_net.py:102-124): 2x-upsample disp, concat guidance
    (optionally warping the right guide), run the conv stack, ReLU-add.

    ``disp`` (B=1, h, w, 1) float32; returns (B=1, 2h, 2w, 1) float32.
    """
    h2, w2 = disp.shape[1] * 2, disp.shape[2] * 2
    disp = resize_bilinear(disp.astype(jnp.float32), (h2, w2)) * 2.0

    if l_guide.shape[1:3] != (h2, w2):
        l_guide = resize_bilinear(l_guide, (h2, w2))
    if r_guide is not None:
        if r_guide.shape[1:3] != (h2, w2):
            r_guide = resize_bilinear(r_guide, (h2, w2))
        if warp_guidance:
            # the flow stays f32: both warps upcast it internally, and a
            # bf16 cast here would quantize the sample position to whole
            # pixels near max_disp (bf16 ulp is 1.0 in [128, 256))
            if r_guide.shape[-1] <= 8 and max_shift <= 64:
                # banded static-shift warp: pure shifted selects, but the
                # unrolled band scales with shifts x C -- it only wins for
                # narrow guidance at SMALL shift bounds (v2's RGB at the
                # coarse levels).  At 720p/max_shift 208 it cost ~10 ms of
                # v2's 21 ms path (benchmarks/v2_profile.py round 5)
                r_guide = warp_by_flow_map_banded(
                    r_guide.astype(dtype), disp, max_shift)
            else:
                # banded selection-matrix warp -- MXU contraction over a
                # static max_shift-wide tap band instead of the full W
                # (ops/sampling.py; same out-of-band-is-zero contract as the
                # banded warp above).  Cost is channel-independent (the C
                # axis rides the matmul), so it serves v3's 32ch pyramid AND
                # v2's RGB at large shift bounds equally
                r_guide = warp_by_flow_map_matmul_banded(
                    r_guide.astype(dtype), disp, max_shift)

    if plan.entry_l is not None:
        # kernel entry split (v3 65ch): two fused 32-ch convs summed via the
        # linear residual input + the 9-shift disparity tap, ReLU on the
        # flat canvas (phase 2)
        ones = jnp.ones((LANES,), jnp.float32)
        zeros = jnp.zeros((LANES,), jnp.float32)
        lf = k3.to_flat(l_guide.astype(dtype), 32)
        rf = k3.to_flat(r_guide.astype(dtype), 32)
        p1 = k3.fused_conv3x3_flat(lf, plan.entry_l, ones, zeros,
                                   dilation=1, relu=False, phase_in=0)
        p2 = k3.fused_conv3x3_flat(rf, plan.entry_r, ones, plan.entry_b128,
                                   dilation=1, relu=False, residual=p1,
                                   phase_in=0)
        d = _disp_tap(disp, plan.entry_d, dtype)
        xf = jnp.maximum(p2 + k3.to_flat(d, 32, phase=2), 0).astype(dtype)
    else:
        feats = [disp, l_guide] if r_guide is None else [disp, l_guide,
                                                         r_guide]
        x = jnp.concatenate([f.astype(dtype) for f in feats], axis=-1)
        if plan.entry_w is not None:
            # wide entry conv stays in XLA with eval-folded BN + ReLU
            y = jax.lax.conv_general_dilated(
                x, plan.entry_w.astype(dtype), (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.maximum(
                y * plan.entry_scale.astype(dtype)
                + plan.entry_bias.astype(dtype), 0)
        else:
            c_in = x.shape[-1]
            assert c_in <= 32, f"refine input {c_in}ch exceeds the 32-ch fold"
        xf = k3.to_flat(x, 32)
    yf = run_refine_stack(xf, plan.specs)
    delta = k3.from_flat(yf, h2, w2, 1, 32,
                         phase=plan.final_phase).astype(jnp.float32)
    return jnp.maximum(disp + delta, 0.0)
