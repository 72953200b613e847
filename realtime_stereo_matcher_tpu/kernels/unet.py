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

HISTORY: this first, level-by-level kernelization measured NET-SLOWER at
720p (17.8 ms/view vs 15.8 in the batch-2 XLA pass) -- the fused convs win
4x but the NHWC glue between levels (stem 1.5 ms, k4s2 1.9 ms at 1/2,
up-projection interleave 3.5 ms, 1x1 skip-mix 1.4-4 ms -- all layout-bound
relayouts at C<=64) dominated.  Round 4 executed the fix written here:
``fast_unet_flat`` / ``fast_unet_flat_pair`` below keep the ENTIRE U-Net in
the flat lane-folded layout (glue as full-lane block matmuls, k4s2 as a
stride-2 Pallas kernel, one batch-2 stem), measuring ~5.5 ms/view -- the
production v3 extractor in models/fast_infer.py.  ``fast_unet`` is kept as
the stepping-stone reference implementation its parity test covers.
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


def _kconv9(params, name, phase_in):
    """Phase-preserving 9-block fold (used to end the bottleneck stack at
    phase 0 for the flat up-projection)."""
    w = np.asarray(params[name]["kernel"], np.float32)
    blocks = k3.fold_conv3x3_weights(w, dilation=1, c_in_pad=32,
                                     c_out_pad=32)
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


# ---------------------------------------------------------------------------
# Flat-lane U-Net: the whole extractor stays in the lane-folded layout.
#
# The measured failure mode of ``fast_unet`` above was the XLA glue between
# kernel convs: every inter-level op (k4s2 downsampler, 2x up-projection,
# 1x1 skip-mix) ran in NHWC at C=32 and paid 1.4-3.5 ms of pure relayout at
# 720p.  Here the glue itself is expressed ON the flat layout
# (rows, W_tiles, 128) as dense [N,128]@[128,128] lane-block matmuls -- the
# lane dimension is full, so XLA emits straight MXU matmuls with no
# relayout.  Only the 3->32 stem and the tiny 1/8-res bottleneck remain in
# NHWC.  Weight blocks are built once (numpy) from the Flax params; the
# per-(tap, tile-offset) mapping generalizes fold_conv3x3_weights to
# stride-2 4x4 and transpose-2x2 geometry, including the 2-pixel phase shift
# the split-window 3x3 kernels introduce (phase-2 skips are mixed in with
# two half-filled blocks at tile offsets {0, +1}).
# ---------------------------------------------------------------------------


def _to_flat_phase2(x, c_pad):
    """Phase-2 fold (px x at flat position x+2), the input phase of
    :func:`conv3x3.fused_conv4x4_s2_flat`."""
    return k3.to_flat(x, c_pad, phase=2)


def _fold_up2x_blocks(w_flipped):
    """Pre-flipped (2, 2, 32, 32) ConvTranspose weights -> U[qr][e].

    Output pixel X = 4(2s+e)+p at full-lane tile 2s+e reads input tile s
    lane-pixel j = (4e+p)//2 with column tap p%2 and row tap qr (output row
    2r'+qr from input row r').
    """
    w = np.asarray(w_flipped, np.float32)
    out = [[None, None], [None, None]]
    for qr in range(2):
        for e in range(2):
            blk = np.zeros((k3.LANES, k3.LANES), np.float32)
            for p in range(4):
                j = (4 * e + p) // 2
                blk[j * 32:j * 32 + 32, p * 32:p * 32 + 32] = w[qr, p % 2]
            out[qr][e] = jnp.asarray(blk)
    return tuple(tuple(r) for r in out)


def _fold_mix_blocks(mix_w, skip_phase: int):
    """(1, 1, 64, 32) skip-mix weights -> (Mu, [(tile_off, Ms), ...]).

    Channels 0:32 see the (phase-0) upsampled features, 32:64 the skip.  A
    phase-``skip_phase`` skip stores image px x at flat position x+phase, so
    output lane-pixel p reads skip lane-pixel p+phase -- split across tile
    offsets 0 and +1 when the phase pushes it past lane-pixel 3.
    """
    w = np.asarray(mix_w, np.float32)[0, 0]            # (64, 32)
    mu, ms = w[:32], w[32:]
    blk_u = np.zeros((k3.LANES, k3.LANES), np.float32)
    for p in range(4):
        blk_u[p * 32:p * 32 + 32, p * 32:p * 32 + 32] = mu
    skips = []
    for off in (0, 1):
        blk = np.zeros((k3.LANES, k3.LANES), np.float32)
        hit = False
        for p in range(4):
            j = p + skip_phase - 4 * off
            if 0 <= j <= 3:
                blk[j * 32:j * 32 + 32, p * 32:p * 32 + 32] = ms
                hit = True
        if hit:
            skips.append((off, jnp.asarray(blk)))
    return jnp.asarray(blk_u), tuple(skips)


def _bias128(b):
    """(32,) bias -> (128,) lane bias (tiled over the 4 folded pixels)."""
    return jnp.asarray(np.tile(np.asarray(b, np.float32), 4))


def _canvas(core):
    """(H, T, 128) core -> flat canvas with zero halos (to_flat geometry)."""
    return jnp.pad(core, ((k3.PADR, k3.PADR),
                          (k3.PADC_TILES, k3.SPARE_TILES + k3.PADC_TILES),
                          (0, 0)))


def _blk_mm(x, blk):
    return jnp.einsum("htk,kl->htl", x, blk.astype(x.dtype),
                      preferred_element_type=jnp.float32)


def _up2x_flat(xf, ublocks, bias, h_in, t_in):
    """2x up-projection (ConvTranspose k2s2) on a flat canvas -> phase-0
    core at (2*h_in, 2*t_in)."""
    core = xf[k3.PADR:k3.PADR + h_in, k3.PADC_TILES:k3.PADC_TILES + t_in]
    rows = []
    for qr in range(2):
        cols = [_blk_mm(core, ublocks[qr][e]) for e in range(2)]
        rows.append(jnp.stack(cols, axis=2).reshape(h_in, 2 * t_in, k3.LANES))
    out = jnp.stack(rows, axis=1).reshape(2 * h_in, 2 * t_in, k3.LANES)
    return _leaky(out + bias).astype(xf.dtype)


def _mix_flat(up_core, skip_canvas, blk_u, skip_blocks, bias, h, t):
    """concat(up, skip) + 1x1 mix as two (or three) lane matmuls."""
    acc = _blk_mm(up_core, blk_u)
    for off, blk in skip_blocks:
        c0 = k3.PADC_TILES + off
        sl = skip_canvas[k3.PADR:k3.PADR + h, c0:c0 + t]
        acc = acc + _blk_mm(sl, blk)
    return _leaky(acc + bias).astype(up_core.dtype)


@dataclasses.dataclass(frozen=True)
class FlatUNetPlan:
    base: UNetPlan
    k4_blocks: tuple      # per down level: ((8, 256, 128), scale, bias)
    bott: tuple           # 1/8 bottleneck KConvs (split, split, 9-block)
    up_blocks: tuple      # ALL up levels: (U, ubias128, Mu,
    #                       skip_blocks, mixbias128)
    stem: KConv = None    # 3->32 stem as a flat split-window conv


def build_unet_flat_plan(params, down_factor: int = 3) -> FlatUNetPlan:
    base = build_unet_plan(params, down_factor)
    # every k4s2 runs the phase-2-input Pallas kernel: the stem is folded at
    # phase 2 (_to_flat_phase2) and Conv_2/Conv_4 are single split-window
    # convs whose output is phase 2
    k4 = []
    for k4w, k4b, _ in base.down:
        k4.append((k3.fold_conv4x4_s2_weights(k4w, 32, 32),
                   *k3.plain_scale_bias(jnp.asarray(k4b, jnp.float32),
                                        k4w.shape[-1], 32)))
    # 1/8 bottleneck fully in kernels; the final 9-block conv keeps phase 0
    # so the flat up-projection reads a phase-0 canvas
    bott = (_kconv(params, "Conv_6", 0), _kconv(params, "Conv_7", 2),
            _kconv9(params, "Conv_8", 0))
    # flat up levels (1/8 -> 1/4 -> 1/2 -> full); every skip is phase 2
    # (down levels after their split conv, the stem via its phase-2 fold)
    ups = []
    for (ctw, ctb, mixw, mixb, _), skip_phase in zip(base.up, (2, 2, 2)):
        mu, sblocks = _fold_mix_blocks(mixw, skip_phase)
        ups.append((_fold_up2x_blocks(ctw), _bias128(ctb), mu, sblocks,
                    _bias128(mixb)))
    # the 3->32 stem as a flat-layout split-window conv (phase 0 -> 2):
    # composing the NHWC stem conv with the canvas fold in one program makes
    # XLA materialize the fold through a conv-chosen layout -- measured
    # +7 ms at 720p (benchmarks/stem_bisect.py).  Folding the *image*
    # (channels zero-padded 3->32) and running the stem on the fused kernel
    # keeps every op in the flat layout.
    stem_w = np.asarray(params["Conv_0"]["kernel"], np.float32)
    stem_blocks = k3.fold_conv3x3_split_weights(
        stem_w, dilation=1, phase_in=0, c_in_pad=32, c_out_pad=32)
    stem_sb = k3.plain_scale_bias(
        jnp.asarray(params["Conv_0"]["bias"], jnp.float32),
        stem_w.shape[-1], 32)
    stem = KConv(stem_blocks, *stem_sb, 0)
    return FlatUNetPlan(base, tuple(k4), bott, tuple(ups), stem)


def _run_kconvs_flat(xf, kconvs):
    """Run fused convs on an already-flat canvas; returns (canvas, phase).

    Split-window KConvs flip the pixel phase (0 <-> 2); 9-block KConvs
    (:func:`_kconv9`) preserve it."""
    phase = 0
    for kc in kconvs:
        assert kc.phase_in == phase, (kc.phase_in, phase)
        xf = k3.fused_conv3x3_flat(xf, kc.blocks, kc.scale, kc.bias,
                                   dilation=1, relu=LEAK, phase_in=phase)
        phase = (2 - phase) if kc.blocks.shape[0] == 6 else phase
    return xf, phase


def _unet_flat_from_stem(s_flat, plan: FlatUNetPlan, h, w):
    """Down + bottleneck + up path from a phase-2 folded stem; returns
    [y8_canvas, (uf, phase) x3] all in the flat layout (phase 0)."""
    base = plan.base
    t = w // 4

    # down path: k4s2 (phase-2 Pallas kernel) + one split-window kernel
    # conv per level
    d1 = k3.fused_conv4x4_s2_flat(s_flat, *plan.k4_blocks[0], relu=LEAK)
    d1, ph = _run_kconvs_flat(d1, base.down[0][2])
    assert ph == 2, ph                  # k4s2 consumes a phase-2 canvas
    d2 = k3.fused_conv4x4_s2_flat(d1, *plan.k4_blocks[1], relu=LEAK)
    d2, ph = _run_kconvs_flat(d2, base.down[1][2])
    assert ph == 2, ph
    b8 = k3.fused_conv4x4_s2_flat(d2, *plan.k4_blocks[2], relu=LEAK)

    # 1/8 bottleneck: split/split/9-block kernel convs, ends phase 0
    uf, ph = _run_kconvs_flat(b8, plan.bott)
    assert ph == 0
    y8 = uf

    flat_levels = []
    skips = (d2, d1, s_flat)
    dims = ((h // 8, t // 8), (h // 4, t // 4), (h // 2, t // 2))
    for lvl, (ub, ubias, mu, sblocks, mbias) in enumerate(plan.up_blocks):
        hi, ti = dims[lvl]
        up_core = _up2x_flat(uf, ub, ubias, hi, ti)
        core = _mix_flat(up_core, skips[lvl], mu, sblocks, mbias,
                         2 * hi, 2 * ti)
        uf, ph = _run_kconvs_flat(_canvas(core), base.up[lvl][4])
        # each up level nets phase 0 with the current v3 config (two split
        # convs); an odd split count would unfold at the wrong phase and
        # _up2x_flat would mis-read the canvas — fail fast instead
        assert ph == 0, (lvl, ph)
        flat_levels.append((uf, ph))
    return y8, flat_levels


def _unfold_pyramid(y8, flat_levels, h, w):
    pyramid = [k3.from_flat(y8, h // 8, w // 8, 32, 32, phase=0)]
    for lvl, (xf, phase) in enumerate(flat_levels):
        hi = h >> (2 - lvl)
        wi = w >> (2 - lvl)
        pyramid.append(k3.from_flat(xf, hi, wi, 32, 32, phase=phase))
    return pyramid


def _stem_flat(x, plan: FlatUNetPlan):
    """Image (1, H, W, 3) -> phase-2 stem canvas, fully in the flat layout.

    ``to_flat`` zero-pads channels 3 -> 32; the stem conv runs as a
    phase-0 split-window kernel whose output phase is 2 -- exactly the
    canvas the k4s2 downsampler and the full-res skip expect."""
    xf = k3.to_flat(x, 32)
    kc = plan.stem
    return k3.fused_conv3x3_flat(xf, kc.blocks, kc.scale, kc.bias,
                                 dilation=1, relu=LEAK, phase_in=0)


def fast_unet_flat(x: jnp.ndarray, plan: FlatUNetPlan, *, dtype=jnp.bfloat16):
    """UNetFeatureExtractor forward, whole pipeline in the flat layout.

    Returns the pyramid [1/8, 1/4, 1/2, full] as NHWC arrays."""
    x = x.astype(dtype)
    _, h, w, _ = x.shape
    y8, flat_levels = _unet_flat_from_stem(_stem_flat(x, plan), plan, h, w)
    return _unfold_pyramid(y8, flat_levels, h, w)


def fast_unet_flat_pair(left, right, plan: FlatUNetPlan, *,
                        dtype=jnp.bfloat16):
    """Both views' pyramids, every op (stem included) in the flat layout."""
    _, h, w, _ = left.shape
    pyramids = []
    for v, x in enumerate((left, right)):
        y8, levels = _unet_flat_from_stem(
            _stem_flat(x.astype(dtype), plan), plan, h, w)
        pyramids.append(_unfold_pyramid(y8, levels, h, w))
    return pyramids
