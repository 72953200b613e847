"""Pallas TPU kernel: fused 3x3 convolution for small channel counts.

Why: XLA's spatial convolution at C=32 uses 32 of the MXU's 128 output lanes
(and its im2col layouts poorly), measuring ~6 TFLOP/s on v5e -- 3% of peak.
The RefineNet cascade of MobileStereoNet (reference model/mobile_stereo_net.py
:59-87) is 13 such convs at full 720p resolution and dominates inference
latency (21.6 of 36.5 ms measured).

This kernel reaches high MXU utilization by *folding f = 128/C consecutive
output pixels into the lane dimension*:

* activations live in a "flat" layout ``(rows, W_tiles, 128)`` where one
  128-lane tile holds f=4 consecutive pixels x 32 channels;
* a 3x3 (optionally dilated) conv becomes 9 dense matmuls
  ``[th*Wf, 128] @ [128, 128]`` -- one per (row-tap dy, column-tile offset T)
  -- accumulated in f32; the kernel-position structure is encoded as
  structured zeros in the prebuilt 128x128 weight blocks
  (:func:`fold_conv3x3_weights`);
* BN (folded scale/bias), bias, ReLU and the ResBlock residual add are fused
  into the accumulator epilogue, so each conv reads/writes activations from
  HBM exactly once.

The flat layout is preserved across a whole conv stack (see
:class:`ops in models/stereo_net.py`): pad once, run N fused convs, unpad
once.  Halo columns/rows are kept zeroed so SAME zero-padding semantics hold.

Used on both the inference path (eval-mode BN folded into the epilogue
scale/bias, models/fast_infer.py) and the training path: kernels/train_conv.py
wraps this kernel in a ``jax.custom_vjp`` (dx via the same kernel with
spatially-flipped folded weights, dw via full-lane folded MXU reductions) and
models/fast_train.py builds whole train steps from it with live-BN semantics.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# Halo column tiles each side.  4 (not the minimal 2) so the flat width
# wt = wf + 2*4 stays a multiple of the f32 sublane tile (8) whenever wf is:
# DMAs with a non-8-aligned second-to-last dim fault this TPU runtime.
PADC_TILES = 4  # covers dilation <= 16 at f=4
PADR = 8        # halo rows each side (covers dilation <= 8)
# Spare zero tiles appended to the core region ("canvas") so that phase-2
# activations -- image shifted 2 px right by a split-window conv (see
# fold_conv3x3_split_weights) -- spill into compute-covered, 8-aligned width
# instead of forcing odd (wf+1)-tile matmuls/stores.  All kernels compute the
# full canvas width and re-zero the out-of-image region via the keep mask.
SPARE_TILES = 8


def _fold(c: int) -> int:
    assert LANES % c == 0, f"channels {c} must divide {LANES}"
    return LANES // c


def tile_offsets(dilation: int, f: int) -> tuple[int, ...]:
    """Column-tile offsets whose f-pixel windows cover taps {-d, 0, +d}."""
    if f == 1:
        return (-dilation, 0, dilation)
    t = max(1, math.ceil(dilation / f))
    return (-t, 0, t)


def fold_conv3x3_weights(w: jnp.ndarray, dilation: int = 1,
                         c_in_pad: int | None = None,
                         c_out_pad: int | None = None) -> jnp.ndarray:
    """(3, 3, C_in, C_out) HWIO conv weights -> (9, 128, 128) matmul blocks.

    Block (dy, T) maps folded input lanes (j*C_in + ci) -- pixel j of the
    column tile at offset T -- to folded output lanes (p*C_out + co):

        block[j*C_in + ci, p*C_out + co] = w[dy, dx, ci, co]
            iff T*f_in + j - p == (dx - 1) * dilation
    """
    kh, kw, c_in, c_out = w.shape
    assert kh == 3 and kw == 3
    cip = c_in_pad or c_in
    cop = c_out_pad or c_out
    f_in = _fold(cip)
    f_out = _fold(cop)
    assert f_in == f_out, "input/output fold factors must match"
    f = f_in
    offs = tile_offsets(dilation, f)

    wn = np.zeros((9, LANES, LANES), np.float32)
    w_np = np.asarray(w, np.float32)
    for di, dy in enumerate(range(3)):
        for ti, t in enumerate(offs):
            blk = wn[di * 3 + ti]
            for j in range(f):
                for p in range(f):
                    rel = t * f + j - p
                    if rel % dilation != 0:
                        continue
                    dx = rel // dilation
                    if dx < -1 or dx > 1:
                        continue
                    blk[j * cip:j * cip + c_in,
                        p * cop:p * cop + c_out] = w_np[dy, dx + 1]
    return jnp.asarray(wn)


def fold_conv3x3_split_weights(w: jnp.ndarray, dilation: int = 1,
                               phase_in: int = 0,
                               c_in_pad: int | None = None,
                               c_out_pad: int | None = None) -> jnp.ndarray:
    """(3, 3, C_in, C_out) HWIO conv weights -> (6, 128, 128) split-window
    blocks: 2/3 the MXU work of :func:`fold_conv3x3_weights` for d <= f//2.

    For dilation <= 2 (f=4) the 4+2d-pixel input support of one output tile
    fits inside TWO adjacent column tiles -- provided the output is written
    with a 2-pixel *phase shift*.  Phase phi means image pixel x is stored at
    flat position x + phi; a split conv maps phase 0 -> 2 or 2 -> 0:

      phase_in 0: out tile k holds image px 4k-2+p,  reads tiles {k-1, k}
      phase_in 2: out tile k holds image px 4k+p,    reads tiles {k, k+1}

    Block (dy, side) maps input tile (k + offs[side]) to output tile k:

        block[dy*2+side][j*C_in + ci, p*C_out + co] = w[dy, dx, ci, co]
            iff 4*offs[side] + j - p + (2 - 2*phase_in) == dx' * dilation,
            dx = dx' + 1

    The matmul count per output tile drops from 9 to 6 (one per (dy, side)).
    The caller must run the phase-aware kernel (mask the 2-pixel spill at the
    image edges) and alternate phases across a conv stack.
    """
    kh, kw, c_in, c_out = w.shape
    assert kh == 3 and kw == 3
    cip = c_in_pad or c_in
    cop = c_out_pad or c_out
    f = _fold(cip)
    assert f == _fold(cop) == 4, "split fold is specialized to f=4"
    assert dilation <= 2, dilation
    assert phase_in in (0, 2), phase_in
    offs = split_offsets(phase_in)
    shift = 2 - 2 * phase_in  # phase_out - phase_in, phase_out = 2 - phase_in

    wn = np.zeros((6, LANES, LANES), np.float32)
    w_np = np.asarray(w, np.float32)
    for dy in range(3):
        for si, t in enumerate(offs):
            blk = wn[dy * 2 + si]
            for j in range(f):
                for p in range(f):
                    rel = 4 * t + j - p + shift
                    if rel % dilation != 0:
                        continue
                    dx = rel // dilation
                    if dx < -1 or dx > 1:
                        continue
                    blk[j * cip:j * cip + c_in,
                        p * cop:p * cop + c_out] = w_np[dy, dx + 1]
    return jnp.asarray(wn)


def split_offsets(phase_in: int) -> tuple[int, int]:
    """Input column-tile offsets of the split-window conv for a given input
    phase (see :func:`fold_conv3x3_split_weights`)."""
    return (-1, 0) if phase_in == 0 else (0, 1)


def to_flat(x: jnp.ndarray, c_pad: int, phase: int = 0) -> jnp.ndarray:
    """(B=1, H, W, C) -> flat (PADR+H+PADR, WT, 128) with zero halos.

    WT = PADC + (W/f + SPARE_TILES) + PADC: the core "canvas" carries
    SPARE_TILES zero tiles past the image so phase-shifted activations stay
    8-aligned (see :data:`SPARE_TILES`).  ``phase=2`` stores image pixel x
    at flat position x+2 (the split-window convention), spilling one tile
    into the spare region."""
    b, h, w, c = x.shape
    assert b == 1, "flat kernel path is the batch-1 latency path"
    f = _fold(c_pad)
    assert w % f == 0, (w, f)
    assert (w // f) % 8 == 0, (
        f"flat width {w // f} tiles must be 8-aligned (W multiple of {8 * f})")
    assert phase in (0, 2), phase
    if c < c_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
    if phase:
        xp = jnp.pad(x[0], ((0, 0), (phase, f - phase), (0, 0)))
        xf = xp.reshape(h, w // f + 1, LANES)
        xf = jnp.pad(xf, ((PADR, PADR),
                          (PADC_TILES, SPARE_TILES - 1 + PADC_TILES), (0, 0)))
        return xf
    xf = x[0].reshape(h, w // f, LANES)
    xf = jnp.pad(xf, ((PADR, PADR),
                      (PADC_TILES, SPARE_TILES + PADC_TILES), (0, 0)))
    return xf


def from_flat(xf: jnp.ndarray, h: int, w: int, c: int, c_pad: int,
              phase: int = 0):
    """flat (rows, WT, 128) -> (1, H, W, C).

    ``phase`` is the activation's pixel phase (image pixel x stored at flat
    position x + phase, see :func:`fold_conv3x3_split_weights`)."""
    f = _fold(c_pad)
    tiles = w // f + (1 if phase else 0)
    core = xf[PADR:PADR + h, PADC_TILES:PADC_TILES + tiles, :]
    x = core.reshape(h, tiles * f, c_pad)[None]
    return x[:, :, phase:phase + w, :c]


def _build_kernel(th, wc, wt, dilation, relu, has_res, f, n, offs,
                  img_tiles, phase_out):
    """Double-buffered pipeline: tile i+1's input DMA overlaps tile i's
    matmuls, and tile i's output DMA drains while tile i+1 computes.

    ``offs`` are the column-tile offsets (3 for the 9-block fold, 2 for the
    split-window fold).  The matmuls cover the full 8-aligned canvas ``wc``
    (= img_tiles + SPARE_TILES); a keep mask re-zeroes everything outside the
    image at the output phase (phase 2 = image shifted 2 px right, spilling
    into tile ``img_tiles``), preserving SAME zero-padding semantics for the
    next conv."""
    d = dilation
    ysrows = max(th, PADR)  # ys buffer also serves the PADR-row halo writes
    n_offs = len(offs)

    def kernel(x_hbm, w_ref, sb_ref, res_hbm, out_hbm,
               xs2, rs2, ys2, acc_ref, sem_in, sem_res, sem_out):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)

        def in_copy(j, s):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(PADR + j * th - d, th + 2 * d)],
                xs2.at[s], sem_in.at[s])

        def res_copy(j, s):
            return pltpu.make_async_copy(
                res_hbm.at[pl.ds(PADR + j * th, th)], rs2.at[s],
                sem_res.at[s])

        def out_copy(j, s):
            return pltpu.make_async_copy(
                ys2.at[s, pl.ds(0, th)], out_hbm.at[pl.ds(PADR + j * th, th)],
                sem_out.at[s])

        @pl.when(i == 0)
        def _():
            in_copy(0, 0).start()
            if has_res:
                res_copy(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            in_copy(i + 1, 1 - slot).start()
            if has_res:
                res_copy(i + 1, 1 - slot).start()

        in_copy(i, slot).wait()

        first = True
        for di in range(3):
            dy = di * d  # xs row 0 == image row (row_base - d)
            for ti, t in enumerate(offs):
                a = xs2[slot, pl.ds(dy, th), pl.ds(PADC_TILES + t, wc), :]
                a = a.reshape(th * wc, LANES)
                blk = w_ref[di * n_offs + ti]
                prod = jax.lax.dot_general(
                    a, blk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if first:
                    acc_ref[:] = prod
                    first = False
                else:
                    acc_ref[:] += prod

        scale = sb_ref[0]
        bias = sb_ref[1]
        y = acc_ref[:] * scale[None, :] + bias[None, :]
        # relu: True = ReLU, a float alpha = leaky ReLU (e.g. 0.2 for the
        # v3 U-Net extractor's leaky_relu_02), falsy = identity
        if relu is True:
            y = jnp.maximum(y, 0.0)
        elif relu:
            y = jnp.maximum(y, 0.0) + relu * jnp.minimum(y, 0.0)
        y = y.astype(ys2.dtype)
        if has_res:
            res_copy(i, slot).wait()
            y = y + rs2[slot, :, pl.ds(PADC_TILES, wc), :].reshape(
                th * wc, LANES)

        y = y.reshape(th, wc, LANES)

        # ys2[slot] may still be draining from tile i-2 -- wait before reuse
        if n > 2:
            @pl.when(i >= 2)
            def _():
                out_copy(i - 2, slot).wait()

        ys2[slot, pl.ds(0, th), pl.ds(PADC_TILES, wc), :] = y
        # Re-zero everything outside the (phase-shifted) image so the next
        # conv sees SAME zero padding at the true image edges.  Phase 2 also
        # fixes the 2-px spill edges: image px {-2,-1} landed in tile 0 pixel
        # slots {0,1} (lanes < 64) and px {W, W+1} in tile img_tiles slots
        # {2,3} (lanes >= 64) -- both garbage, zeroed by a lane mask.
        if phase_out == 2:
            lane = jax.lax.broadcasted_iota(jnp.int32, (th, 1, LANES), 2)
            ys2[slot, pl.ds(0, th), pl.ds(PADC_TILES, 1), :] = (
                y[:, 0:1, :] * (lane >= 64).astype(y.dtype))
            ys2[slot, pl.ds(0, th), pl.ds(PADC_TILES + img_tiles, 1), :] = (
                y[:, img_tiles:img_tiles + 1, :]
                * (lane < 64).astype(y.dtype))
        img_keep = img_tiles + (1 if phase_out == 2 else 0)
        zcol = jnp.zeros((th, PADC_TILES, LANES), ys2.dtype)
        ys2[slot, pl.ds(0, th), pl.ds(0, PADC_TILES), :] = zcol
        ys2[slot, pl.ds(0, th),
            pl.ds(PADC_TILES + img_keep, wt - PADC_TILES - img_keep), :] = (
            jnp.zeros((th, wt - PADC_TILES - img_keep, LANES), ys2.dtype))
        out_copy(i, slot).start()

        # last tile: drain all outstanding output DMAs, then write the
        # zero halo rows (reusing ys2[slot] after its drain)
        @pl.when(i == n - 1)
        def _():
            out_copy(i, slot).wait()
            if n > 1:
                out_copy(i - 1, 1 - slot).wait()
            ys2[slot] = jnp.zeros((ysrows, wt, LANES), ys2.dtype)
            top = pltpu.make_async_copy(
                ys2.at[slot, pl.ds(0, PADR)], out_hbm.at[pl.ds(0, PADR)],
                sem_out.at[slot])
            top.start()
            top.wait()
            bot = pltpu.make_async_copy(
                ys2.at[slot, pl.ds(0, PADR)],
                out_hbm.at[pl.ds(PADR + n * th, PADR)], sem_out.at[slot])
            bot.start()
            bot.wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("dilation", "relu", "th", "f", "phase_in"))
def _conv_call(xf, w_blocks, scale_bias, residual, *, dilation, relu, th, f,
               phase_in=0):
    rows, wt, _ = xf.shape
    h = rows - 2 * PADR
    wc = wt - 2 * PADC_TILES            # canvas tiles (8-aligned)
    img_tiles = wc - SPARE_TILES        # image tiles at phase 0
    n_tiles = pl.cdiv(h, th)
    assert h % th == 0, (h, th)
    has_res = residual is not None
    res = residual if has_res else jnp.zeros((1, 1, LANES), xf.dtype)

    split = w_blocks.shape[0] == 6
    if split:
        offs = split_offsets(phase_in)
        phase_out = 2 - phase_in
    else:
        offs = tile_offsets(dilation, f)
        phase_out = phase_in

    kernel = _build_kernel(th, wc, wt, dilation, relu, has_res, f, n_tiles,
                           offs, img_tiles, phase_out)
    # interpret mode off-TPU so the CPU test mesh can validate numerics
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, wt, LANES), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * dilation, wt, LANES), xf.dtype),
            pltpu.VMEM((2, th, wt, LANES) if has_res else (1, 1, 1, LANES),
                       xf.dtype),
            pltpu.VMEM((2, max(th, PADR), wt, LANES), xf.dtype),
            pltpu.VMEM((th * wc, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * len(offs) * h * wc * LANES * LANES,
            bytes_accessed=2 * rows * wt * LANES * 2,
            transcendentals=0),
    )(xf, w_blocks.astype(xf.dtype), scale_bias, res)
    return out


def _pick_tile_height(h: int, dtype, dilation: int, has_res: bool,
                      wt: int, wc: int, prefer: int) -> int:
    """Largest divisor of h that is <= prefer and fits the double buffers +
    accumulator in the VMEM budget."""
    itemsize = jnp.dtype(dtype).itemsize
    # 16 MB VMEM minus headroom for weight blocks, scale/bias, and the
    # compiler's own scratch/padding (measured ~2.5 MB at 720p shapes)
    budget = 12 * 1024 * 1024

    def vmem(th):
        buffers = (2 * (th + 2 * dilation) * wt
                   + 2 * max(th, PADR) * wt)
        if has_res:
            buffers += 2 * th * wt
        return buffers * LANES * itemsize + th * wc * LANES * 4

    for th in range(min(prefer, h), 0, -1):
        if h % th == 0 and vmem(th) <= budget:
            return th
    raise ValueError(f"no tile height for h={h} fits VMEM")


def fused_conv3x3_flat(xf, w_blocks, scale, bias, *, dilation=1, relu=True,
                       residual=None, th=24, phase_in=0):
    """Run the fused conv on a flat-layout activation.

    Args:
      xf: (rows, WT, 128) flat activations (see :func:`to_flat`), at pixel
        phase ``phase_in``.
      w_blocks: (9, 128, 128) from :func:`fold_conv3x3_weights` (output keeps
        ``phase_in``) or (6, 128, 128) from
        :func:`fold_conv3x3_split_weights` built for the same ``phase_in``
        (output phase flips to ``2 - phase_in``).
      scale, bias: (128,) f32 folded BN/bias epilogue (tiled per fold).
      residual: optional flat activation added *after* the ReLU; must be at
        the output's phase.
    Returns:
      flat (rows, WT, 128) output with zeroed halos.
    """
    rows, wt, _ = xf.shape
    h = rows - 2 * PADR
    wc = wt - 2 * PADC_TILES
    t = _pick_tile_height(h, xf.dtype, dilation, residual is not None,
                          wt, wc, prefer=th)
    sb = jnp.stack([scale, bias]).astype(jnp.float32)
    return _conv_call(xf, w_blocks, sb, residual,
                      dilation=dilation, relu=relu, th=t, f=4,
                      phase_in=phase_in)


def fold_conv3x3_s2_weights(w: jnp.ndarray,
                            c_in_pad: int | None = None,
                            c_out_pad: int | None = None) -> jnp.ndarray:
    """(3, 3, C_in, C_out) HWIO weights -> (6, 256, 128) stride-2 blocks.

    A stride-2 3x3 conv (torch padding=1 geometry: ``out[Y, X] =
    sum_{ky,kx} w[ky,kx] . in[2Y+ky-1, 2X+kx-1]``) halves H and W, so one
    128-lane output tile (4 out px x 32 ch at out-tile k) reads the 9 input
    pixels 8k-1..8k+7 -- spanning input tiles 2k-1..2k+1.  Viewing the input
    row as *tile pairs* (256 lanes = 8 px x 32 ch, pair p = tiles 2p, 2p+1),
    the support is exactly pair k (px 8k..8k+7, "main") plus lane j=7 of pair
    k-1 (px 8k-1, "edge"), giving 2 K=256 matmuls per row tap:

        block[di*2 + side][j*C_in + ci, p*C_out + co] = w[di, dx+1, ci, co]
            main (side=1): dx = j - 2p,      iff dx in {-1,0,1}
            edge (side=0): dx = j - 8 - 2p   (only j=7, p=0, dx=-1)

    Row taps come for free from an even/odd row split done by the caller
    (out row Y reads input rows 2Y-1, 2Y, 2Y+1: row-pair r = rows
    (2r-1, 2r) => taps are pair slices [Y,0], [Y,1], [Y+1,0]).  Input and
    output are both at pixel phase 0.
    """
    kh, kw, c_in, c_out = w.shape
    assert kh == 3 and kw == 3
    cip = c_in_pad or c_in
    cop = c_out_pad or c_out
    assert _fold(cip) == _fold(cop) == 4, "s2 fold is specialized to f=4"

    wn = np.zeros((6, 2 * LANES, LANES), np.float32)
    w_np = np.asarray(w, np.float32)
    for di in range(3):
        for side in range(2):  # 0 = edge pair (k-1), 1 = main pair (k)
            blk = wn[di * 2 + side]
            for j in range(8):
                for p in range(4):
                    dx = j - 2 * p - (8 if side == 0 else 0)
                    if dx < -1 or dx > 1:
                        continue
                    blk[j * cip:j * cip + c_in,
                        p * cop:p * cop + c_out] = w_np[di, dx + 1]
    return jnp.asarray(wn)


S2_TAPS_3x3 = ((0, 0), (0, 1), (1, 0))
# 4x4 stride-2 TF-SAME: out row Y reads input rows 2Y-1..2Y+2 = pair taps
# [Y,0], [Y,1], [Y+1,0], [Y+1,1]
S2_TAPS_4x4 = ((0, 0), (0, 1), (1, 0), (1, 1))


def _build_s2_kernel(th, kc, wt_out, relu, n, taps=S2_TAPS_3x3, pair0=1):
    """Stride-2 conv pipeline: grid over *output* row tiles of ``th`` rows.

    Input arrives as row-pairs ``(H/2+1, 2, WTP, 256)`` (see
    :func:`fused_conv3x3_s2_flat`); each tile DMAs th+1 row-pairs and runs
    ``len(taps) * 2`` K=256 matmuls (row taps x {edge, main} pair sides at
    base pair offset ``pair0``).  Output is a normal phase-0 flat
    activation ``(PADR + H/2 + PADR, WT_out, 128)``.
    """

    def kernel(x_hbm, w_ref, sb_ref, out_hbm, xs2, ys2, acc_ref,
               sem_in, sem_out):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)

        def in_copy(j, s):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * th, th + 1)], xs2.at[s], sem_in.at[s])

        def out_copy(j, s):
            return pltpu.make_async_copy(
                ys2.at[s, pl.ds(0, th)], out_hbm.at[pl.ds(PADR + j * th, th)],
                sem_out.at[s])

        @pl.when(i == 0)
        def _():
            in_copy(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            in_copy(i + 1, 1 - slot).start()

        in_copy(i, slot).wait()

        # row-pair r of the buffer = input image rows (2r-1, 2r) relative to
        # this tile's first output row (3x3 default: out row y reads taps
        # [y, 0] (2y-1), [y, 1] (2y), [y+1, 0] (2y+1))
        first = True
        for di, (r0, comp) in enumerate(taps):
            for side in range(2):
                a = xs2[slot, pl.ds(r0, th), comp,
                        pl.ds(pair0 + side, kc), :]
                a = a.reshape(th * kc, 2 * LANES)
                blk = w_ref[di * 2 + side]
                prod = jax.lax.dot_general(
                    a, blk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if first:
                    acc_ref[:] = prod
                    first = False
                else:
                    acc_ref[:] += prod

        y = acc_ref[:] * sb_ref[0][None, :] + sb_ref[1][None, :]
        if relu is True:
            y = jnp.maximum(y, 0.0)
        elif relu:
            y = jnp.maximum(y, 0.0) + relu * jnp.minimum(y, 0.0)
        y = y.astype(ys2.dtype).reshape(th, kc, LANES)

        if n > 2:
            @pl.when(i >= 2)
            def _():
                out_copy(i - 2, slot).wait()

        ys2[slot, pl.ds(0, th), pl.ds(PADC_TILES, kc), :] = y
        ys2[slot, pl.ds(0, th), pl.ds(0, PADC_TILES), :] = jnp.zeros(
            (th, PADC_TILES, LANES), ys2.dtype)
        ys2[slot, pl.ds(0, th),
            pl.ds(PADC_TILES + kc, wt_out - PADC_TILES - kc), :] = jnp.zeros(
            (th, wt_out - PADC_TILES - kc, LANES), ys2.dtype)
        out_copy(i, slot).start()

        @pl.when(i == n - 1)
        def _():
            out_copy(i, slot).wait()
            if n > 1:
                out_copy(i - 1, 1 - slot).wait()
            ys2[slot] = jnp.zeros_like(ys2[slot])
            top = pltpu.make_async_copy(
                ys2.at[slot, pl.ds(0, PADR)], out_hbm.at[pl.ds(0, PADR)],
                sem_out.at[slot])
            top.start()
            top.wait()
            bot = pltpu.make_async_copy(
                ys2.at[slot, pl.ds(0, PADR)],
                out_hbm.at[pl.ds(PADR + n * th, PADR)], sem_out.at[slot])
            bot.start()
            bot.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("relu", "th", "taps", "pair0"))
def _conv_s2_call(xf, w_blocks, scale_bias, *, relu, th, taps=S2_TAPS_3x3,
                  pair0=1):
    rows, wt, _ = xf.shape
    h = rows - 2 * PADR
    assert h % 2 == 0, h
    h2 = h // 2
    wtp = wt // 2
    kc = (wt - 2 * PADC_TILES - SPARE_TILES) // 2  # out img tiles = in/2
    wc_out = kc + SPARE_TILES
    wt_out = wc_out + 2 * PADC_TILES
    n_tiles = h2 // th
    assert h2 % th == 0, (h2, th)

    # row-pair view: pair r = abs rows (PADR-1+2r, PADR+2r); H/2+1 pairs
    # cover every tap of every output row (leading-dim reshape: no copy)
    xq = jax.lax.slice_in_dim(xf, PADR - 1, PADR + h + 1, axis=0)
    xq = xq.reshape(h2 + 1, 2, wtp, 2 * LANES)

    kernel = _build_s2_kernel(th, kc, wt_out, relu, n_tiles, taps=taps,
                              pair0=pair0)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((2 * PADR + h2, wt_out, LANES),
                                       xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 1, 2, wtp, 2 * LANES), xf.dtype),
            pltpu.VMEM((2, max(th, PADR), wt_out, LANES), xf.dtype),
            pltpu.VMEM((th * kc, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * len(taps) * h2 * kc * 2 * LANES * LANES,
            bytes_accessed=(rows * wt + (2 * PADR + h2) * wt_out) * LANES * 2,
            transcendentals=0),
    )(xq, w_blocks.astype(xf.dtype), scale_bias)
    return out


def fold_conv4x4_s2_weights(w: jnp.ndarray,
                            c_in_pad: int | None = None,
                            c_out_pad: int | None = None) -> jnp.ndarray:
    """(4, 4, C_in, C_out) HWIO stride-2 TF-SAME weights -> (8, 256, 128)
    blocks for a **phase-2 input** (the v3 U-Net's k4s2 downsamplers,
    reference model/mobile_stereo_net_v3.py:205-231 via flax SAME padding).

    TF-SAME k4s2 (pad_lo=1): out px X reads in px 2X-1..2X+2, tap
    a = u - (2X-1).  With the input at pixel phase 2 (px u stored at flat
    position u+2), output tile k (px 4k+p) reads canvas pairs k ("main",
    side 0: positions 8k..8k+7 = px 8k-2..8k+5) and k+1 ("high", side 1:
    px 8k+6..8k+13):

        block[dy*2 + side][j*C_in + ci, p*C_out + co] = w[dy, a, ci, co]
            with a = 8*side + j - 2p - 1, iff 0 <= a <= 3.

    Output is at pixel phase 0.  Row taps [Y,0](2Y-1) .. [Y+1,1](2Y+2) =
    :data:`S2_TAPS_4x4`.
    """
    kh, kw, c_in, c_out = w.shape
    assert kh == 4 and kw == 4
    cip = c_in_pad or c_in
    cop = c_out_pad or c_out
    assert _fold(cip) == _fold(cop) == 4, "s2 fold is specialized to f=4"

    wn = np.zeros((8, 2 * LANES, LANES), np.float32)
    w_np = np.asarray(w, np.float32)
    for dy in range(4):
        for side in range(2):
            blk = wn[dy * 2 + side]
            for j in range(8):
                for p in range(4):
                    a = 8 * side + j - 2 * p - 1
                    if 0 <= a <= 3:
                        blk[j * cip:j * cip + c_in,
                            p * cop:p * cop + c_out] = w_np[dy, a]
    return jnp.asarray(wn)


def _s2_pick_tile(xf, th):
    """Largest tile height <= th that divides H/2 and fits the s2 kernel's
    scratch in the 12 MiB VMEM budget (shared by the 3x3 and 4x4 stride-2
    entry points; scratch shapes mirror _conv_s2_call's)."""
    rows, wt, _ = xf.shape
    h2 = (rows - 2 * PADR) // 2
    wtp = wt // 2
    kc = (wt - 2 * PADC_TILES - SPARE_TILES) // 2
    assert kc % 8 == 0, kc
    itemsize = jnp.dtype(xf.dtype).itemsize
    budget = 12 * 1024 * 1024

    def vmem(t):
        return ((2 * (t + 1) * 2 * wtp * 2 + 2 * max(t, PADR) *
                 (kc + SPARE_TILES + 2 * PADC_TILES)) * LANES * itemsize
                + t * kc * LANES * 4)

    return next(t for t in range(min(th, h2), 0, -1)
                if h2 % t == 0 and vmem(t) <= budget)


def fused_conv4x4_s2_flat(xf, w_blocks, scale, bias, *, relu=True, th=16):
    """Stride-2 4x4 TF-SAME fused conv on a **phase-2** flat activation:
    (PADR+H+PADR, WT, 128) -> (PADR+H/2+PADR, WT_out, 128), phase 0.

    ``w_blocks`` from :func:`fold_conv4x4_s2_weights`; ``relu`` follows the
    fused_conv3x3_flat convention (True / leaky alpha / falsy).  The jnp
    formulation of this op (strided tile-dim slices + einsum) measured
    6.9 ms at 720p full->1/2 on v5e -- XLA lowers stride-2 slices on the
    sublane dim as relayout copies; this kernel reads the same data as
    contiguous row/tile pairs.
    """
    t = _s2_pick_tile(xf, th)
    sb = jnp.stack([scale, bias]).astype(jnp.float32)
    return _conv_s2_call(xf, w_blocks, sb, relu=relu, th=t,
                         taps=S2_TAPS_4x4, pair0=2)


def fused_conv3x3_s2_flat(xf, w_blocks, scale, bias, *, relu=True, th=16):
    """Stride-2 fused conv on a phase-0 flat activation: (PADR+H+PADR, WT,
    128) -> (PADR+H/2+PADR, WT_out, 128), phase 0, zeroed halos.

    ``w_blocks`` from :func:`fold_conv3x3_s2_weights`.  W halves (out image
    tiles = in image tiles / 2, which must be 8-aligned => W % 64 == 0).
    """
    t = _s2_pick_tile(xf, th)
    sb = jnp.stack([scale, bias]).astype(jnp.float32)
    return _conv_s2_call(xf, w_blocks, sb, relu=relu, th=t)


def fold_bn_scale_bias(gamma, beta, mean, var, eps, c_out, c_pad):
    """BatchNorm (eval) -> per-lane scale/bias tiled over the fold factor."""
    scale = gamma / jnp.sqrt(var + eps)
    bias = beta - mean * scale
    f = _fold(c_pad)
    sc = jnp.zeros((c_pad,), jnp.float32).at[:c_out].set(scale)
    bi = jnp.zeros((c_pad,), jnp.float32).at[:c_out].set(bias)
    return jnp.tile(sc, f), jnp.tile(bi, f)


def plain_scale_bias(bias_vec, c_out, c_pad):
    """No-BN epilogue: identity scale + conv bias, tiled."""
    f = _fold(c_pad)
    sc = jnp.zeros((c_pad,), jnp.float32).at[:c_out].set(1.0)
    bi = jnp.zeros((c_pad,), jnp.float32)
    if bias_vec is not None:
        bi = bi.at[:c_out].set(bias_vec)
    return jnp.tile(sc, f), jnp.tile(bi, f)
