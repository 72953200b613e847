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

Inference-path only (eval-mode BN folded); training uses the XLA path with
the same parameters.
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


def to_flat(x: jnp.ndarray, c_pad: int) -> jnp.ndarray:
    """(B=1, H, W, C) -> flat (PADR+H+PADR, WT, 128) with zero halos."""
    b, h, w, c = x.shape
    assert b == 1, "flat kernel path is the batch-1 latency path"
    f = _fold(c_pad)
    assert w % f == 0, (w, f)
    assert (w // f) % 8 == 0, (
        f"flat width {w // f} tiles must be 8-aligned (W multiple of {8 * f})")
    if c < c_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
    xf = x[0].reshape(h, w // f, LANES)
    xf = jnp.pad(xf, ((PADR, PADR), (PADC_TILES, PADC_TILES), (0, 0)))
    return xf


def from_flat(xf: jnp.ndarray, h: int, w: int, c: int, c_pad: int):
    """flat (rows, WT, 128) -> (1, H, W, C)."""
    f = _fold(c_pad)
    core = xf[PADR:PADR + h, PADC_TILES:PADC_TILES + w // f, :]
    x = core.reshape(h, w, c_pad)[None]
    return x[..., :c]


def _build_kernel(th, wf, wt, dilation, relu, has_res, f, n):
    """Double-buffered pipeline: tile i+1's input DMA overlaps tile i's
    matmuls, and tile i's output DMA drains while tile i+1 computes."""
    offs = tile_offsets(dilation, f)
    d = dilation
    ysrows = max(th, PADR)  # ys buffer also serves the PADR-row halo writes

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
                a = xs2[slot, pl.ds(dy, th), pl.ds(PADC_TILES + t, wf), :]
                a = a.reshape(th * wf, LANES)
                blk = w_ref[di * 3 + ti]
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
        if relu:
            y = jnp.maximum(y, 0.0)
        y = y.astype(ys2.dtype)
        if has_res:
            res_copy(i, slot).wait()
            y = y + rs2[slot, :, pl.ds(PADC_TILES, wf), :].reshape(
                th * wf, LANES)

        # ys2[slot] may still be draining from tile i-2 -- wait before reuse
        if n > 2:
            @pl.when(i >= 2)
            def _():
                out_copy(i - 2, slot).wait()

        ys2[slot, pl.ds(0, th), pl.ds(PADC_TILES, wf), :] = y.reshape(
            th, wf, LANES)
        # keep halo columns zero for the next conv's SAME padding
        zcol = jnp.zeros((th, PADC_TILES, LANES), ys2.dtype)
        ys2[slot, pl.ds(0, th), pl.ds(0, PADC_TILES), :] = zcol
        ys2[slot, pl.ds(0, th), pl.ds(PADC_TILES + wf, PADC_TILES), :] = zcol
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


@functools.partial(jax.jit, static_argnames=("dilation", "relu", "th", "f"))
def _conv_call(xf, w_blocks, scale_bias, residual, *, dilation, relu, th, f):
    rows, wt, _ = xf.shape
    h = rows - 2 * PADR
    wf = wt - 2 * PADC_TILES
    n_tiles = pl.cdiv(h, th)
    assert h % th == 0, (h, th)
    has_res = residual is not None
    res = residual if has_res else jnp.zeros((1, 1, LANES), xf.dtype)

    kernel = _build_kernel(th, wf, wt, dilation, relu, has_res, f, n_tiles)
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
            pltpu.VMEM((th * wf, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * h * wf * LANES * LANES,
            bytes_accessed=2 * rows * wt * LANES * 2,
            transcendentals=0),
    )(xf, w_blocks.astype(xf.dtype), scale_bias, res)
    return out


def _pick_tile_height(h: int, dtype, dilation: int, has_res: bool,
                      wt: int, wf: int, prefer: int) -> int:
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
        return buffers * LANES * itemsize + th * wf * LANES * 4

    for th in range(min(prefer, h), 0, -1):
        if h % th == 0 and vmem(th) <= budget:
            return th
    raise ValueError(f"no tile height for h={h} fits VMEM")


def fused_conv3x3_flat(xf, w_blocks, scale, bias, *, dilation=1, relu=True,
                       residual=None, th=24):
    """Run the fused conv on a flat-layout activation.

    Args:
      xf: (rows, WT, 128) flat activations (see :func:`to_flat`).
      w_blocks: (9, 128, 128) from :func:`fold_conv3x3_weights`.
      scale, bias: (128,) f32 folded BN/bias epilogue (tiled per fold).
      residual: optional flat activation added *after* the ReLU.
    Returns:
      flat (rows, WT, 128) output with zeroed halos.
    """
    rows, wt, _ = xf.shape
    h = rows - 2 * PADR
    wf = wt - 2 * PADC_TILES
    t = _pick_tile_height(h, xf.dtype, dilation, residual is not None,
                          wt, wf, prefer=th)
    sb = jnp.stack([scale, bias]).astype(jnp.float32)
    return _conv_call(xf, w_blocks, sb, residual,
                      dilation=dilation, relu=relu, th=t, f=4)


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
