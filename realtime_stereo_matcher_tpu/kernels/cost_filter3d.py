"""Pallas TPU kernel: fused 3x3x3 convolution stack for the cost volume.

The v1/v2/v3 cost filter (reference model/mobile_stereo_net.py:103-117; Flax
CostFilter3D in models/stereo_net.py:52-67) is five Conv3d(3,3,3) layers over
an NDHWC volume (B=1, D=24, H/8, W/8, 32) -- ~4.4 ms of XLA time at 720p,
second only to the RefineNet cascade.

Same lane-folding trick as :mod:`conv3x3` (4 pixels x 32 channels per
128-lane tile), extended with the depth axis: a 3x3x3 conv becomes **27
dense (H*Wf, 128) @ (128, 128) matmuls** -- one per (depth-tap dz, row-tap
dy, column-tile offset t) -- accumulated in f32, with BN+bias+ReLU fused
into the epilogue.

Layout: ``(D + 2, PADR + H + PADR, PADC + Wf + PADC, 128)`` -- the flat 2D
layout of conv3x3 per disparity slab, with one zero halo slab at each end of
D (SAME zero padding along disparity).  The kernel grid iterates over output
slabs; each program DMAs its three input slabs, runs the 27 matmuls, and
writes one output slab.  The layout is preserved across the whole 5-layer
stack: fold once, filter five times, unfold once.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realtime_stereo_matcher_tpu.kernels import conv3x3 as k3

LANES = k3.LANES
PADR = k3.PADR
PADC = k3.PADC_TILES


def fold_conv3d_weights(w: jnp.ndarray, phase_in: int = 0,
                        c_in_pad: int = 32,
                        c_out_pad: int = 32) -> jnp.ndarray:
    """(3, 3, 3, C_in, C_out) DHWIO conv weights -> (18, 128, 128) blocks.

    Block k = dz*6 + (dy*2 + side) reuses the split-window 2D fold of slab
    dz (see kernels/conv3x3.py:fold_conv3x3_split_weights) -- 18 matmuls per
    output slab instead of 27, flipping the pixel phase per layer."""
    kd = w.shape[0]
    assert kd == 3
    per_slab = [
        k3.fold_conv3x3_split_weights(w[dz], dilation=1, phase_in=phase_in,
                                      c_in_pad=c_in_pad, c_out_pad=c_out_pad)
        for dz in range(3)
    ]
    return jnp.concatenate(per_slab, axis=0)


@dataclasses.dataclass(frozen=True)
class Conv3dSpec:
    blocks: jnp.ndarray   # (18, 128, 128)
    scale: jnp.ndarray    # (128,) f32
    bias: jnp.ndarray     # (128,) f32
    relu: bool
    phase_in: int = 0


def vol_to_flat(vol: jnp.ndarray, c_pad: int = 32) -> jnp.ndarray:
    """(B=1, D, H, W, C) -> (D+2, PADR+H+PADR, PADC+W/f+SPARE+PADC, 128)."""
    b, dvol, h, w, c = vol.shape
    assert b == 1
    f = LANES // c_pad
    assert w % f == 0 and (w // f) % 8 == 0, (w, f)
    if c < c_pad:
        vol = jnp.pad(vol, ((0, 0),) * 4 + ((0, c_pad - c),))
    xf = vol[0].reshape(dvol, h, w // f, LANES)
    return jnp.pad(xf, ((1, 1), (PADR, PADR),
                        (PADC, k3.SPARE_TILES + PADC), (0, 0)))


def flat_to_vol(xf: jnp.ndarray, h: int, w: int, c: int,
                c_pad: int = 32, phase: int = 0) -> jnp.ndarray:
    """Inverse of :func:`vol_to_flat` -> (1, D, H, W, C)."""
    f = LANES // c_pad
    dvol = xf.shape[0] - 2
    tiles = w // f + (1 if phase else 0)
    core = xf[1:1 + dvol, PADR:PADR + h, PADC:PADC + tiles, :]
    x = core.reshape(dvol, h, tiles * f, c_pad)[None]
    return x[:, :, :, phase:phase + w, :c]


def _build_kernel(h, wc, wt, relu, n_slabs, phase_in):
    offs = k3.split_offsets(phase_in)
    phase_out = 2 - phase_in
    img_tiles = wc - k3.SPARE_TILES

    def kernel(x_hbm, w_ref, sb_ref, out_hbm, xs, ys, acc_ref,
               sem_in, sem_out):
        d = pl.program_id(0)

        # ring of 4 slab buffers: slab s lives in slot s % 4.  Iteration d
        # consumes slabs d..d+2 and prefetches slab d+3 into slot (d+3)%4 =
        # (d-1)%4 (freed last iteration), overlapping DMA with compute and
        # loading each input slab from HBM exactly once (the serial 3-slab
        # copy per iteration cost 3x the traffic plus a full DMA stall).
        def slab_copy(s):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(s, 1)], xs.at[pl.ds(jax.lax.rem(s, 4), 1)],
                sem_in.at[jax.lax.rem(s, 4)])

        @pl.when(d == 0)
        def _():
            slab_copy(0).start()
            slab_copy(1).start()
            slab_copy(2).start()

        @pl.when(d + 1 < n_slabs)
        def _():
            slab_copy(d + 3).start()

        @pl.when(d == 0)
        def _():
            slab_copy(0).wait()
            slab_copy(1).wait()
        slab_copy(d + 2).wait()

        first = True
        for dz in range(3):
            slot = jax.lax.rem(d + dz, 4)
            for dy in range(3):
                for ti, t in enumerate(offs):
                    a = xs[slot, pl.ds(PADR + dy - 1, h),
                           pl.ds(PADC + t, wc), :]
                    a = a.reshape(h * wc, LANES)
                    blk = w_ref[dz * 6 + dy * 2 + ti]
                    prod = jax.lax.dot_general(
                        a, blk, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if first:
                        acc_ref[:] = prod
                        first = False
                    else:
                        acc_ref[:] += prod

        oslot = jax.lax.rem(d, 2)

        def out_copy(j, s):
            return pltpu.make_async_copy(
                ys.at[pl.ds(s, 1)], out_hbm.at[pl.ds(j + 1, 1)],
                sem_out.at[s])

        # ys[oslot] may still be draining from slab d-2 -- wait before reuse
        if n_slabs > 2:
            @pl.when(d >= 2)
            def _():
                out_copy(d - 2, oslot).wait()

        y = acc_ref[:] * sb_ref[0][None, :] + sb_ref[1][None, :]
        if relu:
            y = jnp.maximum(y, 0.0)
        y = y.reshape(h, wc, LANES).astype(ys.dtype)
        ys[oslot, PADR:PADR + h, pl.ds(PADC, wc), :] = y
        if phase_out == 2:
            # fix the 2-px spill edges (see kernels/conv3x3.py epilogue)
            lane = jax.lax.broadcasted_iota(jnp.int32, (h, 1, LANES), 2)
            ys[oslot, PADR:PADR + h, pl.ds(PADC, 1), :] = (
                y[:, 0:1, :] * (lane >= 64).astype(y.dtype))
            ys[oslot, PADR:PADR + h, pl.ds(PADC + img_tiles, 1), :] = (
                y[:, img_tiles:img_tiles + 1, :]
                * (lane < 64).astype(y.dtype))
        img_keep = img_tiles + (1 if phase_out == 2 else 0)
        # zero halos (rows, cols) so the next layer's SAME padding holds
        zrow = jnp.zeros((PADR, wt, LANES), ys.dtype)
        ys[oslot, pl.ds(0, PADR)] = zrow
        ys[oslot, pl.ds(PADR + h, PADR)] = zrow
        ys[oslot, PADR:PADR + h, pl.ds(0, PADC), :] = jnp.zeros(
            (h, PADC, LANES), ys.dtype)
        ys[oslot, PADR:PADR + h,
           pl.ds(PADC + img_keep, wt - PADC - img_keep), :] = (
            jnp.zeros((h, wt - PADC - img_keep, LANES), ys.dtype))
        out_copy(d, oslot).start()

        # last slab: drain, then write the zero halo slabs of the output
        @pl.when(d == n_slabs - 1)
        def _():
            out_copy(d, oslot).wait()
            if n_slabs > 1:
                out_copy(d - 1, 1 - oslot).wait()
            ys[oslot] = jnp.zeros(ys.shape[1:], ys.dtype)
            cp0 = pltpu.make_async_copy(
                ys.at[pl.ds(oslot, 1)], out_hbm.at[pl.ds(0, 1)],
                sem_out.at[oslot])
            cp0.start()
            cp0.wait()
            cp1 = pltpu.make_async_copy(
                ys.at[pl.ds(oslot, 1)],
                out_hbm.at[pl.ds(n_slabs + 1, 1)], sem_out.at[oslot])
            cp1.start()
            cp1.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("relu", "phase_in"))
def _conv3d_call(xf, w_blocks, scale_bias, *, relu, phase_in=0):
    slabs, rows, wt, _ = xf.shape
    n_slabs = slabs - 2
    h = rows - 2 * PADR
    wc = wt - 2 * PADC

    kernel = _build_kernel(h, wc, wt, relu, n_slabs, phase_in)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(n_slabs,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((slabs, rows, wt, LANES), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, rows, wt, LANES), xf.dtype),
            pltpu.VMEM((2, rows, wt, LANES), xf.dtype),
            pltpu.VMEM((h * wc, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 18 * n_slabs * h * wc * LANES * LANES,
            bytes_accessed=4 * slabs * rows * wt * LANES * 2,
            transcendentals=0),
    )(xf, w_blocks.astype(xf.dtype), scale_bias)


def fused_conv3d_flat(xf, spec: Conv3dSpec):
    sb = jnp.stack([spec.scale, spec.bias]).astype(jnp.float32)
    return _conv3d_call(xf, spec.blocks, sb, relu=spec.relu,
                        phase_in=spec.phase_in)


def build_cost_filter_plan(params, batch_stats, c_pad: int = 32
                           ) -> list[Conv3dSpec]:
    """Fold CostFilter3D Flax params (models/stereo_net.py:52-67) into specs:
    four ConvBN(3,3,3)+ReLU layers then a bias-only Conv3d collapsing to 1."""
    specs: list[Conv3dSpec] = []
    phase = 0
    for i in range(4):
        conv_p = params[f"ConvBN_{i}"]["Conv_0"]
        bn_p = params[f"ConvBN_{i}"]["BatchNorm_0"]
        bn_s = batch_stats[f"ConvBN_{i}"]["BatchNorm_0"]
        w = np.asarray(conv_p["kernel"], np.float32)
        blocks = fold_conv3d_weights(w, phase, c_pad, c_pad)
        scale, bias = k3.fold_bn_scale_bias(
            jnp.asarray(bn_p["scale"], jnp.float32),
            jnp.asarray(bn_p["bias"], jnp.float32),
            jnp.asarray(bn_s["mean"], jnp.float32),
            jnp.asarray(bn_s["var"], jnp.float32),
            1e-5, w.shape[-1], c_pad)
        specs.append(Conv3dSpec(blocks, scale, bias, True, phase))
        phase = 2 - phase

    head = params["Conv_0"]
    w = np.asarray(head["kernel"], np.float32)
    blocks = fold_conv3d_weights(w, phase, c_pad, c_pad)
    scale, bias = k3.plain_scale_bias(
        jnp.asarray(head["bias"], jnp.float32), w.shape[-1], c_pad)
    specs.append(Conv3dSpec(blocks, scale, bias, False, phase))
    return specs


def fast_cost_filter(vol: jnp.ndarray, specs: Sequence[Conv3dSpec],
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B=1, D, h, w, C) difference volume -> (B=1, D, h, w) filtered cost,
    kernel-path equivalent of ``CostFilter3D.apply(..., train=False)``."""
    b, dvol, h, w, c = vol.shape
    xf = vol_to_flat(vol.astype(dtype))
    for spec in specs:
        xf = fused_conv3d_flat(xf, spec)
    final_phase = 2 - specs[-1].phase_in
    # (1, D, h, w, 1), channel 0 = cost
    out = flat_to_vol(xf, h, w, 1, phase=final_phase)
    return out[..., 0].astype(jnp.float32)
