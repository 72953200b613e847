"""Differentiable fused conv3x3 on the flat lane-folded layout (training path).

XLA's autodiff of a C=32 spatial convolution is the training bottleneck: at
batch 4, 480x640 the measured cost is ~3 ms forward / ~13 ms backward *per
conv* (the wgrad at 32 channels is the worst offender), putting the v1 train
step at 321 ms -- while the inference Pallas kernel (kernels/conv3x3.py) runs
the same conv in ~0.3 ms.  This module makes that kernel differentiable:

* ``flat_conv3x3(xf, w, dilation, phase_in)`` -- a :func:`jax.custom_vjp`
  pure conv (no epilogue) on flat activations.  Forward runs the fused
  Pallas kernel with an identity epilogue.
* **dx** is the same Pallas kernel applied to the output cotangent with the
  spatially-flipped, in/out-transposed weights (the adjoint of a SAME
  zero-padded conv is a SAME conv) -- same dilation, phase-aware.
* **dw** contracts each folded weight block's input window against the
  cotangent: ``dW_b = a_b^T @ g`` with both operands (M, 128) and M = all
  core pixels -- full-lane MXU reductions instead of XLA's 32-channel wgrad
  -- then unfolds through the transpose of the (static, one-hot) fold map.

Weight folding here is *traced* (einsum against a precomputed one-hot
selector) so gradients flow to the canonical (3, 3, 32, 32) HWIO weights;
the numpy-time folds in kernels/conv3x3.py stay for the inference path.

Batching: images are stacked along the flat row axis with ``PADR`` zero gap
rows between them (``to_flat_batch``); the conv kernel sees one tall image,
and the >= dilation-wide zero gaps preserve per-image SAME padding.  The gap
rows stay zero through pure convs; epilogues applied in XLA (BN bias etc.)
must re-mask them (see models/fast_train.py).

Reference semantics anchored at model/mobile_stereo_net.py:30-43 (conv_3x3)
-- geometry identical to torch Conv2d(k=3, padding=d, dilation=d).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realtime_stereo_matcher_tpu.kernels import conv3x3 as k3

LANES = k3.LANES
PADR = k3.PADR
PADC = k3.PADC_TILES
SPARE = k3.SPARE_TILES
F = 4  # lane fold: 4 px x 32 ch


def _build_dw_kernel(th, wc, wt, d, offs, per_dy, n_blocks, n):
    """Single-pass weight-gradient reduction: stream x and g tiles once,
    accumulate all folded blocks ``dW_b = a_b^T @ g`` in VMEM.

    Replaces ``n_blocks`` separate XLA dots that each re-stream the full
    activation from HBM (~1.2 ms/conv at batch 4, 480x640) with one
    double-buffered pass (~0.3 ms/conv)."""

    def kernel(x_hbm, g_hbm, out_ref, xs2, gs2, acc_ref, sem_x, sem_g):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)

        def x_copy(j, s):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(PADR + j * th - d, th + 2 * d)],
                xs2.at[s], sem_x.at[s])

        def g_copy(j, s):
            return pltpu.make_async_copy(
                g_hbm.at[pl.ds(PADR + j * th, th)], gs2.at[s], sem_g.at[s])

        @pl.when(i == 0)
        def _():
            x_copy(0, 0).start()
            g_copy(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            x_copy(i + 1, 1 - slot).start()
            g_copy(i + 1, 1 - slot).start()

        x_copy(i, slot).wait()
        g_copy(i, slot).wait()

        g2 = gs2[slot, :, pl.ds(PADC, wc), :].reshape(th * wc, LANES)
        for b in range(n_blocks):
            dy = (b // per_dy) * d  # xs row 0 == image row (base - d)
            t = offs[b % per_dy]
            a = xs2[slot, pl.ds(dy, th), pl.ds(PADC + t, wc), :]
            a = a.reshape(th * wc, LANES)
            prod = jax.lax.dot_general(
                a, g2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(i == 0)
            def _():
                acc_ref[b] = prod

            @pl.when(i > 0)
            def _():
                acc_ref[b] += prod

        @pl.when(i == n - 1)
        def _():
            out_ref[...] = acc_ref[...]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("dilation", "phase_in", "force9"))
def dw_reduce(xf: jnp.ndarray, g: jnp.ndarray, dilation: int, phase_in: int,
              force9: bool = False):
    """(n_blocks, 128, 128) f32 folded weight-gradient blocks of a flat conv:
    ``dW_b = sum_core_pixels a_b^T g`` with the fold's (dy, tile-offset)
    structure, in one streaming pass.  ``force9`` selects the
    phase-preserving 9-block fold (needed when x and g share a phase, e.g.
    the stride-2 adjoint)."""
    _, offs, per_dy, _ = _fold_selector(dilation, phase_in, force9)
    n_blocks = 3 * per_dy
    rows, wt, _ = xf.shape
    h = rows - 2 * PADR
    wc = wt - 2 * PADC
    d = dilation

    itemsize = jnp.dtype(xf.dtype).itemsize
    budget = 12 * 1024 * 1024

    def vmem(t):
        return (2 * (t + 2 * d) * wt + 2 * t * wt) * LANES * itemsize \
            + n_blocks * LANES * LANES * 4 * 2

    th = next(t for t in range(min(24, h), 0, -1)
              if h % t == 0 and vmem(t) <= budget)
    n = h // th
    kernel = _build_dw_kernel(th, wc, wt, d, offs, per_dy, n_blocks, n)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, LANES, LANES),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * d, wt, LANES), xf.dtype),
            pltpu.VMEM((2, th, wt, LANES), g.dtype),
            pltpu.VMEM((n_blocks, LANES, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_blocks * h * wc * LANES * LANES,
            bytes_accessed=2 * rows * wt * LANES * itemsize,
            transcendentals=0),
    )(xf, g)


@functools.lru_cache(maxsize=None)
def _fold_selector(dilation: int, phase_in: int, force9: bool = False):
    """One-hot fold map sel[ky, kx, b, j, p] plus per-block tile offsets.

    ``blocks[b, j*32+ci, p*32+co] = sum_{ky,kx} sel[ky,kx,b,j,p] w[ky,kx,ci,co]``
    reproduces fold_conv3x3_split_weights (dilation <= 2, 6 blocks, phase
    flip) / fold_conv3x3_weights (9 blocks, phase keep) exactly.
    """
    if dilation <= 2 and not force9:
        offs = k3.split_offsets(phase_in)
        shift = 2 - 2 * phase_in
        n_b = 6
        sel = np.zeros((3, 3, n_b, F, F), np.float32)
        for ky in range(3):
            for si, t in enumerate(offs):
                for j in range(F):
                    for p in range(F):
                        rel = 4 * t + j - p + shift
                        if rel % dilation:
                            continue
                        dx = rel // dilation
                        if -1 <= dx <= 1:
                            sel[ky, dx + 1, ky * 2 + si, j, p] = 1.0
        per_dy = 2
        phase_out = 2 - phase_in
    else:
        offs = k3.tile_offsets(dilation, F)
        n_b = 9
        sel = np.zeros((3, 3, n_b, F, F), np.float32)
        for ky in range(3):
            for ti, t in enumerate(offs):
                for j in range(F):
                    for p in range(F):
                        rel = t * F + j - p
                        if rel % dilation:
                            continue
                        dx = rel // dilation
                        if -1 <= dx <= 1:
                            sel[ky, dx + 1, ky * 3 + ti, j, p] = 1.0
        per_dy = 3
        phase_out = phase_in
    # numpy, not jnp: this is lru-cached, and a jnp constant created while
    # tracing would leak a tracer into later traces
    return sel, offs, per_dy, phase_out


def fold_weights_traced(w: jnp.ndarray, dilation: int, phase_in: int):
    """(3, 3, 32, 32) HWIO weights -> (n_blocks, 128, 128), differentiable."""
    sel, _, _, _ = _fold_selector(dilation, phase_in)
    blocks = jnp.einsum("yxio,yxbjp->bjipo", w.astype(jnp.float32),
                        jnp.asarray(sel))
    return blocks.reshape(blocks.shape[0], LANES, LANES)


def unfold_weight_grad(d_blocks: jnp.ndarray, dilation: int, phase_in: int,
                       force9: bool = False):
    """Adjoint of :func:`fold_weights_traced`: (n_b, 128, 128) -> (3,3,32,32)."""
    sel, _, _, _ = _fold_selector(dilation, phase_in, force9)
    db = d_blocks.reshape(d_blocks.shape[0], F, 32, F, 32)
    return jnp.einsum("bjipo,yxbjp->yxio", db, jnp.asarray(sel))


def _identity_sb():
    return jnp.ones((LANES,), jnp.float32), jnp.zeros((LANES,), jnp.float32)


def flat_tiles(w: int) -> tuple[int, int]:
    """Image tiles + padded flat width (in tiles) for an image of W pixels.

    ``tiles = W / 4`` need not be 8-aligned: the canvas is padded up to the
    next 8-aligned width with >= 8 spare tiles, and *pixel-level* image masks
    (not the kernel's structural tile mask) define validity.  For 8-aligned
    tiles this reproduces ``k3.to_flat``'s layout exactly.
    """
    assert w % F == 0, w
    tiles = w // F
    wf = -(-(tiles + SPARE) // 8) * 8
    return tiles, wf


@functools.lru_cache(maxsize=None)
def _col_lane_mask(wt: int, w_px: int, phase: int) -> np.ndarray:
    """(1, wt, 128) numpy 0/1 mask of true image *pixels* at a given phase:
    flat pixel position p = (tile - PADC) * 4 + lane//32 is an image pixel
    iff ``phase <= p < w_px + phase``.  Small enough to embed as a literal."""
    m = np.zeros((1, wt, LANES), np.float32)
    for ti in range(PADC, wt - PADC):
        for slot in range(F):
            p = (ti - PADC) * F + slot
            if phase <= p < w_px + phase:
                m[0, ti, slot * 32:(slot + 1) * 32] = 1.0
    return m


def _core_row_mask(rows: int) -> jnp.ndarray:
    """(rows, 1, 1) jnp 0/1 mask of core (non-halo) rows, built from iota so
    large flat shapes never become HLO literals."""
    r = jnp.arange(rows)[:, None, None]
    return ((r >= PADR) & (r < rows - PADR)).astype(jnp.float32)


def struct_mask_expr(rows: int, wt: int, phase: int) -> jnp.ndarray:
    """(rows, wt, 128) jnp mask of core rows x canvas columns.  Defensive
    re-zeroing of cotangents in the conv vjp; pixel-exact image masking is
    the consumer's job (``batch_image_mask``)."""
    del phase
    col = np.zeros((1, wt, LANES), np.float32)
    col[:, PADC:wt - PADC, :] = 1.0
    return _core_row_mask(rows) * jnp.asarray(col)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def flat_conv3x3(xf: jnp.ndarray, w: jnp.ndarray, dilation: int = 1,
                 phase_in: int = 0) -> jnp.ndarray:
    """Pure fused conv3x3 on a flat activation, differentiable.

    Args:
      xf: (rows, WT, 128) flat activation at pixel phase ``phase_in`` with
        zeroed halos (``to_flat`` / ``to_flat_batch`` layout).
      w: (3, 3, 32, 32) HWIO weights (pad channels to 32 before calling).
    Returns:
      (rows, WT, 128) flat conv output at the fold's output phase
      (``2 - phase_in`` for dilation <= 2, else ``phase_in``), zeroed halos.
    """
    scale, bias = _identity_sb()
    blocks = fold_weights_traced(w, dilation, phase_in)
    return k3.fused_conv3x3_flat(xf, blocks.astype(xf.dtype), scale, bias,
                                 dilation=dilation, relu=False,
                                 phase_in=phase_in)


def _conv_fwd(xf, w, dilation, phase_in):
    return flat_conv3x3(xf, w, dilation, phase_in), (xf, w)


def _conv_bwd(dilation, phase_in, res, g):
    xf, w = res
    rows, wt, _ = g.shape
    _, _, _, phase_out = _fold_selector(dilation, phase_in)

    # structural re-masking: downstream ops may carry cotangent into halo /
    # spill positions whose forward value is constant zero
    g = g * struct_mask_expr(rows, wt, phase_out).astype(g.dtype)

    # dx: SAME conv of g with rot180 + channel-transposed weights
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    scale, bias = _identity_sb()
    blocks_t = fold_weights_traced(w_t, dilation, phase_out)
    dx = k3.fused_conv3x3_flat(g, blocks_t.astype(g.dtype), scale, bias,
                               dilation=dilation, relu=False,
                               phase_in=phase_out)

    # dw: all folded blocks dW_b = a_b^T @ g in ONE streaming Pallas pass
    # (the XLA formulation re-reads the full activation per block)
    dw = unfold_weight_grad(dw_reduce(xf, g, dilation, phase_in),
                            dilation, phase_in)
    return dx.astype(xf.dtype), dw.astype(w.dtype)


flat_conv3x3.defvjp(_conv_fwd, _conv_bwd)


# ---------------------------------------------------------------------------
# batched flat layout: images stacked along rows with PADR zero gap rows


def batch_flat_geometry(b: int, h: int):
    """Row layout of a batched flat tensor: rows, per-image core row starts.

    Core rows are padded up to a multiple of 24 with zero rows (masked out)
    so the conv kernels always have a large tile-height divisor available --
    odd batch/crop combinations otherwise force th <= 8 and starve the MXU.
    """
    core = b * h + (b - 1) * PADR
    core = -(-core // 24) * 24
    rows = 2 * PADR + core
    starts = [PADR + i * (h + PADR) for i in range(b)]
    return rows, starts


def to_flat_batch(x: jnp.ndarray, c_pad: int = 32) -> jnp.ndarray:
    """(B, H, W, C) -> flat (rows, WT, 128) with PADR zero gap rows between
    images (and the usual top/bottom halos + column pads).  W needs only be
    a multiple of 4 (see :func:`flat_tiles`)."""
    b, h, w, c = x.shape
    f = LANES // c_pad
    assert f == F, (c_pad,)
    tiles, wf = flat_tiles(w)
    if c < c_pad:
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, c_pad - c),))
    rows, _ = batch_flat_geometry(b, h)
    xt = x.reshape(b, h, tiles, LANES)
    xt = jnp.pad(xt, ((0, 0), (0, PADR), (0, 0), (0, 0)))  # gap below each
    xt = xt.reshape(b * (h + PADR), tiles, LANES)
    # top halo + row padding to the 24-aligned core + bottom halo (the last
    # image's appended gap supplies PADR of it)
    xt = jnp.pad(xt, ((PADR, rows - PADR - xt.shape[0]),
                      (PADC, wf - tiles + PADC), (0, 0)))
    return xt


def from_flat_batch(xf: jnp.ndarray, b: int, h: int, w: int, c: int,
                    c_pad: int = 32, phase: int = 0) -> jnp.ndarray:
    """Inverse of :func:`to_flat_batch` -> (B, H, W, C)."""
    f = LANES // c_pad
    tiles = -(-(phase + w) // f)
    outs = []
    _, starts = batch_flat_geometry(b, h)
    for s in starts:
        core = jax.lax.slice(xf, (s, PADC, 0),
                             (s + h, PADC + tiles, LANES))
        img = core.reshape(h, tiles * f, c_pad)[None]
        outs.append(img[:, :, phase:phase + w, :c])
    return jnp.concatenate(outs, axis=0)


def batch_image_mask(rows: int, wt: int, b: int, h: int, w_px: int,
                     phase: int):
    """(rows, wt, 128) jnp 0/1 mask of true image positions in a batched
    flat tensor: image pixels (pixel-exact in W) minus inter-image gap rows.
    Row masks are iota expressions (a fused broadcast at run time) -- a
    literal mask at full-resolution shapes would be a >100 MB HLO constant."""
    row = _core_row_mask(rows)
    # image rows satisfy (r - PADR) mod (h + PADR) < h, below the tail of
    # the last image (alignment pad rows would alias the modulus)
    r = jnp.arange(rows)[:, None, None]
    tail = PADR + b * h + (b - 1) * PADR
    row = row * (((r - PADR) % (h + PADR) < h) & (r < tail)
                 ).astype(jnp.float32)
    return row * jnp.asarray(_col_lane_mask(wt, w_px, phase))


# ---------------------------------------------------------------------------
# stride-2 conv with kernel-path backward (the encoder's downsampling convs)


@jax.custom_vjp
def conv3x3_s2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """NHWC stride-2 3x3 conv (torch padding=1 geometry), XLA forward with
    kernel-path backward.

    The adjoint of a stride-2 conv factors through the zero-upsampled
    cotangent ``u[2i, 2j] = g[i, j]``: ``dx = SAME-conv(u, rot180(w)^T)``
    and ``dw = s1-conv weight grad between x and u`` -- both exactly the
    stride-1 flat kernels (:func:`flat_conv3x3`, :func:`dw_reduce`).

    Measured note: at the v1 reference config the zero-upsampled adjoint
    pays full-resolution kernel passes and loses to XLA's native stride-2
    backward (93 -> 100 ms step), so the encoder does NOT use this path;
    it is kept as a tested building block for configs where the stride-2
    convs dominate.

    Args:
      x: (B, H, W, Cin), H and W even, Cin <= 32.
      w: (3, 3, Cin, Cout) HWIO, Cout <= 32.
    Returns:
      (B, H/2, W/2, Cout).
    """
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _s2_fwd(x, w):
    return conv3x3_s2(x, w), (x, w)


def _s2_bwd(res, g):
    x, w = res
    b, h, w_px, ci = x.shape
    co = g.shape[-1]

    # zero-upsample the cotangent to full resolution
    u = g[:, :, None, :, None, :]
    u = jnp.pad(u, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 1), (0, 0)))
    u = u.reshape(b, h, w_px, co)

    wp = jnp.pad(jnp.asarray(w, jnp.float32),
                 ((0, 0), (0, 0), (0, 32 - ci), (0, 32 - co)))
    w_t = jnp.flip(wp, axis=(0, 1)).transpose(0, 1, 3, 2)

    uf = to_flat_batch(u.astype(x.dtype), 32)
    dxf = flat_conv3x3(uf, w_t, 1, 0)
    dx = from_flat_batch(dxf, b, h, w_px, ci, phase=2)

    # x and u are both at phase 0 -> the phase-preserving 9-block fold
    xf = to_flat_batch(x, 32)
    dw = unfold_weight_grad(dw_reduce(xf, uf, 1, 0, force9=True), 1, 0,
                            force9=True)
    return dx.astype(x.dtype), dw[:, :, :ci, :co].astype(w.dtype)


conv3x3_s2.defvjp(_s2_fwd, _s2_bwd)
