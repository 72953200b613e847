"""Resampling ops: resize (nearest / bilinear / trilinear) and disparity warping.

These re-implement, in pure JAX gather arithmetic, the exact semantics the
reference framework gets from ``torch.nn.functional.interpolate`` and
``torch.nn.functional.grid_sample`` (reference model/mobile_stereo_net_v2.py:59-96,
model/mobile_stereo_net.py:75-80,156).  TPU notes:

* All resizes are separable per-axis linear maps with *static* gather indices,
  so XLA lowers them to concats-of-slices / one-hot matmuls rather than
  dynamic gathers.
* ``grid_sample`` has no JAX equivalent; :func:`grid_sample_2d` implements
  bilinear sampling with zeros padding and ``align_corners=False`` coordinate
  semantics via four flattened-index gathers.
* Everything is NHWC (channels-last = TPU lane dimension).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Separable resize (torch F.interpolate semantics, antialias=False)
# ---------------------------------------------------------------------------


def _nearest_indices(out_size: int, in_size: int) -> jnp.ndarray:
    """torch 'nearest' (legacy) index rule: src = floor(dst * in/out)."""
    scale = in_size / out_size
    idx = jnp.floor(jnp.arange(out_size, dtype=jnp.float32) * scale).astype(jnp.int32)
    return jnp.clip(idx, 0, in_size - 1)


def _linear_indices_weights(out_size: int, in_size: int):
    """torch 'bilinear/linear', align_corners=False, antialias=False.

    src = (dst + 0.5) * (in/out) - 0.5, clamped below at 0 (torch clamps the
    source coordinate to >= 0 before splitting into floor + fraction).
    """
    scale = in_size / out_size
    x = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    x = jnp.maximum(x, 0.0)
    x0 = jnp.floor(x)
    t = x - x0
    i0 = jnp.clip(x0.astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    return i0, i1, t


def _resize_axis_nearest(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    return jnp.take(x, _nearest_indices(out_size, in_size), axis=axis)


def _resize_axis_linear(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, t = _linear_indices_weights(out_size, in_size)
    v0 = jnp.take(x, i0, axis=axis)
    v1 = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    t = t.reshape(shape).astype(v0.dtype)
    return v0 + t * (v1 - v0)


def resize_nearest(x: jnp.ndarray, out_hw, *, h_axis: int = 1, w_axis: int = 2):
    """Nearest-neighbour resize (torch F.interpolate default mode)."""
    x = _resize_axis_nearest(x, out_hw[0], h_axis)
    x = _resize_axis_nearest(x, out_hw[1], w_axis)
    return x


def resize_bilinear(x: jnp.ndarray, out_hw, *, h_axis: int = 1, w_axis: int = 2):
    """Bilinear resize, align_corners=False, no antialias (torch semantics)."""
    x = _resize_axis_linear(x, out_hw[0], h_axis)
    x = _resize_axis_linear(x, out_hw[1], w_axis)
    return x


def resize_trilinear(x: jnp.ndarray, out_dhw, *, d_axis: int = 1, h_axis: int = 2,
                     w_axis: int = 3):
    """Trilinear resize over (D, H, W) axes (torch mode='trilinear',
    align_corners=False).  Used by MobileStereoNetV4's cost-volume upsample
    (reference model/mobile_stereo_net_v4.py:477-478)."""
    x = _resize_axis_linear(x, out_dhw[0], d_axis)
    x = _resize_axis_linear(x, out_dhw[1], h_axis)
    x = _resize_axis_linear(x, out_dhw[2], w_axis)
    return x


# ---------------------------------------------------------------------------
# grid_sample replacement
# ---------------------------------------------------------------------------


def grid_sample_2d(image: jnp.ndarray, x_pix: jnp.ndarray, y_pix: jnp.ndarray):
    """Bilinear sample ``image`` (B, H, W, C) at pixel coords with zeros padding.

    Matches torch ``F.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=False)`` once normalized grid coords are converted to pixel
    coords (``x_pix = ((gx + 1) * W - 1) / 2``).

    Args:
      image: (B, H, W, C).
      x_pix, y_pix: (B, H', W') sample locations in *pixel* space.

    Returns:
      (B, H', W', C) sampled values; out-of-bounds taps contribute zero.
    """
    b, h, w, c = image.shape
    compute_dtype = image.dtype

    x0f = jnp.floor(x_pix)
    y0f = jnp.floor(y_pix)
    tx = (x_pix - x0f).astype(compute_dtype)[..., None]
    ty = (y_pix - y0f).astype(compute_dtype)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    flat = image.reshape(b, h * w, c)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        idx = (yc * w + xc).reshape(b, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(*yi.shape, c)
        return vals * valid[..., None].astype(compute_dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)

    top = v00 + tx * (v01 - v00)
    bot = v10 + tx * (v11 - v10)
    return top + ty * (bot - top)


def warp_by_flow_map(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp ``image`` by a (negative-disparity) flow map.

    TPU-native equivalent of the reference's grid_sample warp
    (model/mobile_stereo_net_v2.py:59-96, tools/warp.py:5-42), including the
    subtle ``align_corners=False`` renormalization: the reference builds a
    normalized grid with ``2*x/(W-1) - 1`` and samples with
    align_corners=False, which composes to ``x_pix = x * W/(W-1) - 0.5`` --
    *also on the identity y-axis* for 1-channel flows.

    Args:
      image: (B, H, W, C).
      flow: (B, H, W, 1) horizontal flow, or (B, H, W, 2) horizontal+vertical.

    Returns:
      (B, H, W, C) warped image; samples from ``x - flow_x`` (and
      ``y - flow_y`` for 2-channel flows).
    """
    b, h, w, fc = flow.shape
    assert fc in (1, 2), f"invalid flow map dimension 1 or 2 ({fc})!"

    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]

    x = gx - flow[..., 0].astype(jnp.float32)
    if fc == 2:
        y = gy - flow[..., 1].astype(jnp.float32)
    else:
        y = jnp.broadcast_to(gy, (b, h, w))

    x_pix = x * (w / (w - 1.0)) - 0.5
    y_pix = y * (h / (h - 1.0)) - 0.5
    return grid_sample_2d(image, x_pix, y_pix)


def _vertical_identity_blend(image: jnp.ndarray) -> jnp.ndarray:
    """Static two-row blend implementing the vertical half of the reference's
    align_corners=False renormalization (``y_pix = r * h/(h-1) - 0.5``) for
    1-channel horizontal flows, where the sampled row is fixed per output row.
    Shared by the banded and matmul warps."""
    b, h, w, c = image.shape
    dt = image.dtype
    r = np.arange(h)
    y_pix = r * (h / (h - 1.0)) - 0.5
    y0 = np.floor(y_pix).astype(np.int32)
    ty = (y_pix - y0).astype(np.float32)
    wa = jnp.asarray((1.0 - ty) * ((y0 >= 0) & (y0 < h)), dt)
    wb = jnp.asarray(ty * ((y0 + 1 >= 0) & (y0 + 1 < h)), dt)
    ia = jnp.asarray(np.clip(y0, 0, h - 1))
    ib = jnp.asarray(np.clip(y0 + 1, 0, h - 1))
    return (jnp.take(image, ia, axis=1) * wa[None, :, None, None]
            + jnp.take(image, ib, axis=1) * wb[None, :, None, None])


def _selection_warp_rows(blend: jnp.ndarray, flow_x: jnp.ndarray,
                         w: int) -> jnp.ndarray:
    """Selection-matrix contraction on a (B, Hb, W, C) row block.

    Builds ``P[x, j]`` -- the two bilinear tap weights of output pixel ``x``
    on input pixel ``j`` -- by iota comparisons and contracts on the MXU.
    """
    dt = blend.dtype
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x_pix = (gx - flow_x.astype(jnp.float32)) * (w / (w - 1.0)) - 0.5
    x0f = jnp.floor(x_pix)
    tx = (x_pix - x0f).astype(dt)[..., None]                  # (B, Hb, W, 1)
    x0 = x0f.astype(jnp.int32)[..., None]                     # (B, Hb, W, 1)
    j = jnp.arange(w, dtype=jnp.int32)[None, None, None, :]   # iota over taps
    # one-hot taps vanish for x0 outside [0, w) = zeros padding semantics
    p = (jnp.where(j == x0, 1.0 - tx, jnp.zeros((), dt))
         + jnp.where(j == x0 + 1, tx, jnp.zeros((), dt)))     # (B, Hb, W, W)
    return jax.lax.dot_general(
        p, blend, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32).astype(dt)


# peak bytes allowed for the (B, Hb, W, W) selection matrix of one row block
_SELECTION_BLOCK_BYTES = 256 * 1024 * 1024


def warp_by_flow_map_matmul(image: jnp.ndarray, flow: jnp.ndarray, *,
                            row_block: int | None = None) -> jnp.ndarray:
    """Horizontal-flow warp as a per-row selection-matrix contraction (MXU).

    Mathematically equal to :func:`warp_by_flow_map` for 1-channel flows of
    *any* magnitude (no band limit): each output row is ``P @ row`` where
    ``P[x, j]`` holds the two bilinear tap weights of output pixel ``x`` on
    input pixel ``j`` (zero outside the image -- torch's
    ``padding_mode='zeros'``).  ``P`` is built from the flow by iota
    comparisons -- O(W^2) cheap VPU compares per row, C-independent -- and the
    contraction runs on the MXU as a (B*H)-batched (W, W) @ (W, C) matmul, so
    the per-channel cost that makes XLA's gather lowering slow (~17 ms per
    32-channel refine level fwd+bwd at batch 8, 240x320) and the unrolled
    band's VPU cost (scales with shifts x C) both collapse into dense matmul
    FLOPs.  Gradients are matmuls too (d_image = P^T @ g, d_flow via
    g @ image^T), with no scatter anywhere.

    ``P`` is an O(W^2)-memory intermediate (~2.4 GB bf16 at batch-1 720p, and
    needed again by both backward products), so rows are processed in
    ``row_block``-row blocks by an UNROLLED slice loop, each block under
    ``jax.checkpoint``: peak *live* memory is one block's ``(B, Hb, W, W)``
    in forward and backward (each block's ``P`` is rebuilt from the flow --
    cheap VPU compares).  Unrolled slices, not ``lax.scan``: the scan's
    moveaxis-packed xs and serialized steps measured +16 ms on the v3 720p
    inference path, while unrolled blocks match the monolithic product's
    speed.  The default block size bounds the block matrix at ~256 MB.

    Args:
      image: (B, H, W, C).
      flow: (B, H, W, 1) horizontal flow (the models pass positive disparity
        before the final negation).
      row_block: rows per block (any positive int); default auto-sized.

    Returns:
      (B, H, W, C) warped image, bit-matched to the gather path's semantics.
    """
    b, h, w, c = image.shape
    assert flow.shape[-1] == 1, flow.shape
    dt = image.dtype

    blend = _vertical_identity_blend(image)
    flow_x = flow[..., 0]

    if row_block is None:
        per_row = b * w * w * jnp.dtype(dt).itemsize
        row_block = max(1, min(h, _SELECTION_BLOCK_BYTES // max(per_row, 1)))
    if row_block >= h:
        return _selection_warp_rows(blend, flow_x, w)

    block = jax.checkpoint(
        lambda bl, fl: _selection_warp_rows(bl, fl, w))
    parts = [block(blend[:, s:s + row_block], flow_x[:, s:s + row_block])
             for s in range(0, h, row_block)]
    return jnp.concatenate(parts, axis=1)


def _selection_warp_rows_banded(blend: jnp.ndarray, flow_x: jnp.ndarray,
                                w: int, max_shift: int) -> jnp.ndarray:
    """Banded x-tiled selection contraction on a (B, Hb, W, C) row block.

    The dense selection matrix (:func:`_selection_warp_rows`) spends
    O(W^2) compares + matmul FLOPs per row although each output pixel's two
    taps lie within a STATIC band: with flow in [0, max_shift],
    ``x0(x) in [x - max_shift - 1, x]``.  Tiling outputs into 128-pixel
    blocks and giving each block only its ``band``-wide input window (a
    static slice) cuts compares and MXU work by ``W / band`` (3.7x at 720p
    with max_shift 208) while staying pure XLA -- the partitioner still
    fuses the P build into the batched matmul, and gradients remain
    matmuls.  Out-of-band flows contribute zero (the banded-warp contract,
    :func:`warp_by_flow_map_banded`); in-band results are bit-identical to
    the dense path (same compares, same dot order per tile).
    """
    dt = blend.dtype
    b, hb, _, c = blend.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x_pix = (gx - flow_x.astype(jnp.float32)) * (w / (w - 1.0)) - 0.5
    x0f = jnp.floor(x_pix)
    tx_all = (x_pix - x0f).astype(dt)
    x0_all = x0f.astype(jnp.int32)

    tile = 128
    # tap span of a tile is [xt - ms - 1, xt + m]: m + ms + 2 wide; +7 slack
    # so the 8-aligned window start below still covers both ends
    band = -(-(max_shift + tile + 9) // 8) * 8
    band = min(band, w)
    parts = []
    for xt in range(0, w, tile):
        m = min(tile, w - xt)
        # static window [ws, ws+band) covering every valid tap of this tile
        ws = min(max((xt + m + 8 - band) // 8 * 8, 0), w - band)
        x0 = x0_all[..., xt:xt + m, None]                  # (B, Hb, m, 1)
        tx = tx_all[..., xt:xt + m, None]
        j = ws + jnp.arange(band, dtype=jnp.int32)[None, None, None, :]
        # exact banded-warp semantics independent of the window size: tap
        # offsets outside [-1, max_shift + 1] contribute zero (matches
        # warp_by_flow_map_banded's k band) even when the whole row fits in
        # one window
        off = (xt + jnp.arange(m, dtype=jnp.int32))[None, None, :, None] - x0
        q = ((off >= -1) & (off <= max_shift + 1)).astype(dt)
        p = q * (jnp.where(j == x0, 1.0 - tx, jnp.zeros((), dt))
                 + jnp.where(j == x0 + 1, tx, jnp.zeros((), dt)))
        win = jax.lax.slice_in_dim(blend, ws, ws + band, axis=2)
        parts.append(jax.lax.dot_general(
            p, win, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32).astype(dt))
    return jnp.concatenate(parts, axis=2)


def warp_by_flow_map_matmul_banded(image: jnp.ndarray, flow: jnp.ndarray,
                                   max_shift: int, *,
                                   row_block: int | None = None
                                   ) -> jnp.ndarray:
    """Banded selection-matrix warp: :func:`warp_by_flow_map_matmul` with a
    static tap band (flow in ``[0, max_shift]``; out-of-band pixels get
    zero, matching :func:`warp_by_flow_map_banded`'s contract).  ~band/W of
    the dense warp's compare + MXU work; the production choice for wide
    (C > 8) guidance wherever the model bounds the disparity
    (models/fast_infer.py, kernels/refine_stack.py).
    """
    b, h, w, c = image.shape
    assert flow.shape[-1] == 1, flow.shape
    blend = _vertical_identity_blend(image)
    flow_x = flow[..., 0]

    if row_block is None:
        band = min(-(-(max_shift + 130) // 8) * 8, w)
        per_row = b * w * band * jnp.dtype(image.dtype).itemsize
        row_block = max(1, min(h, _SELECTION_BLOCK_BYTES // max(per_row, 1)))
    if row_block >= h:
        return _selection_warp_rows_banded(blend, flow_x, w, max_shift)

    block = jax.checkpoint(
        lambda bl, fl: _selection_warp_rows_banded(bl, fl, w, max_shift))
    parts = [block(blend[:, s:s + row_block], flow_x[:, s:s + row_block])
             for s in range(0, h, row_block)]
    return jnp.concatenate(parts, axis=1)


def warp_by_flow_map_banded(image: jnp.ndarray, flow: jnp.ndarray,
                            max_shift: int) -> jnp.ndarray:
    """Horizontal-flow warp as a banded sum of STATIC shifts -- gather-free.

    Mathematically equal to :func:`warp_by_flow_map` for 1-channel flows
    in ``[0, max_shift]``; out-of-band flows contribute zero instead of
    sampling.  XLA TPU
    lowers gathers/scatters to near-scalar loops (~20 ms for a 5 MB warp at
    batch 8, 240x320, and ~100 ms for its image gradient); this banded form
    is pure shifted selects -- vectorized, fused, and with shift-based
    (scatter-free) transposes under autodiff, it needs no custom VJP.

    The vertical axis of the reference's align_corners=False renormalization
    (see :func:`warp_by_flow_map`) is static per row for 1-channel flows and
    becomes a fixed two-row blend.

    Args:
      image: (B, H, W, C).
      flow: (B, H, W, 1) horizontal flow in ``[0, max_shift]`` -- the
        positive disparity the models warp by before the final negation.
      max_shift: static bound on the flow, e.g. the model's ``max_disp``
        scaled to this level's resolution.
    """
    b, h, w, c = image.shape
    assert flow.shape[-1] == 1, flow.shape
    dt = image.dtype

    # vertical: y_pix = r * h/(h-1) - 0.5 -- static per row
    blend = _vertical_identity_blend(image)

    # horizontal: x_pix = (x + disp_neg) * w/(w-1) - 0.5 with disp_neg =
    # flow <= 0; tap offset k = x - floor(x_pix) in [0, max_shift + 1]
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x_pix = (gx - flow[..., 0].astype(jnp.float32)) * (w / (w - 1.0)) - 0.5
    x0f = jnp.floor(x_pix)
    tx = (x_pix - x0f).astype(dt)[..., None]
    x0 = x0f.astype(jnp.int32)
    off = jnp.arange(w, dtype=jnp.int32)[None, None, :] - x0  # (B, H, W)

    def shifted(k):
        """blend[x - k] with zero fill (SAME zero padding semantics)."""
        if abs(k) >= w:
            return jnp.zeros_like(blend)
        if k < 0:
            pad = jnp.zeros((b, h, -k, c), dt)
            return jnp.concatenate([blend[:, :, -k:], pad], axis=2)
        if k == 0:
            return blend
        pad = jnp.zeros((b, h, k, c), dt)
        return jnp.concatenate([pad, blend[:, :, :-k]], axis=2)

    out = jnp.zeros_like(blend)
    # off == k selects tap x0 = x - k; the k-1 shift provides x0 + 1.
    # sampling position is x - flow with flow in [0, max_shift] (the
    # models pass positive disparity, mobile_stereo_net_v2.py:59-96), so
    # the tap offset band is k in [-1, max_shift + 1]; shifts beyond the
    # image width are identically zero
    for k in range(-1, min(max_shift + 1, w) + 1):
        m = (off == k)[..., None]
        tap0 = shifted(k)
        tap1 = shifted(k - 1)
        contrib = (1.0 - tx) * tap0 + tx * tap1
        out = out + jnp.where(m, contrib, jnp.zeros((), dt))
    return out
