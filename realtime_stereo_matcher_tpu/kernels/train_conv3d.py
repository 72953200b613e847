"""Differentiable fused 3x3x3 convolution on the flat volume layout.

Training-path counterpart of :mod:`kernels.cost_filter3d` (which is
inference-only: eval BN folded at plan-build time).  Mirrors
:mod:`kernels.train_conv`:

* ``flat_conv3d(xf3, w, phase_in)`` -- custom_vjp pure conv over a
  ``(slabs, rows, WT, 128)`` flat volume (slab = one disparity level in the
  2D flat layout of kernels/conv3x3.py, one zero halo slab at each end).
* **dx** is the same kernel with the kernel flipped along all three spatial
  axes and channels transposed.
* **dw** contracts each of the 18 folded blocks' input windows against the
  cotangent over all core voxels -- full-lane MXU reductions -- then unfolds
  through the transpose of the one-hot fold map.

Batching: volumes are stacked along the *slab* axis with one zero gap slab
between images (``vol_to_flat_batch``) -- the 3x3x3 conv's single-slab halo
makes one zero slab exactly the per-image SAME padding in depth, the same
trick kernels/train_conv.py plays along rows.  Outputs at gap slabs are
garbage and must be re-masked by the consumer (``batch_slab_mask``).

Reference semantics: the 5-layer Conv3d cost filter of
model/mobile_stereo_net.py:103-117.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from realtime_stereo_matcher_tpu.kernels import conv3x3 as k3
from realtime_stereo_matcher_tpu.kernels import cost_filter3d as cf3
from realtime_stereo_matcher_tpu.kernels.train_conv import (
    _col_lane_mask,
    _core_row_mask,
    _fold_selector,
    flat_tiles,
)

LANES = k3.LANES
PADR = k3.PADR
PADC = k3.PADC_TILES
F = 4


def fold_weights3d_traced(w: jnp.ndarray, phase_in: int) -> jnp.ndarray:
    """(3, 3, 3, 32, 32) DHWIO weights -> (18, 128, 128), differentiable.

    Block order matches :func:`cost_filter3d.fold_conv3d_weights`:
    ``blocks[dz*6 + b2]`` is the 2D split fold of slice ``w[dz]``.
    """
    sel, _, _, _ = _fold_selector(1, phase_in)  # (3, 3, 6, F, F)
    blocks = jnp.einsum("zyxio,yxbjp->zbjipo", w.astype(jnp.float32),
                        jnp.asarray(sel))
    return blocks.reshape(18, LANES, LANES)


def unfold_weight_grad3d(d_blocks: jnp.ndarray, phase_in: int) -> jnp.ndarray:
    """Adjoint of :func:`fold_weights3d_traced`: (18,128,128) -> (3,3,3,32,32)."""
    sel, _, _, _ = _fold_selector(1, phase_in)
    db = d_blocks.reshape(3, 6, F, 32, F, 32)
    return jnp.einsum("zbjipo,yxbjp->zyxio", db, jnp.asarray(sel))


def _identity_sb():
    return jnp.stack([jnp.ones((LANES,), jnp.float32),
                      jnp.zeros((LANES,), jnp.float32)])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def flat_conv3d(xf3: jnp.ndarray, w: jnp.ndarray, phase_in: int = 0):
    """Pure fused 3x3x3 conv on a flat volume, differentiable.

    Args:
      xf3: (slabs, rows, WT, 128) flat volume at pixel phase ``phase_in``
        with zero halo slabs/rows/cols.
      w: (3, 3, 3, 32, 32) DHWIO weights (channel-pad to 32 first).
    Returns:
      same-shape flat volume at phase ``2 - phase_in``, zeroed halos.
    """
    blocks = fold_weights3d_traced(w, phase_in)
    return cf3._conv3d_call(xf3, blocks.astype(xf3.dtype), _identity_sb(),
                            relu=False, phase_in=phase_in)


def _conv3d_fwd(xf3, w, phase_in):
    return flat_conv3d(xf3, w, phase_in), (xf3, w)


def _conv3d_bwd(phase_in, res, g):
    xf3, w = res
    slabs, rows, wt, _ = g.shape
    phase_out = 2 - phase_in
    n = slabs - 2
    h = rows - 2 * PADR
    wc = wt - 2 * PADC

    # defensive structural re-mask (core slabs x core rows x canvas cols)
    s = jnp.arange(slabs)[:, None, None, None]
    smask = ((s >= 1) & (s < slabs - 1)).astype(jnp.float32)
    col = np.zeros((1, 1, wt, LANES), np.float32)
    col[..., PADC:wt - PADC, :] = 1.0
    g = g * (smask * _core_row_mask(rows)[None] * jnp.asarray(col)
             ).astype(g.dtype)

    # dx: conv3d of g with the kernel flipped in z, y, x + channel transpose
    w_t = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    blocks_t = fold_weights3d_traced(w_t, phase_out)
    dx = cf3._conv3d_call(g, blocks_t.astype(g.dtype), _identity_sb(),
                          relu=False, phase_in=phase_out)

    # dw: dW_b = a_b^T @ g over all core voxels (18 full-lane reductions)
    _, offs, _, _ = _fold_selector(1, phase_in)
    g_core = jax.lax.slice(g, (1, PADR, PADC, 0),
                           (1 + n, PADR + h, PADC + wc, LANES))
    g2 = g_core.reshape(n * h * wc, LANES)
    d_blocks = []
    for b in range(18):
        dz, b2 = b // 6, b % 6
        dy = b2 // 2
        t = offs[b2 % 2]
        a = jax.lax.slice(
            xf3, (dz, PADR + dy - 1, PADC + t, 0),
            (dz + n, PADR + dy - 1 + h, PADC + t + wc, LANES))
        d_blocks.append(jax.lax.dot_general(
            a.reshape(n * h * wc, LANES), g2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
    dw = unfold_weight_grad3d(jnp.stack(d_blocks), phase_in)
    return dx.astype(xf3.dtype), dw.astype(w.dtype)


flat_conv3d.defvjp(_conv3d_fwd, _conv3d_bwd)


# ---------------------------------------------------------------------------
# batched flat volume: images stacked along slabs with one zero gap slab


def vol_slab_geometry(b: int, d: int):
    """Slab layout: total slabs, per-image first-core-slab indices."""
    slabs = 1 + b * (d + 1)
    starts = [1 + i * (d + 1) for i in range(b)]
    return slabs, starts


def vol_to_flat_batch(vol: jnp.ndarray, c_pad: int = 32) -> jnp.ndarray:
    """(B, D, H, W, C) -> (1 + B*(D+1), PADR+H+PADR, WT, 128) flat volume.

    Each slab is a batch-1 2D flat layout; one zero slab separates images
    (and serves as the depth SAME padding of both neighbours).
    """
    b, d, h, w, c = vol.shape
    tiles, wf = flat_tiles(w)
    if c < c_pad:
        vol = jnp.pad(vol, ((0, 0),) * 4 + ((0, c_pad - c),))
    xt = vol.reshape(b * d, h, tiles, LANES)
    xt = jnp.pad(xt, ((0, 0), (PADR, PADR), (PADC, wf - tiles + PADC),
                      (0, 0)))
    rows, wt = xt.shape[1], xt.shape[2]
    xt = xt.reshape(b, d, rows, wt, LANES)
    xt = jnp.pad(xt, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))  # gap after
    xt = xt.reshape(b * (d + 1), rows, wt, LANES)
    return jnp.pad(xt, ((1, 0), (0, 0), (0, 0), (0, 0)))


def vol_from_flat_batch(xf3: jnp.ndarray, b: int, d: int, h: int, w: int,
                        c: int, c_pad: int = 32, phase: int = 0):
    """Inverse of :func:`vol_to_flat_batch` -> (B, D, H, W, C)."""
    f = LANES // c_pad
    tiles = -(-(phase + w) // f)
    _, starts = vol_slab_geometry(b, d)
    outs = []
    for s in starts:
        core = jax.lax.slice(xf3, (s, PADR, PADC, 0),
                             (s + d, PADR + h, PADC + tiles, LANES))
        img = core.reshape(d, h, tiles * f, c_pad)[None]
        outs.append(img[:, :, :, phase:phase + w, :c])
    return jnp.concatenate(outs, axis=0)


def batch_slab_mask(slabs: int, rows: int, wt: int, b: int, d: int,
                    w_px: int, phase: int):
    """(slabs, rows, wt, 128) jnp 0/1 mask of true voxels: core image slabs
    (gap/halo slabs zero) x core rows x image pixels."""
    s = jnp.arange(slabs)[:, None, None, None]
    smask = ((s >= 1) & ((s - 1) % (d + 1) < d)).astype(jnp.float32)
    return (smask * _core_row_mask(rows)[None]
            * jnp.asarray(_col_lane_mask(wt, w_px, phase))[None])
