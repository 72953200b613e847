"""Cost-volume builders, vectorized over the disparity axis (no Python loops).

The reference builds every cost volume with a per-disparity Python loop of
variable-width slice assignments (reference model/mobile_stereo_net.py:8-27,
model/mobile_disp_net_c.py:188-205, cost_volume/*.py).  That pattern is
layout-hostile on TPU: dynamic-width updates defeat XLA tiling.  Here every
volume is one dense gather/matmul with an iota validity mask, so XLA sees a
single fusable producer with static shapes.

Layout convention (TPU-first, channels-last):

* feature maps:            (B, H, W, C)
* 4D volumes (w/ channels): (B, D, H, W, C)   -- NDHWC for 3D convs
* 3D volumes:              (B, D, H, W)

Sign/semantics parity with the reference:
* difference volume invalid region filled with 1.0
  (reference model/mobile_stereo_net.py:13-22)
* correlation / groupwise / concat volumes invalid region filled with 0.0
  (reference model/mobile_disp_net_c.py:191, cost_volume/*.py)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shift_indices(w: int, max_disp: int):
    """(D, W) gather indices ``idx[d, x] = x - d`` plus validity mask."""
    idx = jnp.arange(w, dtype=jnp.int32)[None, :] - jnp.arange(
        max_disp, dtype=jnp.int32
    )[:, None]
    valid = idx >= 0
    return jnp.maximum(idx, 0), valid


def shift_stack(fmap: jnp.ndarray, max_disp: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stack right-image features over disparity shifts.

    Args:
      fmap: (B, H, W, C) right-image features.
      max_disp: number of disparity hypotheses D.

    Returns:
      (stack, valid): stack (B, D, H, W, C) with
      ``stack[:, d, :, x] = fmap[:, :, x - d]`` (clamped), and valid
      (1, D, 1, W, 1) boolean mask of in-bounds shifts.
    """
    b, h, w, c = fmap.shape
    idx, valid = _shift_indices(w, max_disp)
    # take along W with a (D, W) index grid -> (B, H, D, W, C)
    g = jnp.take(fmap, idx, axis=2)
    g = jnp.transpose(g, (0, 2, 1, 3, 4))
    return g, valid[None, :, None, :, None]


def difference_cost_volume(left: jnp.ndarray, right: jnp.ndarray, max_disp: int):
    """StereoNet-style difference volume (reference model/mobile_stereo_net.py:8-27).

    Args:
      left, right: (B, H, W, C) features.
    Returns:
      (B, D, H, W, C); entries with ``x < d`` are 1.0 (reference fill value).
    """
    shifted, valid = shift_stack(right, max_disp)
    diff = left[:, None] - shifted
    return jnp.where(valid, diff, jnp.asarray(1.0, diff.dtype))


def concat_cost_volume(left: jnp.ndarray, right: jnp.ndarray, max_disp: int):
    """Concatenation volume (reference cost_volume/concatenate.py:11-41).

    Returns:
      (B, D, H, W, 2C): ``[..., :C]`` left features (zeroed where ``x < d``),
      ``[..., C:]`` right features shifted by d (zeroed where ``x < d``).
    """
    shifted, valid = shift_stack(right, max_disp)
    b, h, w, c = left.shape
    lexp = jnp.broadcast_to(left[:, None], shifted.shape)
    zero = jnp.asarray(0.0, left.dtype)
    return jnp.concatenate(
        [jnp.where(valid, lexp, zero), jnp.where(valid, shifted, zero)], axis=-1
    )


def correlation_cost_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    max_disp: int,
    *,
    use_matmul: bool = True,
    mean: bool = True,
    w_chunk: int = 512,
):
    """Mean-correlation volume (reference model/mobile_disp_net_c.py:188-205).

    ``out[b, d, h, x] = mean_c(left[b, h, x, c] * right[b, h, x - d, c])`` for
    ``x >= d``, else 0.

    Two equivalent implementations:
      * ``use_matmul=True`` (default, TPU/MXU path): batched matmuls
        ``(B*H, Wb, C) @ (B*H, C, Wb + D) -> (B*H, Wb, Wb + D)`` over
        left-column blocks of ``w_chunk``, each followed by a static banded
        gather.  Runs on the 128x128 systolic array; the block structure
        bounds the correlation intermediate at O(B*H*Wb*(Wb+D)) -- without it
        the single (W x W) product is quadratic in image width (~7.5 GB f32
        at batch-1 720p full res).  DispNetC calls this at 1/4 res where one
        block suffices.
      * elementwise path: shift-stack multiply-reduce (VPU), used as the
        semantic reference in tests.

    Returns:
      (B, D, H, W).
    """
    b, h, w, c = left.shape
    scale = (1.0 / c) if mean else 1.0
    if use_matmul:
        lf = left.reshape(b * h, w, c)
        rf = right.reshape(b * h, w, c)
        _, valid = _shift_indices(w, max_disp)  # (D, W)
        parts = []
        for s in range(0, w, w_chunk):
            e = min(s + w_chunk, w)
            lo = max(0, s - max_disp + 1)
            # rows [s, e) of the W x W correlation only read right columns
            # [s - D + 1, e)
            blk = jax.lax.dot_general(
                lf[:, s:e],
                rf[:, lo:e],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(b, h, e - s, e - lo)
            # out[b, h, x, d] = blk[b, h, x - s, x - d - lo]
            xs = jnp.arange(s, e, dtype=jnp.int32)[:, None]
            ds = jnp.arange(max_disp, dtype=jnp.int32)[None, :]
            gather_idx = jnp.clip(xs - ds - lo, 0, e - lo - 1)  # (Wb, D)
            parts.append(jnp.take_along_axis(
                blk, gather_idx[None, None, :, :], axis=3))     # (B,H,Wb,D)
        band = jnp.concatenate(parts, axis=2)       # (B, H, W, D)
        band = jnp.transpose(band, (0, 3, 1, 2))    # (B, D, H, W)
        vmask = valid[None, :, None, :]  # (1, D, 1, W)
        out = jnp.where(vmask, band * scale, 0.0)
        return out.astype(left.dtype)
    shifted, valid = shift_stack(right, max_disp)
    prod = (left[:, None].astype(jnp.float32) * shifted.astype(jnp.float32)).sum(-1)
    out = jnp.where(valid[..., 0], prod * scale, 0.0)
    return out.astype(left.dtype)


def groupwise_cost_volume(
    left: jnp.ndarray, right: jnp.ndarray, max_disp: int, n_groups: int
):
    """Group-wise correlation volume (reference cost_volume/groupwise.py:12-56).

    ``out[b, d, h, x, g] = mean_{c in group g}(left * shifted_right)``.

    Returns:
      (B, D, H, W, G); invalid region 0.  (The reference returns
      (N, G, H, W, D); this framework uses the NDHW(+C) convention
      throughout -- the dormant reference library is a layout variant only.)
    """
    b, h, w, c = left.shape
    assert c % n_groups == 0, (
        f"groupwise cost channel ({c}) % #groups ({n_groups}) != 0."
    )
    cg = c // n_groups
    shifted, valid = shift_stack(right, max_disp)
    prod = left[:, None].astype(jnp.float32) * shifted.astype(jnp.float32)
    prod = prod.reshape(b, max_disp, h, w, n_groups, cg).mean(axis=-1)
    out = jnp.where(valid, prod, 0.0)
    return out.astype(left.dtype)


def interweave_volume(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Channel-interleaved pair volume (reference cost_volume/interweave.py:10-22,
    model/mobile_stereo_net_v4.py:17-23): even channels = left, odd = right.

    Args:
      left, right: (..., C).
    Returns:
      (..., 2C) with ``out[..., 2i] = left[..., i]``, ``out[..., 2i+1] = right[..., i]``.
    """
    stacked = jnp.stack([left, right], axis=-1)  # (..., C, 2)
    return stacked.reshape(*left.shape[:-1], 2 * left.shape[-1])


def _depth_interp_weights(out_d: int, s: int, chunk: int):
    """Static per-chunk depth-lerp gathers (i0, i1, t, d) plus the transposed
    scatter matrices W[jj, s] = (1-t)*(i0==s) + t*(i1==s) used by the
    custom-VJP backward (one MXU contraction instead of a scatter-add)."""
    import numpy as np

    # pure-numpy re-derivation of sampling._linear_indices_weights (this
    # runs at trace time, possibly inside jit -- jnp constants would be
    # tracers there)
    x = (np.arange(out_d, dtype=np.float32) + 0.5) * (s / out_d) - 0.5
    x = np.maximum(x, 0.0)
    x0 = np.floor(x)
    t = (x - x0).astype(np.float32)
    i0 = np.clip(x0.astype(np.int32), 0, s - 1)
    i1 = np.clip(i0 + 1, 0, s - 1)
    n = out_d // chunk
    xs_np = (i0.reshape(n, chunk), i1.reshape(n, chunk),
             t.reshape(n, chunk).astype(np.float32),
             np.arange(out_d, dtype=np.float32).reshape(n, chunk))
    ws = np.zeros((n, chunk, s), np.float32)
    rows = np.arange(chunk)
    for c in range(n):
        np.add.at(ws[c], (rows, i0[c * chunk:(c + 1) * chunk]),
                  1.0 - t[c * chunk:(c + 1) * chunk])
        np.add.at(ws[c], (rows, i1[c * chunk:(c + 1) * chunk]),
                  t[c * chunk:(c + 1) * chunk])
    return tuple(jnp.asarray(a) for a in xs_np), jnp.asarray(ws)


def _satl_fwd_scan(v, out_d: int, chunk: int):
    """Flash-softmax disparity expectation over depth-lerped logits.

    ``v`` (B, S, H, W); returns (out, m, z) with out = E[d], m/z the final
    online-softmax max/partition (B, H, W) f32."""
    b, s, hh, ww = v.shape
    xs, _ = _depth_interp_weights(out_d, s, chunk)

    def body(carry, x):
        m, z, e = carry
        j0, j1, tj, dj = x
        l0 = jnp.take(v, j0, axis=1).astype(jnp.float32)
        l1 = jnp.take(v, j1, axis=1).astype(jnp.float32)
        logit = l0 + tj[None, :, None, None] * (l1 - l0)  # (B, chunk, H, W)
        m2 = jnp.maximum(m, jnp.max(logit, axis=1))
        p = jnp.exp(logit - m2[:, None])
        scale = jnp.exp(m - m2)
        z = z * scale + jnp.sum(p, axis=1)
        e = e * scale + jnp.sum(dj[None, :, None, None] * p, axis=1)
        return (m2, z, e), None

    init = (jnp.full((b, hh, ww), -jnp.inf, jnp.float32),
            jnp.zeros((b, hh, ww), jnp.float32),
            jnp.zeros((b, hh, ww), jnp.float32))
    (m, z, e), _ = jax.lax.scan(body, init, xs)
    return e / z, m, z


def soft_argmin_trilinear(vol: jnp.ndarray, out_d: int, out_hw,
                          *, chunk: int = 48) -> jnp.ndarray:
    """``soft_argmin`` over a trilinearly upsampled cost volume, fused.

    Numerically equivalent (modulo fp reassociation) to

        soft_argmin(resize_trilinear(vol, (out_d, *out_hw)), axis=1)

    for ``vol`` (B, S, h, w) -- the disparity-regression head of
    MobileStereoNetV4 (reference model/mobile_stereo_net_v4.py:477-518) --
    but never materializes the (B, out_d, H, W) f32 volume (368 MB at KITTI
    shapes).  Spatial bilinear and depth-linear interpolation commute (both
    are linear maps), so H, W are upsampled first at S slabs, and the depth
    interpolation folds into an online-softmax (flash-softmax) scan over
    output-depth chunks with (B, H, W) running (max, partition, expectation)
    accumulators.

    The spatial upsample runs in ``vol.dtype`` (pass bf16 for the TPU fast
    path -- the reference evaluates under fp16 autocast, so reduced-precision
    interpolation matches its deployed numerics, and the f32 resize is
    2x the whole head's HBM traffic); logits, softmax and the expectation
    always accumulate in f32.

    Differentiation runs through a custom VJP (not autodiff of the scan):
    the softmax identity ``d out / d logit_j = p_j (d_j - out)`` gives the
    logit cotangent in closed form from (out, m, z), so the backward pass
    stores only the SMALL residuals (vol + three (B, H, W) f32 maps),
    recomputes the spatial resize and per-chunk logits, and pulls the depth
    lerp back as one static (chunk, S) MXU contraction -- no scan-carry
    residual chain, no scatter.  (Measured 10.7 -> ~4 ms fwd+bwd per train
    head at batch 6, 240x320 -- see BASELINE.md.)

    Returns (B, H, W) f32 expected disparity.
    """
    if out_d % chunk:
        chunk = out_d
    return _satl(vol, out_d, tuple(out_hw), chunk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _satl(vol, out_d, out_hw, chunk):
    from realtime_stereo_matcher_tpu.ops.sampling import resize_bilinear

    v = resize_bilinear(vol, out_hw, h_axis=2, w_axis=3)
    out, _, _ = _satl_fwd_scan(v, out_d, chunk)
    return out


def _satl_fwd(vol, out_d, out_hw, chunk):
    from realtime_stereo_matcher_tpu.ops.sampling import resize_bilinear

    v = resize_bilinear(vol, out_hw, h_axis=2, w_axis=3)
    out, m, z = _satl_fwd_scan(v, out_d, chunk)
    return out, (vol, out, m, z)


def _satl_bwd(out_d, out_hw, chunk, res, g):
    from realtime_stereo_matcher_tpu.ops.sampling import resize_bilinear

    vol, out, m, z = res
    b, s, hh, ww = vol.shape[0], vol.shape[1], out_hw[0], out_hw[1]
    # recompute the cheap spatial resize instead of saving the big (B,S,H,W)
    v = resize_bilinear(vol, out_hw, h_axis=2, w_axis=3)
    xs, ws = _depth_interp_weights(out_d, s, chunk)
    gz = (jnp.asarray(g, jnp.float32) / z)

    def body(dv, x):
        (j0, j1, tj, dj), w_c = x
        l0 = jnp.take(v, j0, axis=1).astype(jnp.float32)
        l1 = jnp.take(v, j1, axis=1).astype(jnp.float32)
        logit = l0 + tj[None, :, None, None] * (l1 - l0)  # (B, chunk, H, W)
        p = jnp.exp(logit - m[:, None])
        dl = gz[:, None] * p * (dj[None, :, None, None] - out[:, None])
        # transpose of the depth lerp: static (chunk -> S) contraction
        dv = dv + jax.lax.dot_general(
            dl, w_c, (((1,), (0,)), ((), ())))            # (B, H, W, S)
        return dv, None

    dv0 = jnp.zeros((vol.shape[0], hh, ww, s), jnp.float32)
    dv, _ = jax.lax.scan(body, dv0, (xs, ws))
    dv = jnp.transpose(dv, (0, 3, 1, 2))                  # (B, S, H, W)
    # transpose of the (linear) spatial resize, in f32
    _, pullback = jax.vjp(
        lambda x: resize_bilinear(x, out_hw, h_axis=2, w_axis=3),
        vol.astype(jnp.float32))
    return (pullback(dv)[0].astype(vol.dtype),)


_satl.defvjp(_satl_fwd, _satl_bwd)


def soft_argmin(cost: jnp.ndarray, axis: int = 1, *, keepdims: bool = False):
    """Softmax-weighted expected disparity (soft arg-min over matching cost).

    ``sum_d d * softmax(cost)[d]`` -- the disparity-regression head shared by
    every neural model in the reference (model/mobile_stereo_net.py:144-147,
    model/mobile_stereo_net_v4.py:10-14, model/mobile_disp_net_c.py:208-220).

    Args:
      cost: cost/score volume; higher = more likely (softmax, not -softmax).
      axis: disparity axis.
    Returns:
      expected disparity with ``axis`` reduced (or kept if ``keepdims``).
    """
    d = cost.shape[axis]
    p = jax.nn.softmax(cost.astype(jnp.float32), axis=axis)
    shape = [1] * cost.ndim
    shape[axis] = d
    disps = jnp.arange(d, dtype=jnp.float32).reshape(shape)
    out = jnp.sum(p * disps, axis=axis, keepdims=keepdims)
    return out.astype(cost.dtype)
