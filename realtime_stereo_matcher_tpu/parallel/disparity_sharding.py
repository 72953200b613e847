"""Disparity-axis model parallelism for the cost volume (shard_map).

The cost volume is the memory- and compute-dominant structure of this
workload: O(C * D * H * W).  The disparity axis D is this workload's analog
of sequence/context parallelism (SURVEY.md §5): each chip builds and filters
a *slab* of disparity hypotheses, and the chips combine only at the
soft-argmin -- a pair of scalar-field collectives, not a volume gather.

Implementation (reference semantics from model/mobile_stereo_net.py:8-27 and
:103-117, re-sharded):

* ``shard_map`` over a mesh axis ``disp``: device k owns shifts
  ``[k*D/n, (k+1)*D/n)``; left/right features are replicated (they are ~D/n
  times smaller than the volume slab).
* Each device builds its difference-volume slab with its *global* shift
  values (a static per-device offset of the gather indices).
* The 5-layer 3x3x3 filter convolves across D, so each layer exchanges one
  boundary slab with each neighbor (``jax.lax.ppermute`` over ``disp``),
  applies the conv on the haloed slab, and crops -- identical math to the
  unsharded SAME-padded conv because the global D edges are zero-padded.
* Soft-argmin runs as a numerically-stable distributed softmax: global max
  and sum-of-exp via ``jax.lax.pmax`` / ``psum``, then a ``psum`` of the
  locally weighted disparity expectation with global d indices.

The result is bit-equivalent (up to float reassociation) to the single-chip
path -- asserted by tests/test_disparity_sharding.py on a virtual 8-device
CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _local_difference_slab(left, right, d0, d_local):
    """Difference-volume slab for global shifts [d0, d0 + d_local).

    Same math as ops.cost_volume.difference_cost_volume with a shift offset;
    invalid (x < d) entries are 1.0 (the reference fill value,
    model/mobile_stereo_net.py:13-22).
    """
    b, h, w, c = left.shape
    shifts = d0 + jnp.arange(d_local, dtype=jnp.int32)
    idx = jnp.arange(w, dtype=jnp.int32)[None, :] - shifts[:, None]
    valid = idx >= 0
    g = jnp.take(right, jnp.maximum(idx, 0), axis=2)   # (B, H, D_l, W, C)
    g = jnp.transpose(g, (0, 2, 1, 3, 4))
    diff = left[:, None] - g
    return jnp.where(valid[None, :, None, :, None], diff,
                     jnp.asarray(1.0, diff.dtype))


def _halo_exchange_d(vol, axis_name):
    """Append each neighbor's boundary slab: (B, D_l, H, W, C) ->
    (B, D_l + 2, H, W, C), zero at the global ends."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    # slab from the left neighbor (k-1 -> k) and right neighbor (k+1 -> k)
    from_left = jax.lax.ppermute(
        vol[:, -1:], axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(
        vol[:, :1], axis_name, [(i, (i - 1) % n) for i in range(n)])
    zero = jnp.zeros_like(from_left)
    from_left = jnp.where(idx == 0, zero, from_left)
    from_right = jnp.where(idx == n - 1, zero, from_right)
    return jnp.concatenate([from_left, vol, from_right], axis=1)


def make_sharded_coarse_fn(mesh: Mesh, filter_params, filter_batch_stats,
                           max_disp: int, *, hidden_dim: int = 32,
                           axis: str = "disp", dtype=None):
    """Build ``f(left_feat, right_feat) -> (B, h, w) coarse disparity`` with
    the cost volume sharded over ``mesh`` axis ``axis``.

    ``filter_params`` / ``filter_batch_stats`` are the CostFilter3D_0
    sub-trees of a MobileStereoNet's variables.
    """
    n_shards = mesh.shape[axis]
    assert max_disp % n_shards == 0, (max_disp, n_shards)
    d_local = max_disp // n_shards

    def _apply_layer(name, slab, train=False):
        """One ConvBN / Conv layer of the filter on an NDHWC slab."""
        if name == "Conv_0":
            variables = {"params": filter_params[name]}
            import flax.linen as fnn

            conv = fnn.Conv(1, kernel_size=(3, 3, 3),
                            padding=((1, 1),) * 3, use_bias=True, dtype=dtype)
            return conv.apply(variables, slab)
        from realtime_stereo_matcher_tpu.models.layers import ConvBN

        layer = ConvBN(hidden_dim, kernel_size=(3, 3, 3), strides=(1, 1, 1),
                       padding=((1, 1),) * 3, dtype=dtype)
        variables = {"params": filter_params[name],
                     "batch_stats": filter_batch_stats[name]}
        return layer.apply(variables, slab, False)

    def shard_fn(left, right):
        idx = jax.lax.axis_index(axis)
        d0 = idx * d_local
        slab = _local_difference_slab(left, right, d0, d_local)

        # five filter layers, each with a 1-slab halo exchange over D
        for name in ["ConvBN_0", "ConvBN_1", "ConvBN_2", "ConvBN_3", "Conv_0"]:
            slab = _halo_exchange_d(slab, axis)
            slab = _apply_layer(name, slab)[:, 1:-1]
        cost = slab[..., 0].astype(jnp.float32)  # (B, D_l, h, w)

        # distributed soft-argmin (softmax over global D, then E[d])
        m = jax.lax.pmax(jnp.max(cost, axis=1, keepdims=True), axis)
        e = jnp.exp(cost - m)
        denom = jax.lax.psum(jnp.sum(e, axis=1), axis)
        dvals = (d0 + jnp.arange(d_local)).astype(jnp.float32)
        num = jax.lax.psum(
            jnp.einsum("bdhw,d->bhw", e, dvals), axis)
        return num / denom

    in_spec = P()  # features replicated; the volume exists only sharded
    try:
        mapped = shard_map(shard_fn, mesh=mesh, in_specs=(in_spec, in_spec),
                           out_specs=P(), check_vma=False)
    except TypeError:  # older jax spells the flag check_rep
        mapped = shard_map(shard_fn, mesh=mesh, in_specs=(in_spec, in_spec),
                           out_specs=P(), check_rep=False)
    return jax.jit(mapped)


def make_sharded_v4_volume_fn(mesh: Mesh, vol_module, variables,
                              axis: str = "disp"):
    """Shift-axis (disparity) sharding for MobileStereoNetV4's interweave
    cost volume (models/stereo_net_v4.py:InterweaveVolume).

    Each device computes the volume slab for its global shift range
    [k*S/n, (k+1)*S/n) -- features replicated, no halo needed: the reducer's
    convolutions are spatial-only, so shifts are embarrassingly parallel.
    Only the (B, S/n, H, W) scalar slabs meet again, all-gathered over the
    ``disp`` axis (~S*H*W floats, ~50x smaller than the reducer activations).

    Returns a jitted (featL, featR) -> (B, S, H, W) volume, bit-equivalent
    (up to float reassociation) to ``vol_module.apply(variables, ...)``.
    """
    from realtime_stereo_matcher_tpu.models.stereo_net_v4 import (
        InterweaveVolume,
    )

    n = mesh.shape[axis]
    s_all = vol_module.n_shifts
    assert s_all % n == 0, (s_all, n)
    s_local = s_all // n

    def shard_fn(featL, featR):
        k = jax.lax.axis_index(axis)
        slab = vol_module.apply(
            variables, featL, featR, k * s_local, False, s_local,
            method=InterweaveVolume.volume_slab)        # (B, S/n, H, W)
        return jax.lax.all_gather(slab, axis, axis=1, tiled=True)

    in_spec = P()
    try:
        mapped = shard_map(shard_fn, mesh=mesh, in_specs=(in_spec, in_spec),
                           out_specs=P(), check_vma=False)
    except TypeError:  # older jax spells the flag check_rep
        mapped = shard_map(shard_fn, mesh=mesh, in_specs=(in_spec, in_spec),
                           out_specs=P(), check_rep=False)
    return jax.jit(mapped)
