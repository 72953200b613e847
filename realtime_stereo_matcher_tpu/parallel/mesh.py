"""Device mesh + sharding utilities (the TPU-native replacement for the
reference's single-process ``nn.DataParallel``, train_stereo.py:139).

One logical mesh with two axes:

* ``data`` -- batch (data parallelism over ICI; gradient all-reduce is
  inserted by XLA's SPMD partitioner);
* ``spatial`` -- image rows (model-parallel axis for this workload: cost
  volumes are row-independent along H, convs get halo exchanges from the
  partitioner).  Defaults to 1 and is engaged for large-input inference.

``jax.distributed.initialize()`` (multi-host) is the caller's choice; these
helpers only consume ``jax.devices()``.  Batch statistics in BatchNorm reduce
over the *global* batch automatically under jit-with-shardings, i.e. sync-BN
for free -- an upgrade over the reference's per-replica DataParallel BN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, spatial: int = 1,
              devices=None) -> Mesh:
    """Build a (data, spatial) mesh.  data=None uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % spatial == 0, (n, spatial)
        data = n // spatial
    assert data * spatial <= n, (data, spatial, n)
    dev = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(dev, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, *, spatial_axis: int | None = None):
    """NamedSharding for (B, H, W, C) batches: batch over 'data', optionally
    H over 'spatial'."""
    if spatial_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = [None] * 4
    spec[0] = "data"
    spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, arrays, *, spatial_axis: int | None = None):
    """Device-put a pytree of host numpy batch arrays onto the mesh, batch
    axis over 'data' (and optionally H over 'spatial')."""
    def put(x):
        nd = getattr(x, "ndim", 0)
        if nd >= 1:
            spec = [None] * nd
            spec[0] = "data"
            if spatial_axis is not None and nd == 4:
                spec[spatial_axis] = "spatial"
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(put, arrays)
