"""Multi-host runtime wiring (the scaled-up analog of the reference's
single-process ``nn.DataParallel``, train_stereo.py:139).

One ``jax.distributed.initialize()`` call turns N processes (one per host,
each owning its local chips) into a single logical device collection;
``parallel/mesh.py`` meshes then span all hosts and XLA's SPMD partitioner
inserts the cross-host collectives (gradient all-reduce over ICI/DCN).

* :func:`initialize` -- idempotent env/flag-driven init.  On the CPU backend
  it selects the gloo collectives implementation so multi-process runs work
  on a development machine (this is also how the two-process integration
  test runs, tests/test_multiprocess.py).
* :func:`shard_host_batch` -- process-aware batch placement: each host feeds
  its local slice (from the host-sharded loader, data/loader.py) and the
  result is one global jax.Array sharded over the mesh's ``data`` axis.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize the multi-process runtime; returns True if distributed.

    Resolution order: explicit args, then ``RSM_COORDINATOR`` /
    ``RSM_NUM_PROCESSES`` / ``RSM_PROCESS_ID`` env vars, then single-process
    (no-op).  On TPU pods, calling with no args defers to JAX's automatic
    cluster detection when ``JAX_COORDINATOR_ADDRESS`` is set.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "RSM_COORDINATOR")
    if num_processes is None and "RSM_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["RSM_NUM_PROCESSES"])
    if process_id is None and "RSM_PROCESS_ID" in os.environ:
        process_id = int(os.environ["RSM_PROCESS_ID"])

    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    if jax.process_count() > 1:  # already initialized
        return True

    # CPU backend: gloo collectives make multi-process work on one machine
    # (and in CI); harmless on TPU where the ICI/DCN path is used.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover - older/newer flag name changes
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logging.info("jax.distributed initialized: process %d/%d, %d local / %d "
                 "global devices", jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
    return True


def shard_host_batch(mesh: Mesh, arrays, *, spatial_axis: int | None = None):
    """Place a pytree of *host-local* numpy batch arrays as global jax.Arrays
    sharded over the mesh's ``data`` axis.

    Single-process: plain device_put with shardings (identical to
    ``mesh.shard_batch``).  Multi-process: each host contributes its local
    slice; the global batch dimension is ``local_batch * num_processes``
    (hosts feed disjoint loader shards, data/loader.py).
    """
    multiprocess = jax.process_count() > 1

    def put(x):
        nd = getattr(x, "ndim", 0)
        if nd == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = [None] * nd
        spec[0] = "data"
        if spatial_axis is not None and nd == 4:
            spec[spatial_axis] = "spatial"
        sharding = NamedSharding(mesh, P(*spec))
        if not multiprocess:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape)

    return jax.tree_util.tree_map(put, arrays)
