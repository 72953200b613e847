"""Two-process multi-host integration test (CPU backend, gloo collectives).

Spawns two real processes that ``jax.distributed.initialize`` against a local
coordinator, build one global (data,) mesh over 2x2 virtual CPU devices, feed
disjoint host-local loader shards through ``shard_host_batch``, and run one
jitted train step of MobileStereoNet.  Both processes must observe the same
loss and byte-identical updated parameters (XLA inserts the cross-process
gradient all-reduce; sync-BN reduces over the global batch).

This is the test the reference cannot have: its only parallelism is
single-process DataParallel (reference train_stereo.py:139).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.multiprocess

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=n, process_id=pid)
assert jax.process_count() == n and jax.local_device_count() == 2

import hashlib
import numpy as np
import jax.numpy as jnp

from realtime_stereo_matcher_tpu.config import load_config
from realtime_stereo_matcher_tpu.data.loader import fetch_dataloader
from realtime_stereo_matcher_tpu.parallel.distributed import shard_host_batch
from realtime_stereo_matcher_tpu.parallel.mesh import make_mesh, replicated
from realtime_stereo_matcher_tpu.train.trainer import (
    create_train_state,
    make_train_step,
)

cfg = load_config("configure/stereo_net_synthetic_config.json")
cfg.train.batch_size = 4      # global; 2 per host
cfg.data.image_size = (64, 96)

model, tx, schedule, state = create_train_state(cfg, sample_hw=(64, 96))
mesh = make_mesh()            # all 4 global devices on the data axis
state = jax.device_put(state, replicated(mesh))
step_fn = jax.jit(make_train_step(model, tx, cfg.train.loss.parameters),
                  donate_argnums=(0,))

loader = fetch_dataloader(cfg, shard_id=jax.process_index(),
                          num_shards=jax.process_count(), num_workers=1)
files, img1, img2, flow, valid = next(iter(loader))
assert img1.shape[0] == 2, img1.shape  # host-local slice of the global 4
batch = shard_host_batch(mesh, (img1, img2, flow, valid))
assert batch[0].shape[0] == 4          # global batch

state, metrics = step_fn(state, *batch)
loss = float(metrics["live_loss"])

# parameters must be identical on every process after the psum'd update
leaves = jax.tree_util.tree_leaves(state.params)
h = hashlib.sha256()
for leaf in leaves:
    h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
print(f"RESULT pid={pid} loss={loss:.6f} params={h.hexdigest()[:16]}",
      flush=True)

# the disjoint-shard guarantee: print this host's sample files
print(f"FILES pid={pid} {sorted(f[0] for f in files)}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid), "2",
                          str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd="/root/repo", text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = {}
    files = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                parts = dict(kv.split("=") for kv in line.split()[1:])
                results[parts["pid"]] = (parts["loss"], parts["params"])
            if line.startswith("FILES"):
                pid = line.split()[1].split("=")[1]
                files[pid] = line.split(" ", 2)[2]
    assert set(results) == {"0", "1"}, outs
    # same loss, byte-identical params on both hosts
    assert results["0"] == results["1"], results
    assert float(results["0"][0]) > 0
    # hosts read disjoint data shards
    assert files["0"] != files["1"]


_RESIDENT_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=n, process_id=pid)
assert jax.process_count() == n and jax.local_device_count() == 2

import hashlib
import numpy as np
import jax.numpy as jnp

from realtime_stereo_matcher_tpu.config import load_config
from realtime_stereo_matcher_tpu.data.device_cache import (
    GENERIC_FIXED_POINT, ShardedResidentScenes, pack_dataset)
from realtime_stereo_matcher_tpu.parallel.distributed import shard_host_batch
from realtime_stereo_matcher_tpu.parallel.mesh import make_mesh, replicated
from realtime_stereo_matcher_tpu.train.trainer import (
    create_train_state,
    make_train_step,
)


class FakeRaw:
    def __len__(self):
        return 8
    def __getitem__(self, i):
        rng = np.random.default_rng(100 + i)
        img1 = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
        img2 = np.roll(img1, -4, axis=1)
        disp = rng.uniform(0, 8, (32, 48)).astype(np.float32)
        valid = np.ones((32, 48), np.float32)
        return ([f"scene{i}"], img1, img2, -disp[..., None], valid)


mesh = make_mesh()            # 4 global devices on data
ds = FakeRaw()
lo, hi = ShardedResidentScenes.local_scene_range(8, mesh)
assert (hi - lo) == 4 and lo == pid * 4, (pid, lo, hi)
packed = pack_dataset(ds, indices=range(lo, hi))
resident = ShardedResidentScenes(packed, mesh, global_length=8)
fetch = resident.make_fetch()

cfg = load_config("configure/stereo_net_synthetic_config.json")
cfg.train.batch_size = 4
cfg.data.image_size = (24, 32)
model, tx, schedule, state = create_train_state(cfg, sample_hw=(24, 32))
state = jax.device_put(state, replicated(mesh))
step = make_train_step(model, tx, cfg.train.loss.parameters)

def resident_step(st, arrays, idx):
    i1, i2, fl = fetch(arrays, idx)
    # center-crop to the train size; validity from the dense convention
    i1 = (i1[:, 4:28, 8:40].astype(jnp.float32))
    i2 = (i2[:, 4:28, 8:40].astype(jnp.float32))
    fl = fl[:, 4:28, 8:40]
    va = (jnp.abs(fl[..., 0]) < 512).astype(jnp.float32)
    return step(st, i1, i2, fl, va)

# both processes draw the same seeded stream, keep their local slice
local_idx = next(resident.index_batches(2, seed=11))
assert local_idx.shape == (2,)
idx = shard_host_batch(mesh, (local_idx,))[0]
assert idx.shape == (4,)

state, metrics = jax.jit(resident_step, donate_argnums=(0,))(
    state, resident.arrays, idx)
loss = float(metrics["live_loss"])

h = hashlib.sha256()
for leaf in jax.tree_util.tree_leaves(state.params):
    h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
print(f"RESULT pid={pid} loss={loss:.6f} params={h.hexdigest()[:16]}",
      flush=True)
"""


def test_two_process_scene_sharded_resident_step(tmp_path):
    """Round-5 resident generalization: each process packs its own scene
    shard, the global resident arrays span both hosts, and one jitted
    fetch+train step yields identical losses and byte-identical params."""
    worker = tmp_path / "worker_resident.py"
    worker.write_text(_RESIDENT_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid), "2",
                          str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd="/root/repo", text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                parts = dict(kv.split("=") for kv in line.split()[1:])
                results[parts["pid"]] = (parts["loss"], parts["params"])
    assert set(results) == {"0", "1"}, outs
    assert results["0"] == results["1"], results
