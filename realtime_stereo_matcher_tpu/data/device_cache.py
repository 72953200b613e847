"""Device-resident dataset: the training set lives in HBM, steps ship indices.

Why: this environment reaches the TPU through a relay whose host->device
transfers serialize against the compute stream (~40 MB/s effective while the
chip is busy, measured in round 4 -- vs ~670 MB/s idle).  Streaming the
raw 11.5 MB batch per step costs ~450 ms against a ~95 ms device step, so
the input pipeline, not the host CPU, becomes the gate once augmentation
moves on-device (data/device_augment.py).

The TPU-native fix for a procedural/small dataset: upload the whole training
set to HBM once at startup and send only a (B,) int32 index vector per step
(32 bytes).  Layout per scene (the synthetic set, data/synthetic.py):

* left/right images as uint8 (N, H, W, 3) -- exactly the generator's output;
* disparity as uint16 fixed-point, 1/512 px quanta (max_disp 64 -> 32768 <
  65535).  GT quantization error <= 1/1024 px, two orders below the
  sub-pixel EPE scale; images dominate the footprint anyway.  4000 scenes at
  320x448 = ~3.9 GB of HBM.

Scenes are also memoized on disk (uncompressed .npz under ``cache_dir``)
keyed by the generator parameters, so repeated training runs skip the ~21
ms/scene host generation entirely.
"""

from __future__ import annotations

import logging
import threading
from pathlib import Path

import numpy as np

DISP_FIXED_POINT = 512.0  # synthetic-set disparity quanta: 1/512 px

# Generic datasets (round 5): 1/128 px quanta covers disparities to 511 px
# (the reference's dense-valid convention masks |flow| >= 512 anyway,
# data/datasets.py:115); invalid pixels store the SENTINEL and decode to
# flow -1024, which every downstream validity rule (|flow| < 512 dense
# convention in device_augment, |flow| < 700 in SequenceLoss) rejects --
# sparse GT needs no separate valid plane in HBM.
GENERIC_FIXED_POINT = 128.0
SENTINEL = np.uint16(65535)
_SENTINEL_FLOW = 1024.0


def pack_synthetic(ds, cache_dir: str = "/tmp/rsm_scene_cache",
                   num_threads: int = 2) -> dict:
    """Materialize a SyntheticStereo dataset as packed numpy arrays.

    Returns {"img1": (N,H,W,3) u8, "img2": (N,H,W,3) u8,
    "disp_q": (N,H,W) u16}; reads/writes a disk cache keyed by the
    generator parameters (scenes are deterministic per (seed0, index)).
    """
    from realtime_stereo_matcher_tpu.data.synthetic import make_scene

    h, w = ds.image_hw
    key = f"s{ds.seed0}_n{ds.length}_{h}x{w}_d{ds.max_disp:g}"
    path = Path(cache_dir) / f"{key}.npz"
    if path.exists():
        z = np.load(path)
        return {k: z[k] for k in ("img1", "img2", "disp_q")}

    img1 = np.empty((ds.length, h, w, 3), np.uint8)
    img2 = np.empty((ds.length, h, w, 3), np.uint8)
    disp_q = np.empty((ds.length, h, w), np.uint16)

    def fill(lo, hi):
        for i in range(lo, hi):
            l, r, d, _ = make_scene(ds.seed0 + i, h, w, max_disp=ds.max_disp)
            img1[i] = l
            img2[i] = r
            disp_q[i] = np.round(d * DISP_FIXED_POINT).astype(np.uint16)

    chunk = (ds.length + num_threads - 1) // num_threads
    threads = [threading.Thread(target=fill,
                                args=(t * chunk,
                                      min(ds.length, (t + 1) * chunk)))
               for t in range(num_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(tmp, img1=img1, img2=img2, disp_q=disp_q)
    tmp.rename(path)
    logging.info("Packed %d scenes (%.1f GB) -> %s", ds.length,
                 (img1.nbytes * 2 + disp_q.nbytes) / 1e9, path)
    return {"img1": img1, "img2": img2, "disp_q": disp_q}


def pack_dataset(ds, *, indices=None, max_bytes: float = 8e9,
                 num_threads: int = 2) -> dict:
    """Materialize ANY uniform-shape StereoDataset as packed resident arrays.

    ``ds`` is a raw-mode (no host augmentor) dataset -- a single
    ``StereoDataset`` family or a ``ConcatDataset`` -- whose samples are
    ``(files, img1 u8, img2 u8, flow f32 (H,W,1) [negative], valid (H,W))``
    (data/datasets.py:73-126).  Disparity packs as uint16 at 1/128 px with
    the invalid-pixel SENTINEL (sparse GT like KITTI needs no valid plane).

    Raises ValueError on non-uniform shapes, disparities beyond 511 px, or a
    footprint over ``max_bytes`` -- the trainer catches it and falls back to
    host streaming.

    ``indices``: pack only these dataset positions (multi-process scene
    sharding packs each host's contiguous range).
    """
    indices = list(indices) if indices is not None else None
    n = len(indices) if indices is not None else len(ds)
    _, i1, _, _, _ = ds[indices[0] if indices else 0]
    h, w = i1.shape[:2]
    nbytes = n * h * w * (3 + 3 + 2)
    if nbytes > max_bytes:
        raise ValueError(
            f"packed dataset {nbytes / 1e9:.2f} GB exceeds the "
            f"{max_bytes / 1e9:.0f} GB resident budget")

    img1 = np.empty((n, h, w, 3), np.uint8)
    img2 = np.empty((n, h, w, 3), np.uint8)
    disp_q = np.empty((n, h, w), np.uint16)
    errors: list = []

    def fill(lo, hi):
        try:
            for i in range(lo, hi):
                _, a, b, flow, valid = ds[indices[i] if indices else i]
                if a.shape[:2] != (h, w):
                    raise ValueError(
                        f"scene {i} shape {a.shape[:2]} != {(h, w)}: "
                        "resident packing needs uniform shapes")
                d = -flow[..., 0]
                if float(d.max(initial=0.0)) * GENERIC_FIXED_POINT > 65534:
                    raise ValueError(
                        f"scene {i} disparity {d.max():.1f} exceeds the "
                        "511-px fixed-point range")
                img1[i] = a.astype(np.uint8)
                img2[i] = b.astype(np.uint8)
                q = np.round(np.clip(d, 0.0, None)
                             * GENERIC_FIXED_POINT).astype(np.uint16)
                q[np.asarray(valid) <= 0] = SENTINEL
                disp_q[i] = q
        except Exception as exc:  # noqa: BLE001 - surfaced to the caller
            errors.append(exc)

    chunk = (n + num_threads - 1) // num_threads
    threads = [threading.Thread(target=fill,
                                args=(t * chunk, min(n, (t + 1) * chunk)))
               for t in range(num_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise ValueError(str(errors[0]))
    logging.info("Packed %d scenes (%.2f GB) for device residency.",
                 n, nbytes / 1e9)
    return {"img1": img1, "img2": img2, "disp_q": disp_q,
            "fp": GENERIC_FIXED_POINT}


def fetch_scene_batch(arrays, idx, fp: float = DISP_FIXED_POINT):
    """(img1, img2, disp_q) resident arrays + (B,) int32 ->
    (img1 u8, img2 u8, flow f32 (B,H,W,1)) [runs inside jit].

    ``arrays`` MUST be passed to the jitted step as an *argument*: a
    closure-captured device array becomes an HLO constant, and serializing
    gigabytes of literal through this environment's relayed compiler hangs
    compilation outright (measured: >9 min vs 0.7 s as an argument).

    ``fp`` is the pack's fixed-point scale (static).  SENTINEL entries
    decode to flow -1024 so every downstream validity rule rejects them;
    the synthetic pack (fp=512) never stores the sentinel and the branch
    folds to a no-op there.
    """
    import jax.numpy as jnp

    img1, img2, disp_q = arrays
    i1 = jnp.take(img1, idx, axis=0)
    i2 = jnp.take(img2, idx, axis=0)
    q = jnp.take(disp_q, idx, axis=0)
    d = q.astype(jnp.float32) / fp
    d = jnp.where(q == jnp.uint16(SENTINEL), _SENTINEL_FLOW, d)
    flow = -d[..., None]
    return i1, i2, flow


class DeviceResidentScenes:
    """The packed dataset as device arrays + an index-batch sampler."""

    def __init__(self, packed: dict, *, sharding=None):
        import jax

        put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
            else jax.device_put
        self.img1 = put(packed["img1"])
        self.img2 = put(packed["img2"])
        self.disp_q = put(packed["disp_q"])
        self.length = int(packed["img1"].shape[0])
        self.image_hw = tuple(packed["img1"].shape[1:3])
        self.fp = float(packed.get("fp", DISP_FIXED_POINT))

    @property
    def arrays(self):
        return (self.img1, self.img2, self.disp_q)

    def nbytes(self) -> int:
        return (self.img1.nbytes + self.img2.nbytes + self.disp_q.nbytes)

    def index_batches(self, batch_size: int, *, seed: int = 1234,
                      epoch0: int = 0, shard_id: int = 0,
                      num_shards: int = 1):
        """Infinite stream of (B,) int32 index batches: per-epoch shuffled
        permutations, host-sharded like data/loader.py."""
        epoch = epoch0
        while True:
            rng = np.random.default_rng(seed + epoch)
            idx = rng.permutation(self.length)[shard_id::num_shards]
            nb = len(idx) // batch_size
            for b in range(nb):
                yield idx[b * batch_size:(b + 1) * batch_size].astype(np.int32)
            epoch += 1


class ShardedResidentScenes:
    """Scene-sharded residency for multi-device/multi-process training.

    The packed scene arrays are sharded over the mesh's ``data`` axis on the
    scene dimension -- each device (across all hosts) holds ``N // n``
    scenes in its own HBM, so total resident footprint stays one copy of the
    dataset regardless of slice size (the replicated
    :class:`DeviceResidentScenes` costs a full copy per device).  The fetch
    runs under ``shard_map``: each device takes its per-device index slice
    into its local scene block -- no cross-device gather, communication-free
    like the host-sharded loader it replaces.

    Each process packs ONLY its devices' scene range (``local_scene_range``)
    and contributes it via ``jax.make_array_from_process_local_data``.
    Sampling draws per-device local indices (device d's batch slice indexes
    d's own block), the resident analog of loader.py's disjoint host shards:
    not a global shuffle, but each block is a random partition of the
    dataset so the stream is unbiased.
    """

    def __init__(self, packed_local: dict, mesh, *, global_length: int):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = mesh.shape["data"] * mesh.shape["spatial"]
        assert mesh.shape["spatial"] == 1, "scene sharding rides 'data'"
        assert global_length % n == 0, (global_length, n)
        self.per_device = global_length // n
        self.length = global_length
        sh = NamedSharding(mesh, P("data"))

        def put(local):
            global_shape = (global_length,) + local.shape[1:]
            return jax.make_array_from_process_local_data(sh, local,
                                                          global_shape)

        self.img1 = put(packed_local["img1"])
        self.img2 = put(packed_local["img2"])
        self.disp_q = put(packed_local["disp_q"])
        self.image_hw = tuple(packed_local["img1"].shape[1:3])
        self.fp = float(packed_local.get("fp", DISP_FIXED_POINT))
        self._mesh = mesh
        self._n = n

    @staticmethod
    def local_scene_range(total: int, mesh) -> tuple[int, int]:
        """[lo, hi) of the scenes THIS process must pack: its devices'
        contiguous blocks of the truncated global set."""
        import jax

        n = mesh.shape["data"] * mesh.shape["spatial"]
        m = total // n
        local = jax.local_device_count()
        p = jax.process_index()
        return p * local * m, (p + 1) * local * m

    @property
    def arrays(self):
        return (self.img1, self.img2, self.disp_q)

    def nbytes(self) -> int:
        return (self.img1.nbytes + self.img2.nbytes + self.disp_q.nbytes)

    def make_fetch(self):
        """shard_map'd fetch: (global arrays, (B,) idx sharded over 'data')
        -> sharded raw batch.  Device d's idx values are LOCAL in
        [0, per_device)."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        fp = self.fp

        def local_fetch(arrays, idx):
            return fetch_scene_batch(arrays, idx, fp)

        return shard_map(
            local_fetch, mesh=self._mesh,
            in_specs=((P("data"), P("data"), P("data")), P("data")),
            out_specs=P("data"))

    def index_batches(self, batch_size: int, *, seed: int = 1234,
                      epoch0: int = 0):
        """Infinite HOST-LOCAL int32 index batches of PER-DEVICE local
        indices: this host's segment of the global batch, where segment d
        indexes device d's scene block.  ``batch_size`` is the HOST-local
        batch (the trainer's train.batch_size convention; global batch =
        batch_size * process_count).  Every process draws from the same
        seeded stream (deterministic), yields only its own devices' slice,
        and ``shard_host_batch`` assembles the global array -- the resident
        analog of loader.py's disjoint host shards."""
        import jax

        local = jax.local_device_count()
        assert batch_size % local == 0, (batch_size, local)
        per_dev_b = batch_size // local
        first = jax.process_index() * local
        m = self.per_device
        epoch = epoch0
        while True:
            rng = np.random.default_rng(seed + epoch)
            # one shuffled pass over every device's block per epoch
            perms = [rng.permutation(m) for _ in range(self._n)]
            for b in range(m // per_dev_b):
                yield np.concatenate(
                    [perms[d][b * per_dev_b:(b + 1) * per_dev_b]
                     for d in range(first, first + local)]).astype(np.int32)
            epoch += 1
