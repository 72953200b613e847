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

DISP_FIXED_POINT = 512.0  # disparity quanta: 1/512 px


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


def fetch_scene_batch(arrays, idx):
    """(img1, img2, disp_q) resident arrays + (B,) int32 ->
    (img1 u8, img2 u8, flow f32 (B,H,W,1)) [runs inside jit].

    ``arrays`` MUST be passed to the jitted step as an *argument*: a
    closure-captured device array becomes an HLO constant, and serializing
    gigabytes of literal through this environment's relayed compiler hangs
    compilation outright (measured: >9 min vs 0.7 s as an argument).
    """
    import jax.numpy as jnp

    img1, img2, disp_q = arrays
    i1 = jnp.take(img1, idx, axis=0)
    i2 = jnp.take(img2, idx, axis=0)
    d = jnp.take(disp_q, idx, axis=0).astype(jnp.float32)
    flow = -(d / DISP_FIXED_POINT)[..., None]
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
