"""Device-resident dataset: generic packing + scene sharding (round 5).

Round 4 limited residency to single-process SyntheticStereo; these tests pin
the generalization: ANY uniform-shape raw dataset packs (u16 fixed-point
disparity with the invalid-pixel sentinel), and the scene-sharded variant
distributes the pack over the mesh's data axis with a communication-free
shard_map fetch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from realtime_stereo_matcher_tpu.data.device_cache import (
    GENERIC_FIXED_POINT,
    SENTINEL,
    DeviceResidentScenes,
    ShardedResidentScenes,
    fetch_scene_batch,
    pack_dataset,
)
from realtime_stereo_matcher_tpu.parallel.mesh import make_mesh, shard_batch


class _FakeRawDataset:
    """Raw-mode StereoDataset stand-in: deterministic uniform-shape samples
    with a sparse valid mask (KITTI-style)."""

    def __init__(self, n=8, h=24, w=32, max_disp=20.0):
        self.n, self.h, self.w, self.max_disp = n, h, w, max_disp

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(100 + i)
        img1 = rng.integers(0, 256, (self.h, self.w, 3)).astype(np.uint8)
        img2 = np.roll(img1, -4, axis=1)
        disp = rng.uniform(0, self.max_disp,
                           (self.h, self.w)).astype(np.float32)
        valid = (rng.uniform(size=(self.h, self.w)) > 0.3).astype(np.float32)
        flow = -disp[..., None]
        return ([f"scene{i}"], img1, img2, flow, valid)


def test_pack_dataset_roundtrip_with_sentinel():
    ds = _FakeRawDataset()
    packed = pack_dataset(ds)
    assert packed["img1"].shape == (8, 24, 32, 3)
    assert packed["fp"] == GENERIC_FIXED_POINT

    idx = jnp.asarray([3, 0, 5], jnp.int32)
    arrays = tuple(jnp.asarray(packed[k]) for k in ("img1", "img2", "disp_q"))
    i1, i2, flow = jax.jit(
        lambda a, ix: fetch_scene_batch(a, ix, GENERIC_FIXED_POINT)
    )(arrays, idx)

    for bi, si in enumerate([3, 0, 5]):
        _, a, b, fl, va = ds[si]
        np.testing.assert_array_equal(np.asarray(i1[bi]), a)
        np.testing.assert_array_equal(np.asarray(i2[bi]), b)
        dec = np.asarray(flow[bi, ..., 0])
        # valid pixels decode within the 1/128-px quantization
        m = va > 0
        np.testing.assert_allclose(dec[m], fl[m.nonzero()[0],
                                              m.nonzero()[1], 0],
                                   atol=0.5 / GENERIC_FIXED_POINT)
        # invalid pixels decode to the -1024 sentinel flow, which every
        # downstream validity rule (|flow| < 512 / < 700) rejects
        assert np.all(dec[~m] == -1024.0)


def test_pack_dataset_rejects_nonuniform_and_oversize():
    class _Lumpy(_FakeRawDataset):
        def __getitem__(self, i):
            out = super().__getitem__(i)
            if i == 5:
                return (out[0], out[1][:-2], out[2][:-2],
                        out[3][:-2], out[4][:-2])
            return out

    with pytest.raises(ValueError, match="uniform shapes"):
        pack_dataset(_Lumpy())
    with pytest.raises(ValueError, match="resident budget"):
        pack_dataset(_FakeRawDataset(), max_bytes=1000)


def test_pack_dataset_rejects_disparity_overflow():
    with pytest.raises(ValueError, match="fixed-point range"):
        pack_dataset(_FakeRawDataset(max_disp=600.0))


def test_sharded_resident_fetch_matches_replicated():
    """Scene-sharded residency over the 8-device mesh: the shard_map fetch
    must return the same decoded batch as the replicated fetch, given the
    block layout's index mapping."""
    ds = _FakeRawDataset(n=16)
    packed = pack_dataset(ds)
    mesh = make_mesh(data=8, spatial=1)

    lo, hi = ShardedResidentScenes.local_scene_range(16, mesh)
    assert (lo, hi) == (0, 16)  # single process owns everything
    resident = ShardedResidentScenes(packed, mesh, global_length=16)
    assert resident.per_device == 2

    fetch = resident.make_fetch()
    # per-device local indices: device d gets local index ld -> global
    # scene d * per_device + ld
    local_idx = np.asarray([1, 0, 1, 1, 0, 0, 1, 0], np.int32)
    idx = shard_batch(mesh, (local_idx,))[0]
    i1, i2, flow = jax.jit(fetch)(resident.arrays, idx)

    rep = DeviceResidentScenes(packed)
    global_idx = jnp.asarray(
        [d * 2 + local_idx[d] for d in range(8)], jnp.int32)
    w1, w2, wf = fetch_scene_batch(rep.arrays, global_idx, resident.fp)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(w1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(flow), np.asarray(wf))

    # no cross-device communication in the compiled fetch
    from realtime_stereo_matcher_tpu.parallel.comm_audit import audit
    report = audit(jax.jit(fetch), resident.arrays, idx)
    assert report["total_bytes"] == 0, report["per_op"]


def test_sharded_index_batches_cover_blocks():
    ds = _FakeRawDataset(n=16)
    packed = pack_dataset(ds)
    mesh = make_mesh(data=8, spatial=1)
    resident = ShardedResidentScenes(packed, mesh, global_length=16)

    it = resident.index_batches(8, seed=7)
    seen = [next(it) for _ in range(4)]  # 2 epochs of 2 batches
    for batch in seen:
        assert batch.shape == (8,)
        assert batch.min() >= 0 and batch.max() < resident.per_device
    # one epoch = each device sees each of its scenes exactly once
    epoch = np.stack(seen[:2])            # (2, 8)
    for d in range(8):
        assert sorted(epoch[:, d]) == [0, 1]
