"""Data pipeline tests on synthetic on-disk datasets (no real data mounted)."""

import numpy as np
import pytest
from PIL import Image

from realtime_stereo_matcher_tpu.config import load_config
from realtime_stereo_matcher_tpu.data.augment import (
    FlowAugmentor,
    SparseFlowAugmentor,
)
from realtime_stereo_matcher_tpu.data.datasets import KITTI, StereoDataset
from realtime_stereo_matcher_tpu.data.loader import StereoDataLoader
from realtime_stereo_matcher_tpu.utils.pfm import read_pfm, write_pfm


def test_pfm_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((17, 23), dtype=np.float32)
    p = tmp_path / "x.pfm"
    write_pfm(p, arr)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(back, arr)
    assert scale == 1.0


def _make_kitti(tmp_path, rng, n=6, h=80, w=120):
    """Synthetic KITTI-layout dataset with 16-bit png disparities."""
    root = tmp_path / "KITTI"
    for sub in ["training/image_2", "training/image_3", "training/disp_occ_0"]:
        (root / sub).mkdir(parents=True)
    for i in range(n):
        im1 = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        im2 = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        disp = rng.uniform(1, 60, (h, w)).astype(np.float32)
        disp[:, :5] = 0  # invalid band
        Image.fromarray(im1).save(root / f"training/image_2/{i:06d}_10.png")
        Image.fromarray(im2).save(root / f"training/image_3/{i:06d}_10.png")
        d16 = (disp * 256.0).astype(np.uint16)
        Image.fromarray(d16, mode="I;16").save(
            root / f"training/disp_occ_0/{i:06d}_10.png")
    return root


def test_kitti_dataset_semantics(tmp_path, rng):
    root = _make_kitti(tmp_path, rng)
    ds = KITTI(aug_params=None, root=str(root))
    assert len(ds) == 6
    files, img1, img2, flow, valid = ds[0]
    assert img1.shape == (80, 120, 3) and img1.dtype == np.float32
    assert flow.shape == (80, 120, 1)
    # negative-flow convention and validity from disp > 0
    assert (flow[valid >= 0.5] < 0).all()
    assert valid[:, :5].max() == 0.0


def test_kitti_with_augmentation_and_loader(tmp_path, rng):
    root = _make_kitti(tmp_path, rng, h=100, w=140)
    aug = {"crop_size": (64, 96), "min_scale": -0.2, "max_scale": 0.4,
           "do_flip": False, "yjitter": False}
    ds = KITTI(aug_params=aug, root=str(root))
    loader = StereoDataLoader(ds, batch_size=2, num_workers=2, seed=7)
    batches = list(iter(loader))
    assert len(batches) == 3
    files, i1, i2, fl, va = batches[0]
    assert i1.shape == (2, 64, 96, 3)
    assert fl.shape == (2, 64, 96, 1)
    assert va.shape == (2, 64, 96)
    # loader must be deterministic given the epoch
    loader2 = StereoDataLoader(ds, batch_size=2, num_workers=2, seed=7)
    b2 = list(iter(loader2))
    np.testing.assert_array_equal(batches[0][1], b2[0][1])


def test_loader_sharding(tmp_path, rng):
    root = _make_kitti(tmp_path, rng)
    ds = KITTI(aug_params=None, root=str(root))
    l0 = StereoDataLoader(ds, 1, shuffle=False, num_workers=1,
                          shard_id=0, num_shards=2)
    l1 = StereoDataLoader(ds, 1, shuffle=False, num_workers=1,
                          shard_id=1, num_shards=2)
    f0 = [b[0][0][0] for b in iter(l0)]
    f1 = [b[0][0][0] for b in iter(l1)]
    assert len(f0) == len(f1) == 3
    assert set(f0).isdisjoint(f1)


def test_flow_augmentor_shapes(rng):
    aug = FlowAugmentor(crop_size=(48, 64), do_flip="h", yjitter=True, seed=0)
    img1 = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
    img2 = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
    flow = rng.standard_normal((100, 140, 2)).astype(np.float32)
    o1, o2, of = aug(img1, img2, flow)
    assert o1.shape == (48, 64, 3) and of.shape == (48, 64, 2)


def test_sparse_augmentor_shapes_and_splat(rng):
    aug = SparseFlowAugmentor(crop_size=(48, 64), seed=0)
    img1 = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
    img2 = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
    flow = rng.standard_normal((100, 140, 2)).astype(np.float32)
    valid = (rng.uniform(size=(100, 140)) > 0.5).astype(np.float32)
    o1, o2, of, ov = aug(img1, img2, flow, valid)
    assert o1.shape == (48, 64, 3) and of.shape == (48, 64, 2)
    assert ov.shape == (48, 64)
    # splat resize keeps flow scaling consistent
    f2, v2 = SparseFlowAugmentor.resize_sparse_flow_map(
        flow, valid, fx=2.0, fy=2.0)
    assert f2.shape == (200, 280, 2)
    src = flow[valid >= 1]
    dst = f2[v2 >= 1]
    assert abs(np.mean(np.abs(dst)) / np.mean(np.abs(src)) - 2.0) < 0.2


def test_config_ingests_reference_schema(tmp_path):
    """The real reference config schema must load unchanged."""
    import json
    raw = {
        "name": "X", "path": str(tmp_path),
        "train": {"batch_size": 4, "restore_checkpoint": "",
                  "save_checkpoint_frequency": 100,
                  "datasets": ["kitti"], "learn_rate": 2e-4,
                  "num_of_steps": 1000, "weight_decay": 1e-5,
                  "loss": {"type": "SequenceLoss",
                           "parameters": {"loss_gamma": 0.9,
                                          "max_flow_magnitude": 700}}},
        "test": {"datasets": ["eth3d"]},
        "model": {"type": "MobileStereoNet", "parameters": {}},
        "data": {"image_size": [240, 320], "image_gamma": [],
                 "spatial_scale": [-0.2, 0.4], "saturation_range": [0, 1.4],
                 "do_flip": False, "no_y_jitter": False},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(raw))
    cfg = load_config(p)
    assert cfg.train.num_of_steps == 1000
    assert cfg.train.loss.parameters["loss_gamma"] == 0.9
    ap = cfg.aug_params()
    assert ap["crop_size"] == (240, 320)
    assert ap["yjitter"] is True
    # fixed reference bug: saturation_range is honored when present
    assert ap["saturation_range"] == (0, 1.4)


def test_rgb_lab_roundtrip_and_transfer_color(rng):
    from realtime_stereo_matcher_tpu.data.augment import (
        lab_to_rgb,
        rgb_to_lab,
        transfer_color,
    )

    img = rng.uniform(0.05, 0.95, (16, 20, 3))
    np.testing.assert_allclose(lab_to_rgb(rgb_to_lab(img)), img, atol=1e-6)
    # pure white / black anchor points of the Lab scale
    np.testing.assert_allclose(
        rgb_to_lab(np.ones((1, 1, 3)))[0, 0], [100.0, 0.0, 0.0], atol=1e-2)
    np.testing.assert_allclose(
        rgb_to_lab(np.zeros((1, 1, 3)))[0, 0], [0.0, 0.0, 0.0], atol=1e-6)

    # transferring an image onto its own Lab stats is the identity
    src = rng.uniform(20, 235, (12, 14, 3))
    lab = rgb_to_lab(src / 255.0)
    same = transfer_color(src, lab.mean((0, 1), keepdims=True),
                          lab.std((0, 1), keepdims=True))
    np.testing.assert_allclose(same, src, atol=1e-4)

    # transferred image inherits the style's Lab statistics
    style_mean = np.array([[[55.0, 6.0, -8.0]]])
    style_std = np.array([[[18.0, 4.0, 5.0]]])
    out = transfer_color(src, style_mean, style_std)
    out_lab = rgb_to_lab(np.clip(out, 0, 255) / 255.0)
    np.testing.assert_allclose(out_lab.mean((0, 1)), style_mean[0, 0], atol=0.75)
    np.testing.assert_allclose(out_lab.std((0, 1)), style_std[0, 0], atol=0.75)


def test_loader_epoch_advances_on_abandoned_iterator(tmp_path, rng):
    """Breaking out mid-epoch must still advance the epoch: the advance is an
    explicit __iter__ contract, not a GC-dependent generator-finalization
    side effect (data/loader.py)."""
    root = _make_kitti(tmp_path, rng)
    ds = KITTI(aug_params=None, root=str(root))
    loader = StereoDataLoader(ds, batch_size=1, num_workers=1, seed=3)
    it = iter(loader)
    next(it)  # abandon mid-epoch, keep a live reference (no refcount GC)
    assert loader.epoch == 1
    first_files = [b[0][0] for b in iter(loader)]
    assert loader.epoch == 2
    del it
    # epoch-2 draw differs from epoch-1's permutation (6 samples)
    second_files = [b[0][0] for b in iter(loader)]
    assert loader.epoch == 3
    assert first_files != second_files
