"""On-device augmentation (data/device_augment.py) vs the host numpy path.

The device path mirrors data/augment.py's FlowAugmentor semantics minus the
uint8 re-quantization between photometric ops, so parity tests compose the
*float* host primitives with the same pre-drawn params and compare tightly;
the spatial test pins the composite resample against cv2-resize + crop.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from realtime_stereo_matcher_tpu.data import augment as host_aug
from realtime_stereo_matcher_tpu.data.device_augment import (
    AugmentSpec,
    adjust_hue,
    apply_augment,
    draw_params,
    make_device_augment,
)

SRC_HW = (64, 96)
CROP = (32, 48)


def _spec(**kw):
    base = dict(src_hw=SRC_HW, crop_size=CROP, min_scale=-0.2, max_scale=0.4)
    base.update(kw)
    return AugmentSpec(**base)


def _img(rng, h=SRC_HW[0], w=SRC_HW[1]):
    return rng.uniform(0, 255, (h, w, 3)).astype(np.float32)


def _params(spec, overrides):
    p = jax.device_get(draw_params(jax.random.PRNGKey(0), spec))
    p = {k: np.asarray(v) for k, v in p.items()}
    p.update(overrides)
    return {k: jnp.asarray(v) for k, v in p.items()}


def _identity_spatial():
    """Params that make the spatial stage a pure top-left crop at scale 1."""
    return {"scale_x": np.float32(1.0), "scale_y": np.float32(1.0),
            "crop_u": np.float32(0.0), "crop_v": np.float32(0.0)}


def test_hue_matches_host(rng):
    img = _img(rng)
    for shift in (-0.35, 0.0, 0.12):
        ours = np.asarray(adjust_hue(jnp.asarray(img), shift))
        ref = host_aug.adjust_hue(img, shift)
        np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_color_chain_symmetric_matches_host_float_path(rng):
    """Symmetric jitter == host path on the stacked pair (float, no uint8)."""
    spec = _spec()
    img1, img2 = _img(rng), _img(rng)
    order = np.array([1, 3, 0, 2])
    factors = np.array([1.2, 0.7, 1.3, 0.1], np.float32)  # b, c, s, hue
    p = _params(spec, {
        "asym": np.bool_(False),
        "color_order": np.stack([order, order]),
        "color_factors": np.stack([factors, factors]),
        "eraser_on": np.bool_(False),
        **_identity_spatial(),
    })
    flow = np.zeros((*SRC_HW, 1), np.float32)
    d1, d2, _, _ = (np.asarray(x) for x in
                    apply_augment(spec, p, jnp.asarray(img1),
                                  jnp.asarray(img2), jnp.asarray(flow)))

    # host float path on the stacked pair, same op order/factors
    x = np.concatenate([img1, img2], axis=0)
    for op in order:
        if op == 0:
            x = host_aug.adjust_brightness(x, factors[0])
        elif op == 1:
            x = host_aug.adjust_contrast(x, factors[1])
        elif op == 2:
            x = host_aug.adjust_saturation(x, factors[2])
        else:
            x = host_aug.adjust_hue(x, factors[3])
    r1, r2 = np.split(np.asarray(x), 2, axis=0)
    np.testing.assert_allclose(d1[:SRC_HW[0] // 1][: CROP[0], : CROP[1]],
                               r1[: CROP[0], : CROP[1]], atol=0.05)
    np.testing.assert_allclose(d2[: CROP[0], : CROP[1]],
                               r2[: CROP[0], : CROP[1]], atol=0.05)


def test_color_chain_asymmetric_uses_per_image_stats(rng):
    spec = _spec()
    img1, img2 = _img(rng), _img(rng)
    order = np.array([1, 0, 2, 3])
    f1 = np.array([1.1, 0.8, 1.2, -0.05], np.float32)
    f2 = np.array([0.9, 1.3, 0.7, 0.2], np.float32)
    p = _params(spec, {
        "asym": np.bool_(True),
        "color_order": np.stack([order, order]),
        "color_factors": np.stack([f1, f2]),
        "eraser_on": np.bool_(False),
        **_identity_spatial(),
    })
    flow = np.zeros((*SRC_HW, 1), np.float32)
    d1, d2, _, _ = (np.asarray(x) for x in
                    apply_augment(spec, p, jnp.asarray(img1),
                                  jnp.asarray(img2), jnp.asarray(flow)))

    def host_chain(img, f):
        x = img.copy()
        for op in order:
            x = [host_aug.adjust_brightness, host_aug.adjust_contrast,
                 host_aug.adjust_saturation, host_aug.adjust_hue][op](x, f[op])
        return x

    np.testing.assert_allclose(d1[: CROP[0], : CROP[1]],
                               host_chain(img1, f1)[: CROP[0], : CROP[1]],
                               atol=0.05)
    np.testing.assert_allclose(d2[: CROP[0], : CROP[1]],
                               host_chain(img2, f2)[: CROP[0], : CROP[1]],
                               atol=0.05)


def test_eraser_rectangles_fill_mean(rng):
    spec = _spec()
    img1, img2 = _img(rng), _img(rng)
    rects = np.array([[10.0, 5.0, 20.0, 12.0],
                      [50.0, 30.0, 30.0, 20.0]], np.float32)
    p = _params(spec, {
        "asym": np.bool_(False),
        "color_factors": np.zeros((2, 4), np.float32) + np.array(
            [1.0, 1.0, 1.0, 0.0], np.float32),  # identity jitter
        "eraser_on": np.bool_(True),
        "eraser_two": np.bool_(True),
        "eraser_rects": rects,
        **_identity_spatial(),
    })
    flow = np.zeros((*SRC_HW, 1), np.float32)
    _, d2, _, _ = (np.asarray(x) for x in
                   apply_augment(spec, p, jnp.asarray(img1),
                                 jnp.asarray(img2), jnp.asarray(flow)))
    mean_c = img2.reshape(-1, 3).mean(0)
    # inside rect 1 (within the crop): filled with mean color
    np.testing.assert_allclose(d2[6, 11], mean_c, atol=0.05)
    # outside both rects: original pixel
    np.testing.assert_allclose(d2[0, 0], img2[0, 0], atol=0.05)


def test_spatial_matches_cv2_resize_plus_crop(rng):
    cv2 = pytest.importorskip("cv2")
    spec = _spec()
    img1, img2 = _img(rng), _img(rng)
    disp = rng.uniform(0, 16, SRC_HW).astype(np.float32)
    flow = -disp[..., None]
    sx, sy = 0.8320002, 1.1729999
    y0, x0 = 7, 11
    nh, nw = round(SRC_HW[0] * sy), round(SRC_HW[1] * sx)
    p = _params(spec, {
        "asym": np.bool_(False),
        "color_factors": np.zeros((2, 4), np.float32) + np.array(
            [1.0, 1.0, 1.0, 0.0], np.float32),
        "eraser_on": np.bool_(False),
        "scale_x": np.float32(sx), "scale_y": np.float32(sy),
        # crop_u/v chosen so floor(u * (n - crop)) == the offsets above
        "crop_u": np.float32((y0 + 0.5) / (nh - CROP[0])),
        "crop_v": np.float32((x0 + 0.5) / (nw - CROP[1])),
    })
    d1, d2, dfl, dvalid = (np.asarray(x) for x in
                           apply_augment(spec, p, jnp.asarray(img1),
                                         jnp.asarray(img2),
                                         jnp.asarray(flow)))

    def host_spatial(img):
        r = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        return r[y0:y0 + CROP[0], x0:x0 + CROP[1]]

    np.testing.assert_allclose(d1, host_spatial(img1), atol=0.51)
    np.testing.assert_allclose(d2, host_spatial(img2), atol=0.51)
    ref_flow = host_spatial(flow[..., 0])[..., None] * sx
    np.testing.assert_allclose(dfl, ref_flow, atol=0.51)
    assert dvalid.shape == CROP and dvalid.min() >= 0 and dvalid.max() <= 1


def test_batched_jit_deterministic_and_shaped(rng):
    spec = _spec()
    fn = jax.jit(make_device_augment(spec))
    img1 = rng.integers(0, 256, (4, *SRC_HW, 3), np.uint8)
    img2 = rng.integers(0, 256, (4, *SRC_HW, 3), np.uint8)
    flow = -rng.uniform(0, 16, (4, *SRC_HW, 1)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    o1 = fn(key, img1, img2, flow)
    o2 = fn(key, img1, img2, flow)
    assert o1[0].shape == (4, *CROP, 3)
    assert o1[2].shape == (4, *CROP, 1)
    assert o1[3].shape == (4, *CROP)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # different samples got different augmentations
    assert not np.allclose(np.asarray(o1[0][0]), np.asarray(o1[0][1]))


@pytest.mark.slow
def test_trainer_integration_device_augment(tmp_path):
    """Two real train() steps with device_augment on a raw synthetic loader."""
    from realtime_stereo_matcher_tpu.config import load_config
    from realtime_stereo_matcher_tpu.data.loader import StereoDataLoader
    from realtime_stereo_matcher_tpu.data.synthetic import SyntheticStereo
    from realtime_stereo_matcher_tpu.train.trainer import train

    cfg = load_config({
        "name": "TINY_DEVAUG", "path": str(tmp_path),
        "train": {"batch_size": 8, "restore_checkpoint": "",
                  "save_checkpoint_frequency": 1000, "datasets": [],
                  "learn_rate": 1e-3, "num_of_steps": 2,
                  "weight_decay": 1e-5, "fast_kernels": "off",
                  "device_augment": True,
                  "loss": {"type": "SequenceLoss",
                           "parameters": {"loss_gamma": 0.9,
                                          "max_flow_magnitude": 700}}},
        "model": {"type": "MobileStereoNetV2",
                  "parameters": {"down_factor": 3, "max_disp": 32,
                                 "refine_dim": 7,
                                 "refine_dilates": [1, 1], "hidden_dim": 8}},
        "data": {"image_size": [32, 48], "spatial_scale": [-0.2, 0.4],
                 "do_flip": False, "no_y_jitter": True},
    })
    ds = SyntheticStereo(None, length=16, image_hw=(48, 64), max_disp=16.0)
    ds.out_dtype = np.uint8
    loader = StereoDataLoader(ds, 8, num_workers=2)
    ckpt = train(cfg, data_loader=loader)
    assert ckpt and "epoch-3" in ckpt
