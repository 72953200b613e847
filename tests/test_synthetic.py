"""Procedural synthetic stereo dataset (data/synthetic.py).

The key test runs the native C++ SGBM over a generated pair and requires it
to recover the ground-truth disparity -- an independent geometric-consistency
proof of the generator (if left/right/disp disagreed, no matcher could).
"""

import numpy as np

from realtime_stereo_matcher_tpu.data.synthetic import (
    SyntheticStereo,
    make_scene,
)


def test_scene_contract_and_determinism():
    l1, r1, d1, v1 = make_scene(42, h=96, w=160, max_disp=32)
    l2, r2, d2, v2 = make_scene(42, h=96, w=160, max_disp=32)
    assert l1.shape == r1.shape == (96, 160, 3) and l1.dtype == np.uint8
    assert d1.shape == v1.shape == (96, 160)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(d1, d2)
    assert 0 <= d1.min() and d1.max() <= 32
    assert v1.mean() > 0.85
    l3, _, _, _ = make_scene(43, h=96, w=160, max_disp=32)
    assert np.abs(l1.astype(int) - l3.astype(int)).mean() > 1  # seeds differ


def test_sgbm_recovers_synthetic_gt():
    from realtime_stereo_matcher_tpu.classical.sgbm import sgbm_compute

    left, right, disp, valid = make_scene(7, h=128, w=224, max_disp=40,
                                          n_objects=3)
    gray = lambda im: np.dot(im.astype(np.float32),  # noqa: E731
                             [0.299, 0.587, 0.114]).astype(np.uint8)
    d = sgbm_compute(gray(left), gray(right), num_of_disps=48,
                     speckle_win_size=0, uniqueness_ratio=5)
    ok = (d > -0.999) & (valid > 0.5)
    # exclude the occlusion-ambiguous band right of each depth edge by
    # requiring local GT smoothness
    gx = np.abs(np.diff(disp, axis=1, prepend=disp[:, :1]))
    smooth = gx < 0.5
    m = ok & smooth
    m[:, :48] = False  # SGBM's left matching band
    assert m.mean() > 0.4
    err = np.abs(d[m] - disp[m])
    assert np.median(err) <= 0.6
    assert (err < 1.5).mean() > 0.85


def test_dataset_sample_contract(rng):
    ds = SyntheticStereo(aug_params=None, length=4, image_hw=(96, 160),
                         max_disp=32)
    files, img1, img2, flow, valid = ds[1]
    assert img1.shape == (96, 160, 3) and img1.dtype == np.float32
    assert flow.shape == (96, 160, 1)
    assert (flow <= 0).all()  # negative-flow convention
    assert valid.shape == (96, 160)
    assert len(ds * 3) == 12

    aug = {"crop_size": (64, 128), "min_scale": -0.2, "max_scale": 0.4}
    ds_aug = SyntheticStereo(aug_params=aug, length=4, image_hw=(96, 160),
                             max_disp=32)
    _, a1, a2, af, av = ds_aug.get(0, rng=np.random.default_rng(0))
    assert a1.shape == (64, 128, 3) and af.shape == (64, 128, 1)
    # deterministic under an explicit rng
    _, b1, _, bf, _ = ds_aug.get(0, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(a1, b1)
    np.testing.assert_array_equal(af, bf)
