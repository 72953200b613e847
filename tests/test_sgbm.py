"""Native C++ SGBM vs. ground truth and the OpenCV oracle.

cv2 is used *only in tests*, as the oracle for the classical baseline our
native/sgbm.cpp re-implements from scratch.
"""

import numpy as np
import pytest

from realtime_stereo_matcher_tpu.classical.sgbm import SGBMModule, sgbm_compute


def make_pair(rng, h=96, w=160, disp=12):
    """Textured synthetic scene with a constant-disparity plane."""
    tex = rng.integers(0, 255, size=(h, w + disp + 8), dtype=np.uint8)
    # smooth a bit so BT subpixel behaves
    tex = (tex.astype(np.float32) + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)) / 3
    tex = tex.astype(np.uint8)
    # left pixel x corresponds to right pixel x - disp
    left = tex[:, :w]
    right = tex[:, disp:disp + w]
    return left, right


def test_sgbm_recovers_constant_disparity(rng):
    disp_gt = 12
    left, right = make_pair(rng, disp=disp_gt)
    d = sgbm_compute(left, right, num_of_disps=32, speckle_win_size=0,
                     uniqueness_ratio=10)
    valid = d > -1 + 1e-6  # invalid = min_disp - 1 = -1
    # interior region away from the left occlusion band
    inner = d[8:-8, 40:-8]
    vin = valid[8:-8, 40:-8]
    assert vin.mean() > 0.9
    err = np.abs(inner[vin] - disp_gt)
    assert np.median(err) <= 0.5
    assert (err < 1.0).mean() > 0.9


def test_sgbm_matches_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    left, right = make_pair(rng, disp=10)
    kw = dict(min_disp=0, num_of_disps=32, block_size=5, p1=216, p2=864,
              pre_filter_cap=63, uniqueness_ratio=10, speckle_win_size=100,
              speckle_range=2, disp12_max_diff=1, mode=1)
    ours = sgbm_compute(left, right, **kw)

    sgbm = cv2.StereoSGBM_create(
        minDisparity=kw["min_disp"], numDisparities=kw["num_of_disps"],
        blockSize=kw["block_size"], P1=kw["p1"], P2=kw["p2"],
        preFilterCap=kw["pre_filter_cap"],
        uniquenessRatio=kw["uniqueness_ratio"],
        speckleWindowSize=kw["speckle_win_size"],
        speckleRange=kw["speckle_range"], disp12MaxDiff=kw["disp12_max_diff"],
        mode=cv2.STEREO_SGBM_MODE_HH)
    ref = sgbm.compute(left, right).astype(np.float32) / 16.0

    both_valid = (ours > -0.999) & (ref > -0.999)
    assert both_valid.mean() > 0.5
    agree = np.abs(ours[both_valid] - ref[both_valid])
    # not bit-exact (different BT/border details) but must agree closely
    assert np.median(agree) <= 0.5
    assert (agree <= 1.0).mean() > 0.85
    # validity masks should mostly coincide
    assert ((ours > -0.999) == (ref > -0.999)).mean() > 0.8


def test_sgbm_module_interface(rng):
    """Reference module semantics: batch loop, /16 decode, negation, list out
    (reference model/opencv_sgbm_module.py:51-75)."""
    left, right = make_pair(rng, h=64, w=96, disp=8)
    l = np.repeat(left[None, ..., None], 3, axis=-1).astype(np.float32)
    r = np.repeat(right[None, ..., None], 3, axis=-1).astype(np.float32)
    module = SGBMModule(num_of_disps=32, speckle_win_size=0)
    out = module(l, r)
    assert isinstance(out, list) and len(out) == 1
    d = out[0]
    assert d.shape == (1, 64, 96, 1)
    valid = d < 0.0  # negative flow convention; invalid = +1.0
    assert valid.mean() > 0.5
    assert np.median(-d[valid]) == pytest.approx(8.0, abs=1.0)
