"""Eval harness integration: validators + SGBM golden baseline + neural runner."""

import jax
import numpy as np
import pytest
from PIL import Image

from realtime_stereo_matcher_tpu.classical.sgbm import SGBMModule
from realtime_stereo_matcher_tpu.eval.validators import (
    ModelRunner,
    validate_kitti,
)
from realtime_stereo_matcher_tpu.models import build_model


def _make_kitti(tmp_path, rng, n=3, h=96, w=160, disp=10):
    """Synthetic KITTI-layout scenes with constant disparity ``disp``."""
    root = tmp_path / "KITTI"
    for sub in ["training/image_2", "training/image_3", "training/disp_occ_0"]:
        (root / sub).mkdir(parents=True)
    for i in range(n):
        tex = rng.integers(0, 255, (h, w + disp, 3), dtype=np.uint8)
        tex = ((tex.astype(np.float32) + np.roll(tex, 1, 1)) / 2).astype(np.uint8)
        left = tex[:, :w]
        right = tex[:, disp:disp + w]
        Image.fromarray(left).save(root / f"training/image_2/{i:06d}_10.png")
        Image.fromarray(right).save(root / f"training/image_3/{i:06d}_10.png")
        d16 = np.full((h, w), disp * 256, np.uint16)
        d16[:, :disp] = 0  # occluded band -> invalid
        Image.fromarray(d16, mode="I;16").save(
            root / f"training/disp_occ_0/{i:06d}_10.png")
    return root


def test_validate_kitti_with_sgbm(tmp_path, rng):
    """Golden integration: classical baseline + exact KITTI metric math."""
    root = _make_kitti(tmp_path, rng)
    module = SGBMModule(num_of_disps=32, speckle_win_size=0)
    runner = ModelRunner(module)
    results = validate_kitti(runner, root=str(root))
    # SGBM on clean synthetic constant-disparity scenes: sub-pixel EPE
    assert results["kitti-epe"] < 0.5
    assert results["kitti-d1"] < 5.0
    assert results["kitti-fps"] > 0


@pytest.mark.slow
def test_validate_kitti_with_neural_runner(tmp_path, rng):
    """Untrained net runs end-to-end through the padded eval path; metrics
    finite (accuracy meaningless at random init)."""
    root = _make_kitti(tmp_path, rng, n=1)
    model = build_model({"type": "MobileStereoNetV2",
                         "parameters": {"down_factor": 3, "max_disp": 32,
                                        "refine_dim": 7,
                                        "refine_dilates": [1, 1],
                                        "hidden_dim": 8}})
    h64, w64 = 128, 192  # padded-to-64 eval shape for 96x160
    dummy = np.zeros((1, h64, w64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=False)
    runner = ModelRunner(model, variables)
    results = validate_kitti(runner, root=str(root))
    assert np.isfinite(results["kitti-epe"])
    assert results["kitti-fps"] > 0
