"""End-to-end sharded inference (parallel/sharded_infer.py) parity.

The disparity-sharded coarse stage + spatially-sharded encoder/refines must
reproduce the single-device ``model.apply`` outputs on the virtual 8-device
CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_stereo_matcher_tpu.models import build_model
from realtime_stereo_matcher_tpu.parallel.sharded_infer import (
    make_sharded_infer,
)


def test_sharded_infer_matches_single_device(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    model = build_model({"type": "MobileStereoNet",
                         "parameters": {"max_disp": 64}})
    h, w = 64, 96
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)

    want = model.apply(variables, left, right, train=False)
    fwd = make_sharded_infer(model, variables)
    got = fwd(left, right)

    assert len(got) == len(want) == 3
    for g, t in zip(got, want):
        g, t = np.asarray(g, np.float32), np.asarray(t, np.float32)
        assert g.shape == t.shape == (1, h, w, 1)
        np.testing.assert_allclose(g, t, rtol=1e-4, atol=1e-4)


def test_sharded_infer_odd_input_size(rng):
    """Non-/8 input exercises the internal padding through the row-sharded
    stages."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    model = build_model({"type": "MobileStereoNet",
                         "parameters": {"max_disp": 32}})
    h, w = 52, 90
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)

    want = model.apply(variables, left, right, train=False)
    got = make_sharded_infer(model, variables)(left, right)
    for g, t in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(t, np.float32),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("model_type", ["MobileStereoNetV2",
                                        "MobileStereoNetV3"])
def test_sharded_infer_v2_v3(rng, model_type):
    """Warped-guidance variants: v2 (RGB warp) and v3 (pyramid features +
    selection-matrix warp) through the disparity+spatial sharded stages."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    model = build_model({"type": model_type, "parameters": {"max_disp": 64}})
    h, w = 64, 96
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)

    want = model.apply(variables, left, right, train=False)
    got = make_sharded_infer(model, variables)(left, right)

    assert len(got) == len(want) == 3
    for g, t in zip(got, want):
        g, t = np.asarray(g, np.float32), np.asarray(t, np.float32)
        assert g.shape == t.shape == (1, h, w, 1)
        np.testing.assert_allclose(g, t, rtol=1e-4, atol=1e-4)


def test_sharded_infer_v4(rng):
    """V4: shift-axis sharded interweave volume + row-sharded extractor,
    aggregation and fused trilinear head vs single-device apply."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    model = build_model({"type": "MobileStereoNetV4",
                         "parameters": {"max_disp": 32, "volume_size": 8,
                                        "hg_size": 8}})
    h, w = 64, 96
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)

    want = model.apply(variables, left, right, train=False)
    got = make_sharded_infer(model, variables)(left, right)

    assert len(got) == len(want) == 1
    g, t = np.asarray(got[0], np.float32), np.asarray(want[0], np.float32)
    assert g.shape == t.shape == (1, h, w, 1)
    np.testing.assert_allclose(g, t, rtol=1e-4, atol=1e-4)


def test_sharded_infer_dispnetc_exempt(rng):
    """DispNetC raises a documented exemption, not a bare NotImplemented."""
    model = build_model({"type": "MobileDispNetC",
                         "parameters": {"hidden_dim": 8, "max_disp": 32}})
    # the dispatch check precedes any use of variables -- no init needed
    # (a real init costs ~48 s of XLA compile on this 2-vCPU runner)
    with pytest.raises(NotImplementedError, match="single-chip by design"):
        make_sharded_infer(model, {"params": {}, "batch_stats": {}})
