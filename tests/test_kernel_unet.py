"""Parity: kernels/unet.py fast_unet / fast_unet_flat vs the Flax
UNetFeatureExtractor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_stereo_matcher_tpu.kernels.unet import (
    build_unet_flat_plan,
    build_unet_plan,
    fast_unet,
    fast_unet_flat,
)
from realtime_stereo_matcher_tpu.models.stereo_net import UNetFeatureExtractor


@pytest.mark.slow
def test_fast_unet_matches_flax(rng):
    h, w = 64, 256  # kernel-compatible (models/fast_infer.py _alignment_pad)
    m = UNetFeatureExtractor(hidden_dims=(32,) * 4)
    x = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, False)

    want = m.apply(variables, x, False)
    plan = build_unet_plan(variables["params"])
    got = fast_unet(x, plan, dtype=jnp.float32)

    assert len(want) == len(got) == 4
    for i, (a, b) in enumerate(zip(got, want)):
        assert a.shape == b.shape, (i, a.shape, b.shape)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"level {i}")


@pytest.mark.slow
def test_fast_unet_flat_matches_flax(rng):
    """The production v3 extractor path (models/fast_infer.py): whole U-Net
    in the flat lane layout, glue as 128-lane block matmuls."""
    h, w = 64, 256
    m = UNetFeatureExtractor(hidden_dims=(32,) * 4)
    x = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, False)

    want = m.apply(variables, x, False)
    plan = build_unet_flat_plan(variables["params"])
    got = fast_unet_flat(x, plan, dtype=jnp.float32)

    assert len(want) == len(got) == 4
    for i, (a, b) in enumerate(zip(got, want)):
        assert a.shape == b.shape, (i, a.shape, b.shape)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"level {i}")
