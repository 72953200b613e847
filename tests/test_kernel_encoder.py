"""Stride-2 fused conv + kernel-path FeatureEncoder vs. Flax/XLA reference
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_stereo_matcher_tpu.kernels.conv3x3 import (
    fold_conv3x3_s2_weights,
    from_flat,
    fused_conv3x3_s2_flat,
    plain_scale_bias,
    to_flat,
)
from realtime_stereo_matcher_tpu.kernels.encoder import (
    build_encoder_plan,
    fast_encoder,
)
from realtime_stereo_matcher_tpu.models.stereo_net import FeatureEncoder

pytestmark = pytest.mark.slow  # interpret-mode kernel tests dominate suite time


def _xla_conv_s2(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("c_in", [32, 3])
def test_fused_s2_conv_matches_xla(rng, c_in):
    h, w, c = 48, 128, 32
    x = jnp.asarray(rng.standard_normal((1, h, w, c_in), dtype=np.float32))
    wts = jnp.asarray(
        rng.standard_normal((3, 3, c_in, c), dtype=np.float32) * 0.1)

    want = np.asarray(_xla_conv_s2(x, wts))

    xf = to_flat(x, c_pad=32)
    blocks = fold_conv3x3_s2_weights(wts, c_in_pad=32, c_out_pad=32)
    scale, bias = plain_scale_bias(None, c, 32)
    yf = fused_conv3x3_s2_flat(xf, blocks, scale, bias, relu=False, th=8)
    got = np.asarray(from_flat(yf, h // 2, w // 2, c, 32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fast_encoder_matches_flax(rng):
    h, w = 48, 256  # W % (64 << 2): every level keeps 8-aligned tiles
    down = 2
    enc = FeatureEncoder(hidden_dim=32, down_factor=down, dtype=None)
    x = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x, True)
    want = np.asarray(enc.apply(variables, x, False))

    plan = build_encoder_plan(variables["params"], variables["batch_stats"],
                              down_factor=down)
    got = np.asarray(fast_encoder(x, plan, dtype=jnp.float32))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
