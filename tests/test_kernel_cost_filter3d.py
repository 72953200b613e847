"""Fused Pallas conv3x3x3 cost-filter stack vs. the Flax CostFilter3D."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_stereo_matcher_tpu.kernels.cost_filter3d import (
    Conv3dSpec,
    build_cost_filter_plan,
    fast_cost_filter,
    flat_to_vol,
    fold_conv3d_weights,
    fused_conv3d_flat,
    vol_to_flat,
)
from realtime_stereo_matcher_tpu.kernels import conv3x3 as k3
from realtime_stereo_matcher_tpu.models.stereo_net import CostFilter3D

pytestmark = pytest.mark.slow  # interpret-mode kernel tests dominate suite time


def test_single_conv3d_matches_xla(rng):
    d, h, w, c = 6, 16, 32, 32
    vol = jnp.asarray(rng.standard_normal((1, d, h, w, c), dtype=np.float32))
    wts = jnp.asarray(
        rng.standard_normal((3, 3, 3, c, c), dtype=np.float32) * 0.1)

    want = jax.lax.conv_general_dilated(
        vol, wts, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    xf = vol_to_flat(vol)
    scale, bias = k3.plain_scale_bias(None, c, 32)
    spec = Conv3dSpec(fold_conv3d_weights(wts), scale, bias, relu=False,
                      phase_in=0)
    yf = fused_conv3d_flat(xf, spec)
    got = flat_to_vol(yf, h, w, c, phase=2)  # one split layer flips the phase
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_cost_filter_stack_matches_flax(rng):
    d, h, w, c = 8, 16, 32, 32
    vol = jnp.asarray(
        rng.standard_normal((1, d, h, w, c), dtype=np.float32) * 0.5)

    module = CostFilter3D(hidden_dim=c)
    variables = module.init(jax.random.PRNGKey(0), vol, train=True)
    want = module.apply(variables, vol, False)  # (1, D, h, w)

    specs = build_cost_filter_plan(variables["params"],
                                   variables["batch_stats"])
    got = fast_cost_filter(vol, specs, dtype=jnp.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=5e-2)
