"""Scaling-efficiency harness smoke test on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp

from realtime_stereo_matcher_tpu.models import build_model
from realtime_stereo_matcher_tpu.parallel.scaling_bench import (
    scaling_efficiency,
)


def test_scaling_efficiency_runs():
    model = build_model({"type": "MobileStereoNet", "parameters": {}})
    dummy = jnp.zeros((1, 32, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=True)
    results = scaling_efficiency(
        model, variables, device_counts=[1, 2], image_hw=(32, 64),
        frames_per_device=1)
    assert set(results) == {1, 2}
    for r in results.values():
        assert r["fps"] > 0
    assert abs(results[1]["efficiency"] - 1.0) < 1e-6
