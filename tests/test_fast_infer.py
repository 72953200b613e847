"""Kernel-path fast inference vs. the reference Flax path (f32, interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_stereo_matcher_tpu.models import build_model
from realtime_stereo_matcher_tpu.models.fast_infer import make_fast_forward

pytestmark = pytest.mark.slow  # interpret-mode kernel tests dominate suite time


def _init(model_type, rng, h=48, w=256):
    model = build_model({"type": model_type, "parameters": {}})
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    return model, variables, left, right


@pytest.mark.parametrize("model_type", ["MobileStereoNet", "MobileStereoNetV2",
                                        "MobileStereoNetV3"])
def test_fast_forward_matches_flax(rng, model_type):
    model, variables, left, right = _init(model_type, rng)
    want = model.apply(variables, left, right, train=False)
    fast = make_fast_forward(model, variables, dtype=jnp.float32)
    got = fast(left, right)

    assert len(got) == len(want) == 3
    for g, w_ in zip(got, want):
        assert g.shape == w_.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=1e-3, atol=5e-2)
    # negative-flow convention preserved
    assert float(got[-1].max()) <= 0.0


def test_fast_forward_bf16_close_to_flax_bf16(rng):
    """bf16 fast path should track the bf16 Flax path to ~1px."""
    model, variables, left, right = _init("MobileStereoNet", rng)
    model_bf16 = build_model({"type": "MobileStereoNet", "parameters": {}},
                             dtype=jnp.bfloat16)
    want = model_bf16.apply(variables, left, right, train=False)[-1]
    fast = make_fast_forward(model, variables, dtype=jnp.bfloat16)
    got = fast(left, right)[-1]
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert float(np.median(err)) < 1.0, float(np.median(err))
