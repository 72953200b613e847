"""Export (StableHLO serving artifact) and profiler (XLA cost analysis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_stereo_matcher_tpu.export import (
    aot_compile,
    export_stereo_model,
    load_exported,
)
from realtime_stereo_matcher_tpu.models import build_model
from realtime_stereo_matcher_tpu.utils.profiler import (
    cost_analysis,
    count_parameters,
    get_model_capacity,
)


def _tiny_model(rng):
    model = build_model({"type": "MobileStereoNet", "parameters": {}})
    h, w = 64, 96
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    return model, variables, left, right


def test_export_roundtrip(rng, tmp_path):
    model, variables, left, right = _tiny_model(rng)
    want = model.apply(variables, left, right, train=False)[-1]

    path = export_stereo_model(
        model, variables, image_hw=(64, 96),
        output_file=tmp_path / "stereo_net.stablehlo", platforms=("cpu",))
    assert path.exists() and path.with_suffix(".stablehlo.json").exists()

    exported = load_exported(path)
    got = exported.call(left, right)
    # different fusion decisions in the exported module => ~1e-4 float noise
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-2)


def test_aot_compile_serving(rng):
    model, variables, left, right = _tiny_model(rng)
    want = model.apply(variables, left, right, train=False)[-1]
    compiled = aot_compile(model, variables, image_hw=(64, 96))
    got = compiled(left, right)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-2)


def test_model_capacity(rng, capsys):
    model, variables, left, right = _tiny_model(rng)
    flops, params = get_model_capacity(model, variables, left, right)
    assert params == count_parameters(variables["params"])
    assert params > 100_000  # v1 has ~400k params
    assert flops > 1e8  # conv-heavy forward at 64x96
    assert "GFLOPs" in capsys.readouterr().out


def test_cost_analysis_generic():
    cost = cost_analysis(
        lambda a, b: a @ b, jnp.ones((128, 256)), jnp.ones((256, 64)))
    # 2*M*N*K FLOPs for a matmul
    assert abs(cost.get("flops", 0.0) - 2 * 128 * 256 * 64) / (2 * 128 * 256 * 64) < 0.1


@pytest.mark.slow
@pytest.mark.parametrize("model_type,params", [
    ("MobileStereoNetV4", {"max_disp": 32, "volume_size": 8, "hg_size": 8}),
    ("MobileDispNetC", {"max_disp": 32}),
])
def test_export_roundtrip_all_models(rng, tmp_path, model_type, params):
    """V4's shift-gather volume + online-softmax scan head and DispNetC's
    transpose-conv decoder must survive StableHLO export."""
    model = build_model({"type": model_type, "parameters": params})
    left = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    want = model.apply(variables, left, right, train=False)[-1]

    path = export_stereo_model(
        model, variables, image_hw=(64, 96),
        output_file=tmp_path / f"{model_type}.stablehlo", platforms=("cpu",))
    got = load_exported(path).call(left, right)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-2)
