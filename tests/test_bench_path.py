"""bench.py must never silently bench the wrong path (round-4 incident).

BENCH_r04.json recorded 27.38 FPS — the plain-XLA number — because a bare
``except Exception`` swallowed a transient kernel-path construction failure
with zero diagnostics.  These tests pin the fix: kernel-path construction is
retried, a fallback is recorded as ``path="xla-fallback"`` + ``degraded``
with the captured errors, and a healthy build records ``path="kernel"``.
"""

import io
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bench
from realtime_stereo_matcher_tpu.models import build_model


@pytest.fixture(scope="module")
def v1_model_and_vars():
    model = build_model({"type": "MobileStereoNet", "parameters": {}})
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, left, train=True)
    return model, variables


def test_forced_failure_is_loud_and_recorded(v1_model_and_vars, capsys):
    model, variables = v1_model_and_vars
    boom = RuntimeError("injected transient relay failure")
    forward, info = bench.build_forward(
        model, variables, _inject_failure=boom)

    # the fallback is RECORDED, not silent
    assert info["path"] == "xla-fallback"
    assert info["degraded"] is True
    # construction was retried before giving up
    assert info["kernel_attempts"] == bench.KERNEL_PATH_ATTEMPTS
    assert len(info["kernel_errors"]) == bench.KERNEL_PATH_ATTEMPTS
    assert "injected transient relay failure" in info["kernel_errors"][0]

    # and LOUD: tracebacks + degraded warning on stderr
    err = capsys.readouterr().err
    assert "kernel-path construction FAILED" in err
    assert "DEGRADED" in err
    assert "injected transient relay failure" in err

    # the fallback forward still works (it is a real measurement, just of
    # the wrong path — which is now impossible to mistake for the real one)
    l = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = forward(l, l)
    assert out.shape == (1, 64, 64, 1)


def test_healthy_build_records_kernel_path(v1_model_and_vars):
    model, variables = v1_model_and_vars
    forward, info = bench.build_forward(model, variables)
    assert info["path"] == "kernel"
    assert info["degraded"] is False
    assert info["kernel_attempts"] == 1
    assert "kernel_errors" not in info


def test_transient_failure_recovered_by_retry(v1_model_and_vars, monkeypatch):
    """First attempt fails, retry succeeds -> kernel path with the error on
    the record (attempts=2)."""
    model, variables = v1_model_and_vars
    import realtime_stereo_matcher_tpu.models.fast_infer as fast_infer

    real = fast_infer.make_fast_forward
    calls = {"n": 0}

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConnectionError("relay hiccup")
        return real(*args, **kwargs)

    monkeypatch.setattr(fast_infer, "make_fast_forward", flaky)
    # bench.build_forward imports the symbol from the module at call time
    forward, info = bench.build_forward(model, variables)
    assert info["path"] == "kernel"
    assert info["degraded"] is False
    assert info["kernel_attempts"] == 2
    assert "relay hiccup" in info["kernel_errors"][0]
