"""Relay-wedge hardening: a hung device->host fetch must cost one
checkpoint/metrics batch, never the run (round-4 v1 12k incident)."""

import time

import jax
import numpy as np
import pytest

import realtime_stereo_matcher_tpu.train.trainer as trainer
from realtime_stereo_matcher_tpu.config import load_config
from realtime_stereo_matcher_tpu.utils.fetch import FetchTimeout, timed_fetch


# ---------------------------------------------------------------- timed_fetch

def test_timed_fetch_passthrough():
    assert timed_fetch(lambda: 41 + 1, timeout=5.0) == 42


def test_timed_fetch_propagates_real_errors_immediately():
    t0 = time.time()
    with pytest.raises(ValueError, match="real error"):
        timed_fetch(lambda: (_ for _ in ()).throw(ValueError("real error")),
                    timeout=30.0)
    assert time.time() - t0 < 5.0  # did not wait out the deadline


def test_timed_fetch_retries_then_succeeds():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            time.sleep(10)  # wedge attempt 1 past the deadline
        return "ok"

    assert timed_fetch(flaky, timeout=0.3, retries=1) == "ok"
    assert calls["n"] == 2


def test_timed_fetch_raises_after_exhausted_retries():
    def wedge():
        time.sleep(10)

    t0 = time.time()
    with pytest.raises(FetchTimeout):
        timed_fetch(wedge, timeout=0.2, retries=1, what="test wedge")
    assert time.time() - t0 < 5.0


# ---------------------------------------------------- trainer save/flush path

def _tiny_config(tmp_path, steps=4, save_freq=2):
    return load_config({
        "name": "WEDGE", "path": str(tmp_path),
        "train": {"batch_size": 8, "restore_checkpoint": "",
                  "save_checkpoint_frequency": save_freq, "datasets": [],
                  "learn_rate": 1e-3, "num_of_steps": steps,
                  "weight_decay": 1e-5, "fast_kernels": "off",
                  "loss": {"type": "SequenceLoss",
                           "parameters": {"loss_gamma": 0.9,
                                          "max_flow_magnitude": 700}}},
        "model": {"type": "MobileStereoNetV2",
                  "parameters": {"down_factor": 3, "max_disp": 32,
                                 "refine_dim": 7,
                                 "refine_dilates": [1, 1], "hidden_dim": 8}},
        "data": {"image_size": [32, 48], "spatial_scale": [-0.2, 0.4],
                 "do_flip": False, "no_y_jitter": False},
    })


def _loader(batch=8, h=32, w=48):
    rng = np.random.default_rng(0)
    img1 = rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32)
    img2 = np.roll(img1, -4, axis=2)
    flow = np.full((batch, h, w, 1), -4.0, np.float32)
    valid = np.ones((batch, h, w), np.float32)
    return [("b", img1, img2, flow, valid)]


@pytest.mark.slow
def test_trainer_survives_wedged_checkpoint_fetch(tmp_path, monkeypatch,
                                                  caplog):
    """Both attempts of the step-2 periodic save wedge -> the save is
    SKIPPED with an error log, training runs to completion, and the final
    save (fresh fetch, wedge cleared) still lands."""
    cfg = _tiny_config(tmp_path, steps=4, save_freq=2)

    monkeypatch.setattr(trainer, "FETCH_TIMEOUT_S", 0.5)
    real_get = jax.device_get
    wedges = {"left": 2}  # exactly the periodic save's attempt budget

    def flaky_get(x):
        # wedge only whole-train-state pulls (checkpoint fetches); metric
        # flushes fetch plain arrays and stay healthy
        if isinstance(x, trainer.TrainState) and wedges["left"] > 0:
            wedges["left"] -= 1
            time.sleep(30)
        return real_get(x)

    monkeypatch.setattr(jax, "device_get", flaky_get)

    trainer.train(cfg, data_loader=_loader(), log_dir=str(tmp_path / "runs"))

    assert wedges["left"] == 0, "the wedge was never exercised"
    ckpts = sorted(p.name for p in (tmp_path / "checkpoints").iterdir())
    # step-2 periodic save skipped; step-4 + final(5) saves present
    assert not any("epoch-2" in c for c in ckpts), ckpts
    assert any("epoch-5" in c for c in ckpts), ckpts
    assert any("SKIPPING checkpoint" in r.message for r in caplog.records)


@pytest.mark.slow
def test_trainer_metric_circuit_breaker(tmp_path, monkeypatch, caplog):
    """A PERMANENTLY wedged relay client (round-5 DispNetC 100k incident)
    must not tax every metric flush with the full fetch deadline: after
    METRIC_FETCH_MAX_WEDGES consecutive wedged flushes the trainer disables
    metric fetches and stops calling device_get on metric stacks at all,
    while training and (healthy) checkpoint saves run to completion."""
    cfg = _tiny_config(tmp_path, steps=6, save_freq=100)

    monkeypatch.setattr(trainer, "FETCH_TIMEOUT_S", 0.3)
    real_get = jax.device_get
    calls = {"metric_gets": 0}

    def flaky_get(x):
        if isinstance(x, trainer.TrainState):
            return real_get(x)  # checkpoint pulls stay healthy
        calls["metric_gets"] += 1
        time.sleep(30)  # every metric fetch wedges, forever

    monkeypatch.setattr(jax, "device_get", flaky_get)
    # flush per step so the breaker trips within the tiny run
    real_logger = trainer.MetricLogger
    monkeypatch.setattr(trainer, "MetricLogger",
                        lambda **kw: real_logger(sum_freq=1, **kw))

    trainer.train(cfg, data_loader=_loader(), log_dir=str(tmp_path / "runs"))

    assert any("Metric fetches DISABLED" in r.message
               for r in caplog.records)
    # breaker trips after MAX_WEDGES flushes x (1 try + 1 retry) fetches;
    # the remaining steps must not fetch at all
    assert calls["metric_gets"] == 2 * trainer.METRIC_FETCH_MAX_WEDGES, calls
    ckpts = sorted(p.name for p in (tmp_path / "checkpoints").iterdir())
    assert any("epoch-7" in c for c in ckpts), ckpts  # final save landed
