"""Training loop tests: loss descends, checkpoints round-trip, 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from realtime_stereo_matcher_tpu.config import load_config
from realtime_stereo_matcher_tpu.parallel.mesh import make_mesh, shard_batch, replicated
from realtime_stereo_matcher_tpu.train.trainer import (
    TrainState,
    create_train_state,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)


def _tiny_config(tmp_path, steps=8, batch=8):
    return load_config({
        "name": "TINY", "path": str(tmp_path),
        "train": {"batch_size": batch, "restore_checkpoint": "",
                  "save_checkpoint_frequency": 1000, "datasets": [],
                  "learn_rate": 1e-3, "num_of_steps": steps,
                  "weight_decay": 1e-5,
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


def _synthetic_batch(rng, batch, h, w):
    img1 = rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32)
    # right = left shifted by 4 px -> constant disparity 4
    img2 = np.roll(img1, -4, axis=2)
    flow = np.full((batch, h, w, 1), -4.0, np.float32)
    valid = np.ones((batch, h, w), np.float32)
    return img1, img2, flow, valid


def test_train_step_descends_shards_and_checkpoints(tmp_path, rng):
    """One compiled step covers descent, 8-way data sharding AND the
    full-state checkpoint round-trip (merged tests: each whole-model jit
    compile costs ~40 s on this 2-vCPU runner, so the fast tier shares
    one)."""
    cfg = _tiny_config(tmp_path)
    model, tx, schedule, state = create_train_state(cfg)
    step_fn = jax.jit(make_train_step(model, tx,
                                      cfg.train.loss.parameters),
                      donate_argnums=(0,))

    mesh = make_mesh()  # 8 CPU devices -> data=8, spatial=1
    assert mesh.shape["data"] == 8
    state = jax.device_put(state, replicated(mesh))

    img1, img2, flow, valid = _synthetic_batch(rng, 8, 32, 48)
    batch = shard_batch(mesh, (img1, img2, flow, valid))

    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, *batch)
        losses.append(float(metrics["live_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8

    # full-state checkpoint round-trip (params + opt state + step -- the
    # resume the reference lacks, reference train_stereo.py:149-158)
    path = tmp_path / "ckpt"
    save_checkpoint(path, state)
    _, _, _, fresh = create_train_state(cfg)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 8
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_onecycle_schedule_matches_torch():
    """Schedule endpoints/peak per torch OneCycleLR(linear) semantics."""
    from realtime_stereo_matcher_tpu.train.optim import onecycle_schedule

    lr, steps = 2e-4, 1000
    sched = onecycle_schedule(lr, steps)
    total = steps + 100
    assert float(sched(0)) == pytest.approx(lr / 25, rel=1e-3)
    peak_step = int(0.01 * total)
    assert float(sched(peak_step)) == pytest.approx(lr, rel=5e-2)
    assert float(sched(total)) == pytest.approx(lr / 25 / 1e4, rel=0.55)
    # monotone decreasing after peak
    mid, late = float(sched(total // 2)), float(sched(int(total * 0.9)))
    assert mid > late


@pytest.mark.slow
def test_train_step_v4_descends(tmp_path, rng):
    """Gradients flow through the decomposed interweave volume (block-diag
    kernel embeddings, shift-gather, per-layer masks) and the online-softmax
    trilinear head (lax.scan) of MobileStereoNetV4."""
    cfg = load_config({
        "name": "TINYV4", "path": str(tmp_path),
        "train": {"batch_size": 2, "restore_checkpoint": "",
                  "save_checkpoint_frequency": 1000, "datasets": [],
                  "learn_rate": 1e-3, "num_of_steps": 6,
                  "weight_decay": 1e-5,
                  "loss": {"type": "SequenceLoss",
                           "parameters": {"loss_gamma": 0.9,
                                          "max_flow_magnitude": 700}}},
        "model": {"type": "MobileStereoNetV4",
                  "parameters": {"max_disp": 32, "volume_size": 8,
                                 "hg_size": 8}},
        "data": {"image_size": [32, 48], "spatial_scale": [-0.2, 0.4],
                 "do_flip": False, "no_y_jitter": False},
    })
    model, tx, schedule, state = create_train_state(cfg)
    step_fn = jax.jit(make_train_step(model, tx, cfg.train.loss.parameters),
                      donate_argnums=(0,))
    img1, img2, flow, valid = _synthetic_batch(rng, 2, 32, 48)
    losses = []
    for _ in range(6):
        state, metrics = step_fn(state, jnp.asarray(img1), jnp.asarray(img2),
                                 jnp.asarray(flow), jnp.asarray(valid))
        losses.append(float(metrics["live_loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


def test_fast_kernels_auto_selection(tmp_path):
    """fast_step_supported gates the kernel train path correctly."""
    from realtime_stereo_matcher_tpu.models import build_model
    from realtime_stereo_matcher_tpu.models.fast_train import (
        fast_step_supported,
    )

    cfg = _tiny_config(tmp_path)
    cfg.data.image_size = [32, 40]        # W/4 not a multiple of 4 px
    model = build_model(cfg.model.as_dict())
    assert not fast_step_supported(model, cfg, None)

    cfg2 = load_config({
        "name": "T", "path": str(tmp_path),
        "train": {"batch_size": 2, "restore_checkpoint": "",
                  "save_checkpoint_frequency": 1000, "datasets": [],
                  "learn_rate": 1e-3, "num_of_steps": 4,
                  "weight_decay": 1e-5,
                  "loss": {"type": "SequenceLoss",
                           "parameters": {"loss_gamma": 0.9,
                                          "max_flow_magnitude": 700}}},
        "model": {"type": "MobileStereoNet", "parameters": {}},
        "data": {"image_size": [32, 128], "spatial_scale": [-0.2, 0.4],
                 "do_flip": False, "no_y_jitter": False},
    })
    model2 = build_model(cfg2.model.as_dict())
    assert fast_step_supported(model2, cfg2, None)

    # V4 never takes the kernel train path
    v4 = build_model({"type": "MobileStereoNetV4", "parameters": {}})
    assert not fast_step_supported(v4, cfg2, None)

    # multi-device meshes fall back to the XLA path
    mesh8 = make_mesh()
    if mesh8.size > 1:
        assert not fast_step_supported(model2, cfg2, mesh8)
