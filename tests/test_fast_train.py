"""Kernel-path training (models/fast_train.py) vs the Flax/XLA reference path.

All in float32 on the CPU interpret backend; shapes chosen so every refine
level satisfies the flat-layout width constraint (W % 128 == 0 for
down_factor 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_stereo_matcher_tpu.config import load_config
from realtime_stereo_matcher_tpu.models import build_model
from realtime_stereo_matcher_tpu.models.fast_train import (
    fast_train_forward,
    make_fast_train_step,
)

pytestmark = pytest.mark.slow  # interpret-mode kernel tests dominate suite time

B, H, W = 2, 32, 128


def _setup(mtype="MobileStereoNet", params=None):
    model = build_model({"type": mtype, "parameters": params or {}})
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    right = jnp.asarray(
        np.roll(np.asarray(left), -2, axis=2).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left[:1], right[:1],
                           train=True)
    return model, variables, left, right


def _tree_close(a, b, rtol=1e-4, atol=1e-4, path=""):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb), (len(la), len(lb))
    for (kp, xa), xb in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(xa, np.float32), np.asarray(xb, np.float32),
            rtol=rtol, atol=atol,
            err_msg=f"{path}{jax.tree_util.keystr(kp)}")


@pytest.mark.parametrize("mtype,params", [
    ("MobileStereoNet", {}),
    ("MobileStereoNetV2", {"down_factor": 3, "max_disp": 192,
                           "refine_dim": 7, "hidden_dim": 32,
                           "refine_dilates": [1, 2, 4, 8, 1, 1]}),
    ("MobileStereoNetV3", {"down_factor": 3, "max_disp": 192,
                           "hidden_dim": 32,
                           "refine_dilates": [1, 2, 4, 8, 1, 1]}),
])
def test_fast_forward_matches_flax(mtype, params):
    model, variables, left, right = _setup(mtype, params)

    ref_preds, ref_upd = model.apply(variables, left, right, train=True,
                                     mutable=["batch_stats"])
    fast_preds, fast_bs = fast_train_forward(
        model, variables["params"], variables["batch_stats"], left, right,
        train=True)

    assert len(fast_preds) == len(ref_preds)
    for fp, rp in zip(fast_preds, ref_preds):
        assert fp.shape == rp.shape
        np.testing.assert_allclose(np.asarray(fp), np.asarray(rp),
                                   rtol=1e-3, atol=2e-3)
    _tree_close(fast_bs, ref_upd["batch_stats"], rtol=1e-4, atol=1e-4)


def _assert_within_noise_floor(gf, gr, gr_perm, slack=6.0, rel=1e-2):
    """Assert the per-leaf *relative L2* grad difference is within ``slack``
    x the reference path's own fp-noise floor (measured by re-running the
    reference with a permuted batch -- mathematically the identity,
    different accumulation order) or ``rel`` overall.  Two valid f32
    algorithms legitimately differ ~0.1-0.4% on single cancelling elements;
    L2-relative comparison is robust to that while wiring bugs (wrong taps,
    residual indices, masks) shift many elements and blow far past it.
    Exact per-op and per-stage correctness is pinned separately by the
    lax-oracle tests (test_train_conv.py) and the standalone stage parity
    checks."""
    import jax.tree_util as jtu

    for (kp, a), b, c in zip(jtu.tree_leaves_with_path(gf),
                             jtu.tree_leaves(gr), jtu.tree_leaves(gr_perm)):
        norm = float(jnp.linalg.norm(b.ravel())) + 1e-20
        if norm < 1e-3:
            # mathematically-zero gradient (e.g. the last cost-filter bias
            # under softmax shift invariance): both paths hold pure noise
            continue
        diff = float(jnp.linalg.norm((a - b).ravel())) / norm
        floor = float(jnp.linalg.norm((b - c).ravel())) / norm
        limit = max(slack * floor, rel)
        assert diff <= limit, (jtu.keystr(kp), diff, floor, norm)


def test_fast_train_step_matches_reference_step():
    from realtime_stereo_matcher_tpu.train.loss import sequence_loss

    model, variables, left, right = _setup()
    flow = jnp.full((B, H, W, 1), -2.0, jnp.float32)
    valid = jnp.ones((B, H, W), jnp.float32)

    def loss_ref(prms, l, r, fl, vd):
        preds, _ = model.apply(
            {"params": prms, "batch_stats": variables["batch_stats"]},
            l, r, train=True, mutable=["batch_stats"])
        return sequence_loss(preds, fl, vd, loss_gamma=0.9,
                             max_flow_magnitude=700)

    def loss_fast(prms, l, r, fl, vd):
        preds, _ = fast_train_forward(
            model, prms, variables["batch_stats"], l, r, train=True)
        return sequence_loss(preds, fl, vd, loss_gamma=0.9,
                             max_flow_magnitude=700)

    lr_, gr = jax.value_and_grad(loss_ref)(
        variables["params"], left, right, flow, valid)
    gr_perm = jax.grad(loss_ref)(
        variables["params"], left[::-1], right[::-1], flow[::-1], valid[::-1])
    lf_, gf = jax.value_and_grad(loss_fast)(
        variables["params"], left, right, flow, valid)
    np.testing.assert_allclose(float(lf_), float(lr_), rtol=1e-4)
    _assert_within_noise_floor(gf, gr, gr_perm)


def test_refine_net_train_stage_parity():
    """Standalone RefineNet (v2 semantics: warp guidance): kernel path ==
    Flax path to fp tolerance, with a direct cotangent on the refine output
    (no soft-argmin backward to amplify noise)."""
    from realtime_stereo_matcher_tpu.models.fast_train import (
        refine_net_train,
    )
    from realtime_stereo_matcher_tpu.models.stereo_net import RefineNet

    rng = np.random.default_rng(3)
    b, h2, w2 = 2, 16, 64
    disp = jnp.asarray(rng.uniform(0, 8, (b, h2 // 2, w2 // 2, 1))
                       .astype(np.float32))
    l_g = jnp.asarray(rng.standard_normal((b, h2, w2, 3)).astype(np.float32))
    r_g = jnp.asarray(rng.standard_normal((b, h2, w2, 3)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((b, h2, w2, 1)).astype(np.float32))
    dilations = (1, 2, 4, 8, 1, 1)

    rn = RefineNet(32, dilations, warp_guidance=True)
    variables = rn.init(jax.random.PRNGKey(0), disp, l_g, r_g, train=True)
    params, bs = variables["params"], variables["batch_stats"]

    ref_y, ref_upd = rn.apply({"params": params, "batch_stats": bs},
                              disp, l_g, r_g, train=True,
                              mutable=["batch_stats"])
    fast_y, fast_upd = refine_net_train(params, bs, disp, l_g, r_g,
                                        dilations=dilations,
                                        warp_guidance=True, train=True,
                                        dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fast_y), np.asarray(ref_y),
                               rtol=1e-4, atol=1e-4)
    _tree_close(fast_upd, ref_upd["batch_stats"], rtol=1e-4, atol=1e-4)

    gr = jax.grad(lambda p: jnp.sum(rn.apply(
        {"params": p, "batch_stats": bs}, disp, l_g, r_g, train=True,
        mutable=["batch_stats"])[0] * cot))(params)
    gf = jax.grad(lambda p: jnp.sum(refine_net_train(
        p, bs, disp, l_g, r_g, dilations=dilations, warp_guidance=True,
        train=True, dtype=jnp.float32)[0] * cot))(params)
    _tree_close(gf, gr, rtol=2e-3, atol=2e-4)


def test_fast_train_step_runs_and_descends():
    import optax

    from realtime_stereo_matcher_tpu.config import load_config
    from realtime_stereo_matcher_tpu.train.trainer import (
        create_train_state,
    )

    cfg = load_config({
        "name": "T", "path": "/tmp/rsm_fast_train_test",
        "train": {"batch_size": B, "restore_checkpoint": "",
                  "save_checkpoint_frequency": 10 ** 9, "datasets": [],
                  "learn_rate": 1e-3, "num_of_steps": 10,
                  "weight_decay": 1e-5,
                  "loss": {"type": "SequenceLoss",
                           "parameters": {"loss_gamma": 0.9,
                                          "max_flow_magnitude": 700}}},
        "model": {"type": "MobileStereoNet", "parameters": {}},
        "data": {"image_size": [H, W], "spatial_scale": [-0.2, 0.4],
                 "do_flip": False, "no_y_jitter": False},
    })
    model, tx, _, state = create_train_state(cfg)
    step = make_fast_train_step(model, tx,
                                cfg.train.loss.parameters)
    rng = np.random.default_rng(1)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(np.roll(np.asarray(img1), -2, axis=2))
    flow = jnp.full((B, H, W, 1), -2.0, jnp.float32)
    valid = jnp.ones((B, H, W), jnp.float32)

    losses = []
    for _ in range(3):
        state, metrics = step(state, img1, img2, flow, valid)
        losses.append(float(metrics["live_loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 3


def test_cost_filter_train_stage_parity(rng):
    """Standalone CostFilter3D: kernel path == Flax path to fp tolerance."""
    from realtime_stereo_matcher_tpu.models.fast_train import (
        cost_filter_train,
    )
    from realtime_stereo_matcher_tpu.models.stereo_net import CostFilter3D

    B_, D, H_, W_, C = 2, 16, 8, 32, 16
    vol = jnp.asarray(rng.standard_normal((B_, D, H_, W_, C))
                      .astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((B_, D, H_, W_)).astype(np.float32))
    cf = CostFilter3D(C)
    variables = cf.init(jax.random.PRNGKey(0), vol, train=True)
    params, bs = variables["params"], variables["batch_stats"]

    ref_cost, ref_upd = cf.apply({"params": params, "batch_stats": bs}, vol,
                                 True, mutable=["batch_stats"])
    fast_cost, fast_upd = cost_filter_train(params, bs, vol, train=True,
                                            dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fast_cost), np.asarray(ref_cost),
                               rtol=1e-4, atol=1e-4)
    _tree_close(fast_upd, ref_upd["batch_stats"], rtol=1e-4, atol=1e-4)

    gr = jax.grad(lambda p: jnp.sum(cf.apply(
        {"params": p, "batch_stats": bs}, vol, True,
        mutable=["batch_stats"])[0] * cot))(params)
    gf = jax.grad(lambda p: jnp.sum(cost_filter_train(
        p, bs, vol, train=True, dtype=jnp.float32)[0] * cot))(params)
    _tree_close(gf, gr, rtol=1e-3, atol=1e-4)


def test_encoder_train_stage_parity(rng):
    """Standalone FeatureEncoder: kernel path == Flax path to fp tolerance."""
    from realtime_stereo_matcher_tpu.models.fast_train import encoder_train
    from realtime_stereo_matcher_tpu.models.stereo_net import FeatureEncoder

    B_, H_, W_ = 2, 16, 64
    x = jnp.asarray(rng.standard_normal((B_, H_, W_, 3)).astype(np.float32))
    enc = FeatureEncoder(32, 3)
    variables = enc.init(jax.random.PRNGKey(0), x, True)
    params, bs = variables["params"], variables["batch_stats"]

    ref_y, ref_upd = enc.apply({"params": params, "batch_stats": bs}, x,
                               True, mutable=["batch_stats"])
    fast_y, fast_upd = encoder_train(params, bs, x, down=3, train=True,
                                     dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fast_y), np.asarray(ref_y),
                               rtol=1e-4, atol=1e-4)
    _tree_close(fast_upd, ref_upd["batch_stats"], rtol=1e-4, atol=1e-4)

    cot = jnp.asarray(rng.standard_normal(np.shape(ref_y)).astype(np.float32))
    gr = jax.grad(lambda p: jnp.sum(enc.apply(
        {"params": p, "batch_stats": bs}, x, True,
        mutable=["batch_stats"])[0] * cot))(params)
    gf = jax.grad(lambda p: jnp.sum(encoder_train(
        p, bs, x, down=3, train=True, dtype=jnp.float32)[0] * cot))(params)
    _tree_close(gf, gr, rtol=2e-3, atol=2e-4)


def test_sharded_fast_step_matches_single_device():
    """8-virtual-device data-parallel kernel step == single-device step on
    the same global batch (sync-BN psum == one-shard stats)."""
    from realtime_stereo_matcher_tpu.parallel.mesh import (
        make_mesh,
        replicated,
        shard_batch,
    )
    from realtime_stereo_matcher_tpu.train.trainer import create_train_state

    if len(jax.devices()) < 8:
        import pytest as _pytest
        _pytest.skip("needs the 8-device CPU mesh")

    b, h, w = 8, 16, 128
    cfg = load_config({
        "name": "DP", "path": "/tmp/rsm_dp_test",
        "train": {"batch_size": b, "restore_checkpoint": "",
                  "save_checkpoint_frequency": 10 ** 9, "datasets": [],
                  "learn_rate": 1e-3, "num_of_steps": 4,
                  "weight_decay": 1e-5,
                  "loss": {"type": "SequenceLoss",
                           "parameters": {"loss_gamma": 0.9,
                                          "max_flow_magnitude": 700}}},
        "model": {"type": "MobileStereoNet", "parameters": {}},
        "data": {"image_size": [h, w], "spatial_scale": [-0.2, 0.4],
                 "do_flip": False, "no_y_jitter": False},
    })
    model, tx, _, state = create_train_state(cfg)
    rng = np.random.default_rng(0)
    img1 = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    img2 = np.roll(img1, -2, axis=2)
    flow = np.full((b, h, w, 1), -2.0, np.float32)
    valid = np.ones((b, h, w), np.float32)

    # single device
    step1 = make_fast_train_step(model, tx, cfg.train.loss.parameters)
    st1, m1 = step1(state, jnp.asarray(img1), jnp.asarray(img2),
                    jnp.asarray(flow), jnp.asarray(valid))

    # 8-device data-parallel
    mesh = make_mesh(data=8, spatial=1)
    step8 = jax.jit(make_fast_train_step(model, tx,
                                         cfg.train.loss.parameters,
                                         mesh=mesh))
    state8 = jax.device_put(state, replicated(mesh))
    batch = shard_batch(mesh, (img1, img2, flow, valid))
    st8, m8 = step8(state8, *batch)

    np.testing.assert_allclose(float(m8["live_loss"]),
                               float(m1["live_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m8["epe"]), float(m1["epe"]),
                               rtol=1e-4)
    for (kp, a), b_ in zip(
            jax.tree_util.tree_leaves_with_path(st8.params),
            jax.tree_util.tree_leaves(st1.params)):
        # AdamW normalizes gradients, so fp-noise-level grad differences
        # surface as O(lr)-scale param jitter; the exact-equality checks
        # here are loss/EPE/batch-stats (psum'd sums).  2e-4 = 20% of one
        # lr=1e-3 update still catches wrong-gradient wiring.
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=1e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(kp))
    for a, b_ in zip(jax.tree_util.tree_leaves(st8.batch_stats),
                     jax.tree_util.tree_leaves(st1.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)
