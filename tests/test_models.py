"""Model zoo smoke + shape/parity-property tests.

Shapes mirror the reference's documented activation shapes (docstring shape
comments in reference model/*.py).  All outputs must be full-resolution,
negative-valued (the repo-wide negative-flow convention) lists coarse->fine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_stereo_matcher_tpu.models import build_model

H, W = 64, 96


def _imgs(rng, h=H, w=W):
    l = rng.uniform(0, 255, size=(1, h, w, 3)).astype(np.float32)
    r = rng.uniform(0, 255, size=(1, h, w, 3)).astype(np.float32)
    return jnp.asarray(l), jnp.asarray(r)


CONFIGS = [
    # sign_constrained: v1-v3 end in ReLU(disp) then negate, so outputs <= 0;
    # DispNetC's side heads are raw convs (reference has no sign constraint
    # either -- eval masks flow_pr < 0 instead).
    ("MobileStereoNet", {}, 3, True),
    ("MobileStereoNetV2",
     {"down_factor": 3, "max_disp": 64, "refine_dim": 7,
      "refine_dilates": [1, 2, 4, 8, 1, 1], "hidden_dim": 16}, 3, True),
    ("MobileStereoNetV3",
     {"down_factor": 3, "max_disp": 64,
      "refine_dilates": [1, 2, 4, 8, 1, 1], "hidden_dim": 16}, 3, True),
    # DispNetC forward-shape coverage lives in the slow tier: its 1/64-deep
    # decoder compiles slowest of the zoo, and the fast tier already runs
    # test_parity_dispnetc (a strictly stronger whole-model check)
    pytest.param("MobileDispNetC",
                 {"hidden_dim": 8, "max_disp": 64, "with_batch_norm": True},
                 6, False, marks=pytest.mark.slow),
]


@pytest.mark.parametrize("mtype,params,n_preds,sign_constrained", CONFIGS)
def test_model_forward_shapes(rng, mtype, params, n_preds, sign_constrained):
    model = build_model({"type": mtype, "parameters": params})
    l, r = _imgs(rng)
    variables = model.init(jax.random.PRNGKey(0), l, r, train=False)
    preds = model.apply(variables, l, r, train=False)
    assert len(preds) == n_preds
    for p in preds:
        assert p.shape == (1, H, W, 1)
        if sign_constrained:
            assert np.all(np.asarray(p) <= 0.0), "disparity must be negative flow"
    assert np.all(np.isfinite(np.asarray(preds[-1])))


@pytest.mark.slow
def test_v4_forward_shapes(rng):
    model = build_model({"type": "MobileStereoNetV4",
                         "parameters": {"max_disp": 64}})
    l, r = _imgs(rng, 48, 64)
    variables = model.init(jax.random.PRNGKey(0), l, r, train=False)
    preds = model.apply(variables, l, r, train=False)
    assert len(preds) == 1
    assert preds[0].shape == (1, 48, 64, 1)
    assert np.all(np.asarray(preds[0]) <= 0.0)

    # train mode: 4 supervision heads, mutable batch stats
    preds, _ = model.apply(variables, l, r, train=True,
                           mutable=["batch_stats"])
    assert len(preds) == 4
    for p in preds:
        assert p.shape == (1, 48, 64, 1)


def test_train_mode_updates_batch_stats(rng):
    model = build_model({"type": "MobileStereoNet", "parameters": {}})
    l, r = _imgs(rng)
    variables = model.init(jax.random.PRNGKey(0), l, r, train=False)
    preds, updates = model.apply(variables, l, r, train=True,
                                 mutable=["batch_stats"])
    assert len(preds) == 3
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_non_divisible_input_shapes(rng):
    """Models must pad internally and crop back (reference forward preamble)."""
    model = build_model({"type": "MobileStereoNet", "parameters": {}})
    l, r = _imgs(rng, 50, 70)
    variables = model.init(jax.random.PRNGKey(0), l, r, train=False)
    preds = model.apply(variables, l, r, train=False)
    assert preds[-1].shape == (1, 50, 70, 1)


def test_disp_net_c_disparity_regression(rng):
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from realtime_stereo_matcher_tpu.models.disp_net_c import (
        disparity_regression,
    )

    corr = rng.standard_normal((2, 12, 5, 7)).astype(np.float32)
    got = np.asarray(disparity_regression(jnp.asarray(corr), 12))
    t = torch.from_numpy(corr)
    vals = torch.arange(0, 12, dtype=t.dtype).view(1, 12, 1, 1)
    want = torch.sum(F.softmax(t, dim=1) * vals, dim=1, keepdim=True).numpy()
    assert got.shape == (2, 1, 5, 7)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grouped_batchnorm_matches_sequential_applies(rng):
    """Pair-batched GroupedBatchNorm == two sequential per-view applies of
    the same plain-BN module (outputs AND threaded running stats), in train
    and eval mode -- the exactness claim behind V4's batched siamese
    extractor (models/layers.py GroupedBatchNorm)."""
    import jax
    import jax.numpy as jnp

    from realtime_stereo_matcher_tpu.models.layers import ConvBN

    left = jnp.asarray(rng.standard_normal((3, 8, 10, 4)).astype(np.float32))
    right = jnp.asarray(
        rng.standard_normal((3, 8, 10, 4)).astype(np.float32) * 2 + 1)

    seq = ConvBN(6, bn_groups=1)
    pair = ConvBN(6, bn_groups=2)
    variables = seq.init(jax.random.PRNGKey(0), left, train=True)
    # non-trivial running stats
    bs = {"ConvBN...": None}
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.standard_normal(x.shape).astype(np.float32) ** 2 + 0.5),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    # sequential: left then right through the same module (stat threading)
    oL, upd1 = seq.apply(variables, left, train=True,
                         mutable=["batch_stats"])
    oR, upd2 = seq.apply(
        {"params": variables["params"], **upd1}, right, train=True,
        mutable=["batch_stats"])

    oP, updP = pair.apply(variables, jnp.concatenate([left, right], axis=0),
                          train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(oP[:3]), np.asarray(oL),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(oP[3:]), np.asarray(oR),
                               rtol=2e-5, atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(
                updP["batch_stats"])[0 if k == "mean" else 1]),
            np.asarray(jax.tree_util.tree_leaves(
                upd2["batch_stats"])[0 if k == "mean" else 1]),
            rtol=2e-5, atol=2e-5, err_msg=k)

    # eval mode: both reduce to running-stat normalization
    eL = seq.apply(variables, left, train=False)
    eP = pair.apply(variables, jnp.concatenate([left, right], axis=0),
                    train=False)
    np.testing.assert_allclose(np.asarray(eP[:3]), np.asarray(eL),
                               rtol=2e-5, atol=2e-5)
