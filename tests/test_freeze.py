"""freeze_bn + parameter-group analogs (train/freeze.py).

Reference semantics: freeze_bn switches every BatchNorm to eval mode while
the rest keeps training (reference train_stereo.py:121-124);
MobileDispNetC.freeze / weight_parameters / bias_parameters give
requires_grad freezing and weight/bias optimizer groups
(model/mobile_disp_net_c.py:414-423).  The reference never invokes them;
here they are reachable (``train.freeze_bn`` config flag) and tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from realtime_stereo_matcher_tpu.models import build_model
from realtime_stereo_matcher_tpu.train.freeze import (
    freeze_labels,
    frozen_bn_apply,
    weight_bias_labels,
)


def _pair(rng, hw=(32, 48)):
    l = rng.uniform(0, 255, (2, *hw, 3)).astype(np.float32)
    return jnp.asarray(l), jnp.asarray(np.roll(l, -3, axis=2))


def test_frozen_bn_train_equals_eval_for_v1(rng):
    """v1's only train-mode behavior is BatchNorm, so frozen-BN train mode
    must reproduce eval mode exactly AND leave batch_stats untouched."""
    model = build_model({"type": "MobileStereoNet",
                         "parameters": {"max_disp": 32}})
    l, r = _pair(rng)
    variables = model.init(jax.random.PRNGKey(0), l, r, train=True)
    # non-trivial running stats so eval != train-with-batch-stats
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                rng.normal(0, 0.1, x.shape).astype(np.float32) ** 2 + 0.5),
            variables["batch_stats"]),
    }

    want = model.apply(variables, l, r, train=False)
    live, upd = model.apply(variables, l, r, train=True,
                            mutable=["batch_stats"])
    frozen, fupd = frozen_bn_apply(model)(variables, l, r, train=True,
                                          mutable=["batch_stats"])

    for f, w in zip(frozen, want):
        np.testing.assert_allclose(np.asarray(f), np.asarray(w),
                                   rtol=1e-6, atol=1e-6)
    # live train mode differs (batch-stat normalization) -- the freeze is
    # doing something
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3
        for a, b in zip(live, want))
    # frozen stats unchanged; live stats updated
    for a, b in zip(jax.tree_util.tree_leaves(fupd["batch_stats"]),
                    jax.tree_util.tree_leaves(variables["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
        for a, b in zip(jax.tree_util.tree_leaves(upd["batch_stats"]),
                        jax.tree_util.tree_leaves(
                            variables["batch_stats"])))


@pytest.mark.slow
def test_frozen_bn_v4_keeps_train_heads(rng):
    """freeze_bn must NOT collapse V4 to eval: 4 supervision heads remain,
    and head 3 (eval-BN normalization + same classif) equals the eval-mode
    output."""
    model = build_model({"type": "MobileStereoNetV4",
                         "parameters": {"max_disp": 64, "volume_size": 8,
                                        "hg_size": 8}})
    l, r = _pair(rng, hw=(32, 64))
    variables = model.init(jax.random.PRNGKey(0), l, r, train=True)

    frozen, _ = frozen_bn_apply(model)(variables, l, r, train=True,
                                       mutable=["batch_stats"])
    assert len(frozen) == 4
    want = model.apply(variables, l, r, train=False)
    np.testing.assert_allclose(np.asarray(frozen[3]), np.asarray(want[0]),
                               rtol=1e-5, atol=1e-5)


def test_weight_bias_groups_and_freeze(rng):
    """optax label trees: bias leaves get their own group (2x lr here), and
    freeze_labels zeroes every weight/bias update (requires_grad=False
    analog)."""
    model = build_model({"type": "MobileStereoNet",
                         "parameters": {"max_disp": 32}})
    l, r = _pair(rng)
    params = model.init(jax.random.PRNGKey(0), l, r, train=True)["params"]

    labels = weight_bias_labels(params)
    flat = {"/".join(str(k.key) for k in p): v
            for p, v in jax.tree_util.tree_flatten_with_path(labels)[0]}
    assert any(v == "bias" for v in flat.values())
    assert any(v == "weight" for v in flat.values())
    for k, v in flat.items():
        assert v == ("bias" if k.endswith("bias") else "weight"), (k, v)

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    tx = optax.multi_transform(
        {"weight": optax.sgd(1.0), "bias": optax.sgd(2.0)}, labels)
    upd, _ = tx.update(grads, tx.init(params), params)
    for path, u in jax.tree_util.tree_flatten_with_path(upd)[0]:
        expect = -2.0 if path[-1].key == "bias" else -1.0
        assert float(np.asarray(u).ravel()[0]) == expect

    ftx = optax.multi_transform(
        {"frozen": optax.set_to_zero()}, freeze_labels(params))
    fupd, _ = ftx.update(grads, ftx.init(params), params)
    assert all(not np.asarray(u).any()
               for u in jax.tree_util.tree_leaves(fupd))
