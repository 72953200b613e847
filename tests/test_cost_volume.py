"""Cost-volume builders vs. hand-rolled numpy oracles of the reference math."""

import jax.numpy as jnp
import numpy as np
import pytest

from realtime_stereo_matcher_tpu.ops import (
    concat_cost_volume,
    correlation_cost_volume,
    difference_cost_volume,
    groupwise_cost_volume,
    interweave_volume,
    soft_argmin,
)


def _np_difference_volume(left, right, max_disp):
    """Oracle for reference model/mobile_stereo_net.py:8-27 (NHWC layout)."""
    b, h, w, c = left.shape
    vol = np.ones((b, max_disp, h, w, c), dtype=left.dtype)
    vol[:, 0] = left - right
    for d in range(1, max_disp):
        vol[:, d, :, d:, :] = left[:, :, d:, :] - right[:, :, :-d, :]
    return vol


def _np_correlation_volume(left, right, max_disp):
    """Oracle for reference model/mobile_disp_net_c.py:188-205."""
    b, h, w, c = left.shape
    vol = np.zeros((b, max_disp, h, w), dtype=left.dtype)
    vol[:, 0] = (left * right).mean(-1)
    for d in range(1, max_disp):
        vol[:, d, :, d:] = (left[:, :, d:, :] * right[:, :, :-d, :]).mean(-1)
    return vol


def test_difference_volume(rng):
    left = rng.standard_normal((2, 6, 11, 8), dtype=np.float32)
    right = rng.standard_normal((2, 6, 11, 8), dtype=np.float32)
    got = np.asarray(difference_cost_volume(jnp.asarray(left), jnp.asarray(right), 5))
    np.testing.assert_allclose(got, _np_difference_volume(left, right, 5),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("use_matmul", [False, True])
def test_correlation_volume(rng, use_matmul):
    left = rng.standard_normal((2, 5, 13, 16), dtype=np.float32)
    right = rng.standard_normal((2, 5, 13, 16), dtype=np.float32)
    got = np.asarray(correlation_cost_volume(
        jnp.asarray(left), jnp.asarray(right), 6, use_matmul=use_matmul))
    np.testing.assert_allclose(got, _np_correlation_volume(left, right, 6),
                               rtol=1e-5, atol=1e-5)


def test_concat_volume(rng):
    left = rng.standard_normal((1, 4, 9, 3), dtype=np.float32)
    right = rng.standard_normal((1, 4, 9, 3), dtype=np.float32)
    d = 4
    got = np.asarray(concat_cost_volume(jnp.asarray(left), jnp.asarray(right), d))
    # oracle per reference cost_volume/concatenate.py:30-40 (our layout)
    want = np.zeros((1, d, 4, 9, 6), dtype=np.float32)
    want[:, 0, :, :, :3] = left
    want[:, 0, :, :, 3:] = right
    for i in range(1, d):
        want[:, i, :, i:, :3] = left[:, :, i:, :]
        want[:, i, :, i:, 3:] = right[:, :, :-i, :]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_groupwise_volume(rng):
    left = rng.standard_normal((1, 3, 8, 12), dtype=np.float32)
    right = rng.standard_normal((1, 3, 8, 12), dtype=np.float32)
    d, g = 4, 4
    got = np.asarray(groupwise_cost_volume(jnp.asarray(left), jnp.asarray(right), d, g))
    # oracle per reference cost_volume/groupwise.py:12-56 (our layout)
    want = np.zeros((1, d, 3, 8, g), dtype=np.float32)
    lg = left.reshape(1, 3, 8, g, 3)
    rg = right.reshape(1, 3, 8, g, 3)
    want[:, 0] = (lg * rg).mean(-1)
    for i in range(1, d):
        want[:, i, :, i:] = (lg[:, :, i:] * rg[:, :, :-i]).mean(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_interweave(rng):
    left = rng.standard_normal((2, 3, 4, 5), dtype=np.float32)
    right = rng.standard_normal((2, 3, 4, 5), dtype=np.float32)
    got = np.asarray(interweave_volume(jnp.asarray(left), jnp.asarray(right)))
    assert got.shape == (2, 3, 4, 10)
    np.testing.assert_array_equal(got[..., 0::2], left)
    np.testing.assert_array_equal(got[..., 1::2], right)


def test_soft_argmin_matches_definition(rng):
    cost = rng.standard_normal((2, 7, 4, 5), dtype=np.float32)
    got = np.asarray(soft_argmin(jnp.asarray(cost), axis=1, keepdims=True))
    e = np.exp(cost - cost.max(1, keepdims=True))
    p = e / e.sum(1, keepdims=True)
    want = (p * np.arange(7, dtype=np.float32)[None, :, None, None]).sum(
        1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # a one-hot cost peaks at its argmax
    onehot = np.full((1, 7, 1, 1), -100.0, np.float32)
    onehot[0, 3] = 100.0
    out = np.asarray(soft_argmin(jnp.asarray(onehot), axis=1))
    np.testing.assert_allclose(out, [[[3.0]]], atol=1e-5)


def test_soft_argmin_trilinear_matches_composition(rng):
    from realtime_stereo_matcher_tpu.ops import (
        resize_trilinear,
        soft_argmin,
        soft_argmin_trilinear,
    )

    vol = jnp.asarray(rng.standard_normal((2, 12, 6, 10), dtype=np.float32))
    out_d, out_hw = 48, (24, 40)
    want = soft_argmin(
        resize_trilinear(vol, (out_d, *out_hw)), axis=1)
    got = soft_argmin_trilinear(vol, out_d, out_hw, chunk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # chunk not dividing out_d falls back to a single pass
    got1 = soft_argmin_trilinear(vol, out_d, out_hw, chunk=36)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_soft_argmin_trilinear_bf16_resize_close(rng):
    """bf16 spatial resize (the TPU fast path) tracks the f32 composition."""
    from realtime_stereo_matcher_tpu.ops import (
        resize_trilinear,
        soft_argmin,
        soft_argmin_trilinear,
    )

    vol = jnp.asarray(rng.standard_normal((1, 12, 6, 10), dtype=np.float32))
    want = np.asarray(soft_argmin(
        resize_trilinear(vol, (48, 24, 40)), axis=1)).astype(np.float32)
    got = np.asarray(soft_argmin_trilinear(
        vol.astype(jnp.bfloat16), 48, (24, 40), chunk=16))
    err = np.abs(got - want)
    assert float(np.median(err)) < 0.25, float(np.median(err))


def test_correlation_volume_chunked(rng):
    # left-column chunking must be exact: each block reads only the right
    # columns its band needs (ops/cost_volume.py w_chunk)
    left = rng.standard_normal((2, 3, 37, 8), dtype=np.float32)
    right = rng.standard_normal((2, 3, 37, 8), dtype=np.float32)
    want = np.asarray(correlation_cost_volume(
        jnp.asarray(left), jnp.asarray(right), 9, use_matmul=False))
    for chunk in (5, 9, 16, 37, 64):
        got = np.asarray(correlation_cost_volume(
            jnp.asarray(left), jnp.asarray(right), 9, w_chunk=chunk))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_soft_argmin_trilinear_custom_vjp(rng):
    """Value AND gradient of the fused head must match the naive
    resize_trilinear + soft_argmin composition (custom VJP correctness)."""
    import jax

    from realtime_stereo_matcher_tpu.ops.cost_volume import (
        soft_argmin,
        soft_argmin_trilinear,
    )
    from realtime_stereo_matcher_tpu.ops.sampling import resize_trilinear

    vol = jnp.asarray(rng.standard_normal((2, 12, 6, 8)).astype(np.float32))
    out_d, out_hw = 48, (24, 32)

    def naive(v):
        big = resize_trilinear(v, (out_d, *out_hw))
        return soft_argmin(big, axis=1)

    got = soft_argmin_trilinear(vol, out_d, out_hw, chunk=16)
    want = naive(vol)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda v: jnp.sum(fn(v).astype(jnp.float32) ** 2)

    g_got = jax.grad(loss(
        lambda v: soft_argmin_trilinear(v, out_d, out_hw, chunk=16)))(vol)
    g_want = jax.grad(loss(naive))(vol)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=2e-4, atol=2e-4)

    # chunk must not change anything (including the non-divisible fallback)
    for ch in (48, 5):
        g2 = soft_argmin_trilinear(vol, out_d, out_hw, chunk=ch)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
