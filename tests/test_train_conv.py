"""flat_conv3x3 (training-path custom_vjp conv) vs lax.conv oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_stereo_matcher_tpu.kernels import conv3x3 as k3
from realtime_stereo_matcher_tpu.kernels.train_conv import (
    batch_image_mask,
    flat_conv3x3,
    from_flat_batch,
    to_flat_batch,
)

pytestmark = pytest.mark.slow  # interpret-mode kernel tests dominate suite time


def conv_ref(x, w, dilation=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(dilation, dilation)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _mk(rng, b=1, h=16, w=32, c=32):
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    wk = (rng.standard_normal((3, 3, c, c)) * 0.2).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(wk)


@pytest.mark.parametrize("dilation", [1, 2, 4, 8])
def test_forward_matches_lax_conv(rng, dilation):
    x, wk = _mk(rng)
    xf = to_flat_batch(x)
    yf = flat_conv3x3(xf, wk, dilation, 0)
    _, _, _, phase = __import__(
        "realtime_stereo_matcher_tpu.kernels.train_conv",
        fromlist=["_fold_selector"])._fold_selector(dilation, 0)
    y = from_flat_batch(yf, 1, 16, 32, 32, phase=phase)
    want = conv_ref(x, wk, dilation)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_grads_match_lax_conv(rng, dilation):
    from realtime_stereo_matcher_tpu.kernels.train_conv import _fold_selector

    x, wk = _mk(rng, h=16, w=32)
    _, _, _, phase = _fold_selector(dilation, 0)
    cot = jnp.asarray(rng.standard_normal((1, 16, 32, 32)).astype(np.float32))

    def loss_fast(x, wk):
        xf = to_flat_batch(x)
        yf = flat_conv3x3(xf, wk, dilation, 0)
        y = from_flat_batch(yf, 1, 16, 32, 32, phase=phase)
        return jnp.sum(y * cot)

    def loss_ref(x, wk):
        return jnp.sum(conv_ref(x, wk, dilation) * cot)

    gx_f, gw_f = jax.grad(loss_fast, argnums=(0, 1))(x, wk)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=1e-3, atol=2e-3)


def test_phase2_roundtrip_and_grads(rng):
    """Chain two split convs (phase 0 -> 2 -> 0) and check against oracle.

    The intermediate is re-masked to image rows -- with row-alignment
    padding, core rows below the image are computed by the kernel and must
    be zeroed by the consumer before the next conv (exactly what the BN
    epilogue mask does in the assembly)."""
    x, w1 = _mk(rng, h=8, w=32)
    w2 = jnp.asarray((rng.standard_normal((3, 3, 32, 32)) * 0.2)
                     .astype(np.float32))

    def fast(x, w1, w2):
        xf = to_flat_batch(x)
        y1 = flat_conv3x3(xf, w1, 1, 0)     # phase 0 -> 2
        y1 = y1 * batch_image_mask(y1.shape[0], y1.shape[1], 1, 8, 32, 2)
        y2 = flat_conv3x3(y1, w2, 1, 2)     # phase 2 -> 0
        return from_flat_batch(y2, 1, 8, 32, 32, phase=0)

    def ref(x, w1, w2):
        return conv_ref(conv_ref(x, w1), w2)

    np.testing.assert_allclose(np.asarray(fast(x, w1, w2)),
                               np.asarray(ref(x, w1, w2)),
                               rtol=1e-4, atol=1e-4)

    def lf(x, w1, w2):
        return (fast(x, w1, w2) ** 2).sum()

    def lr(x, w1, w2):
        return (ref(x, w1, w2) ** 2).sum()

    gf = jax.grad(lf, argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(lr, argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)


def test_batched_flat_layout_roundtrip_and_conv(rng):
    """Batch-4 row-stacked layout: roundtrip + per-image SAME conv parity.

    The conv output is read back only at image rows (from_flat_batch), which
    is how the assembly consumes it; gap rows are re-masked by the caller.
    """
    x, wk = _mk(rng, b=4, h=8, w=32)
    xf = to_flat_batch(x)
    np.testing.assert_array_equal(
        np.asarray(from_flat_batch(xf, 4, 8, 32, 32)), np.asarray(x))

    yf = flat_conv3x3(xf, wk, 1, 0)
    y = from_flat_batch(yf, 4, 8, 32, 32, phase=2)
    want = conv_ref(x, wk, 1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # gradient parity through the batched layout
    cot = jnp.asarray(rng.standard_normal((4, 8, 32, 32)).astype(np.float32))

    def loss_fast(x, wk):
        yf = flat_conv3x3(to_flat_batch(x), wk, 1, 0)
        return jnp.sum(from_flat_batch(yf, 4, 8, 32, 32, phase=2) * cot)

    def loss_ref(x, wk):
        return jnp.sum(conv_ref(x, wk, 1) * cot)

    gx_f, gw_f = jax.grad(loss_fast, argnums=(0, 1))(x, wk)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=1e-3, atol=2e-3)


def test_batch_image_mask_geometry():
    rows = 2 * k3.PADR + 2 * 8 + k3.PADR  # b=2, h=8
    xf = jnp.ones((rows, 24, 128))
    m = batch_image_mask(rows, 24, 2, 8, 32, 0)
    # image rows kept, gap + halo rows zeroed
    m_np = np.asarray(m)
    assert m_np[k3.PADR, k3.PADC_TILES, 0] == 1.0
    assert m_np[k3.PADR + 8, k3.PADC_TILES, 0] == 0.0          # gap row
    assert m_np[0].max() == 0.0 and m_np[-1].max() == 0.0      # halos
    assert m_np[:, 0].max() == 0.0                             # pad cols


def test_unaligned_width_conv_and_grads(rng):
    """W = 80 px (20 tiles, not 8-aligned): the canvas pads to alignment and
    pixel-exact masks define the image -- conv + grads still match lax."""
    x, wk = _mk(rng, b=2, h=8, w=80)
    xf = to_flat_batch(x)
    assert xf.shape[1] % 8 == 0, xf.shape
    np.testing.assert_array_equal(
        np.asarray(from_flat_batch(xf, 2, 8, 80, 32)), np.asarray(x))

    m = batch_image_mask(xf.shape[0], xf.shape[1], 2, 8, 80, 2)
    cot = jnp.asarray(rng.standard_normal((2, 8, 80, 32)).astype(np.float32))

    def loss_fast(x, wk):
        yf = flat_conv3x3(to_flat_batch(x), wk, 1, 0)
        yf = yf * m  # consumer-side image masking (as the assembly does)
        return jnp.sum(from_flat_batch(yf, 2, 8, 80, 32, phase=2) * cot)

    def loss_ref(x, wk):
        return jnp.sum(conv_ref(x, wk, 1) * cot)

    np.testing.assert_allclose(
        np.asarray(from_flat_batch(flat_conv3x3(to_flat_batch(x), wk, 1, 0),
                                   2, 8, 80, 32, phase=2)),
        np.asarray(conv_ref(x, wk, 1)), rtol=1e-4, atol=1e-4)

    gx_f, gw_f = jax.grad(loss_fast, argnums=(0, 1))(x, wk)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=1e-3, atol=2e-3)

    # two chained convs across the unaligned boundary: the intermediate must
    # be re-masked for SAME-padding parity, exactly like the BN epilogue does
    w2 = jnp.asarray((rng.standard_normal((3, 3, 32, 32)) * 0.2)
                     .astype(np.float32))
    y1 = flat_conv3x3(to_flat_batch(x), wk, 1, 0) * m
    y2 = from_flat_batch(flat_conv3x3(y1, w2, 1, 2), 2, 8, 80, 32, phase=0)
    np.testing.assert_allclose(np.asarray(y2),
                               np.asarray(conv_ref(conv_ref(x, wk), w2)),
                               rtol=1e-4, atol=1e-4)


def conv3d_ref(v, w):
    return jax.lax.conv_general_dilated(
        v, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_conv3d_forward_and_grads_match_lax(rng):
    from realtime_stereo_matcher_tpu.kernels.train_conv3d import (
        batch_slab_mask,
        flat_conv3d,
        vol_from_flat_batch,
        vol_to_flat_batch,
    )

    B, D, H, W, C = 2, 5, 6, 16, 32
    v = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
    wk = jnp.asarray((rng.standard_normal((3, 3, 3, C, C)) * 0.1)
                     .astype(np.float32))

    xf3 = vol_to_flat_batch(v)
    np.testing.assert_array_equal(
        np.asarray(vol_from_flat_batch(xf3, B, D, H, W, C)), np.asarray(v))

    yf3 = flat_conv3d(xf3, wk, 0)
    y = vol_from_flat_batch(yf3, B, D, H, W, C, phase=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(conv3d_ref(v, wk)),
                               rtol=1e-4, atol=1e-4)

    # grads, including a masked chained second conv (BN-epilogue pattern)
    slabs, rows, wt, _ = xf3.shape
    m = batch_slab_mask(slabs, rows, wt, B, D, W, 2)
    w2 = jnp.asarray((rng.standard_normal((3, 3, 3, C, C)) * 0.1)
                     .astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))

    def loss_fast(v, wk, w2):
        y1 = flat_conv3d(vol_to_flat_batch(v), wk, 0) * m
        y2 = flat_conv3d(y1, w2, 2)
        return jnp.sum(vol_from_flat_batch(y2, B, D, H, W, C, phase=0) * cot)

    def loss_ref(v, wk, w2):
        return jnp.sum(conv3d_ref(conv3d_ref(v, wk), w2) * cot)

    gf = jax.grad(loss_fast, argnums=(0, 1, 2))(v, wk, w2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(v, wk, w2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)


def test_s2_conv_grads_match_lax(rng):
    from realtime_stereo_matcher_tpu.kernels.train_conv import conv3x3_s2

    for b, h, w, ci, co in ((2, 16, 32, 3, 32), (2, 8, 64, 32, 32)):
        x = jnp.asarray(rng.standard_normal((b, h, w, ci)).astype(np.float32))
        wk = jnp.asarray((rng.standard_normal((3, 3, ci, co)) * 0.2)
                         .astype(np.float32))
        cot = jnp.asarray(rng.standard_normal((b, h // 2, w // 2, co))
                          .astype(np.float32))

        def ref(x, wk):
            return jax.lax.conv_general_dilated(
                x, wk, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        np.testing.assert_allclose(np.asarray(conv3x3_s2(x, wk)),
                                   np.asarray(ref(x, wk)),
                                   rtol=1e-5, atol=1e-5)

        gx_f, gw_f = jax.grad(
            lambda x, wk: jnp.sum(conv3x3_s2(x, wk) * cot),
            argnums=(0, 1))(x, wk)
        gx_r, gw_r = jax.grad(
            lambda x, wk: jnp.sum(ref(x, wk) * cot), argnums=(0, 1))(x, wk)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                                   rtol=1e-3, atol=2e-3)
