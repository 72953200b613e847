"""Fused Pallas conv3x3 kernel vs. XLA reference conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_stereo_matcher_tpu.kernels.conv3x3 import (
    fold_bn_scale_bias,
    fold_conv3x3_weights,
    from_flat,
    fused_conv3x3_flat,
    plain_scale_bias,
    to_flat,
)

pytestmark = pytest.mark.slow  # interpret-mode kernel tests dominate suite time


def _xla_conv(x, w, dilation=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(dilation, dilation)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("dilation", [1, 2, 4, 8])
def test_fused_conv_matches_xla(rng, dilation):
    h, w, c = 48, 64, 32
    x = jnp.asarray(rng.standard_normal((1, h, w, c), dtype=np.float32))
    wts = jnp.asarray(
        rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1)

    want = np.asarray(_xla_conv(x, wts, dilation))

    xf = to_flat(x, c_pad=32)
    blocks = fold_conv3x3_weights(wts, dilation=dilation)
    scale, bias = plain_scale_bias(None, c, 32)
    yf = fused_conv3x3_flat(xf, blocks, scale, bias, dilation=dilation,
                            relu=False, th=16)
    got = np.asarray(from_flat(yf, h, w, c, 32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_conv_bn_relu_residual(rng):
    """Full ResBlock-tail epilogue: BN fold + ReLU + post-ReLU residual."""
    h, w, c = 32, 64, 32
    x = jnp.asarray(rng.standard_normal((1, h, w, c), dtype=np.float32))
    res = jnp.asarray(rng.standard_normal((1, h, w, c), dtype=np.float32))
    wts = jnp.asarray(
        rng.standard_normal((3, 3, c, c), dtype=np.float32) * 0.1)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    beta = jnp.asarray(rng.uniform(-0.5, 0.5, c).astype(np.float32))
    mean = jnp.asarray(rng.uniform(-0.5, 0.5, c).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    eps = 1e-5

    conv = _xla_conv(x, wts)
    bn = (conv - mean) / jnp.sqrt(var + eps) * gamma + beta
    want = np.asarray(jax.nn.relu(bn) + res)

    xf = to_flat(x, 32)
    rf = to_flat(res, 32)
    blocks = fold_conv3x3_weights(wts)
    scale, bias = fold_bn_scale_bias(gamma, beta, mean, var, eps, c, 32)
    yf = fused_conv3x3_flat(xf, blocks, scale, bias, relu=True, residual=rf,
                            th=16)
    got = np.asarray(from_flat(yf, h, w, c, 32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_conv_channel_padding(rng):
    """C_in < 32 (RefineNet first conv) and C_out = 1 (final head)."""
    h, w = 32, 64
    x = jnp.asarray(rng.standard_normal((1, h, w, 4), dtype=np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, 4, 32), dtype=np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 32, 1), dtype=np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((1,), dtype=np.float32))

    mid = jax.nn.relu(_xla_conv(x, w1))
    want = np.asarray(_xla_conv(mid, w2) + b2)

    xf = to_flat(x, 32)  # pads 4 -> 32 channels
    blk1 = fold_conv3x3_weights(w1, c_in_pad=32)
    s1, bi1 = plain_scale_bias(None, 32, 32)
    midf = fused_conv3x3_flat(xf, blk1, s1, bi1, relu=True, th=16)
    blk2 = fold_conv3x3_weights(w2, c_out_pad=32)
    s2, bi2 = plain_scale_bias(b2, 1, 32)
    outf = fused_conv3x3_flat(midf, blk2, s2, bi2, relu=False, th=16)
    got = np.asarray(from_flat(outf, h, w, 1, 32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_split_fold_phase_stack_matches_xla(rng):
    """Split-window (6-matmul) convs alternate pixel phase 0 <-> 2 across a
    stack mixed with phase-preserving 9-block convs (d=4, 8)."""
    h, w, c = 48, 64, 32
    x = jnp.asarray(rng.standard_normal((1, h, w, c), dtype=np.float32))
    dils = (1, 8, 2, 4, 1)
    wts = [jnp.asarray(rng.standard_normal((3, 3, c, c),
                                           dtype=np.float32) * 0.1)
           for _ in dils]
    scale, bias = plain_scale_bias(None, c, 32)

    want = x
    for i, d in enumerate(dils):
        want = _xla_conv(want, wts[i], d)
        if i < len(dils) - 1:
            want = jax.nn.relu(want)

    from realtime_stereo_matcher_tpu.kernels.conv3x3 import (
        fold_conv3x3_split_weights,
    )

    yf = to_flat(x, 32)
    phase = 0
    for i, d in enumerate(dils):
        if d <= 2:
            blocks = fold_conv3x3_split_weights(wts[i], d, phase)
            next_phase = 2 - phase
        else:
            blocks = fold_conv3x3_weights(wts[i], d)
            next_phase = phase
        yf = fused_conv3x3_flat(yf, blocks, scale, bias, dilation=d,
                                relu=(i < len(dils) - 1), th=16,
                                phase_in=phase)
        phase = next_phase
    got = from_flat(yf, h, w, c, 32, phase=phase)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_fused_conv4x4_s2_matches_xla(rng):
    """Stride-2 4x4 TF-SAME kernel (phase-2 input, leaky epilogue) vs XLA --
    the v3 U-Net downsampler geometry (kernels/unet.py)."""
    from realtime_stereo_matcher_tpu.kernels.conv3x3 import (
        fold_conv4x4_s2_weights,
        fused_conv4x4_s2_flat,
    )

    h, w, c = 16, 64, 32
    x = jnp.asarray(rng.standard_normal((1, h, w, c), dtype=np.float32))
    wts = jnp.asarray(
        rng.standard_normal((4, 4, c, c), dtype=np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((c,), dtype=np.float32))

    y = jax.lax.conv_general_dilated(
        x, wts, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias
    want = np.asarray(jnp.maximum(y, 0) + 0.2 * jnp.minimum(y, 0))

    xf = to_flat(x, 32, phase=2)
    blocks = fold_conv4x4_s2_weights(wts, 32, 32)
    scale, b128 = plain_scale_bias(bias, c, 32)
    yf = fused_conv4x4_s2_flat(xf, blocks, scale, b128, relu=0.2)
    got = np.asarray(from_flat(yf, h // 2, w // 2, c, 32, phase=0))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
