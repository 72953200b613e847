"""Numerical-equivalence proof for V4's restructured interweave cost volume.

The reference builds the volume with a 48-iteration Python loop over
variable-width slices (reference model/mobile_stereo_net_v4.py:443-458).
This framework batches all shifts into one conv pass
(models/stereo_net_v4.py:_build_volume).  Here we run a *literal* per-shift
loop -- slicing exactly like the reference -- through the same reducer
parameters, and require bitwise-tolerance agreement with the batched result,
including the zero boundary columns.
"""

import jax
import jax.numpy as jnp
import numpy as np

from realtime_stereo_matcher_tpu.models.stereo_net_v4 import (
    InterweaveVolumeReducer,
)
from realtime_stereo_matcher_tpu.ops import interweave_volume, shift_stack


def _batched_volume(reducer, variables, featL, featR, n_shifts):
    """Mirror of MobileStereoNetV4._build_volume (eval mode)."""
    b, h, w, c = featL.shape
    shifted_r, valid = shift_stack(featR, n_shifts)
    left_b = jnp.broadcast_to(featL[:, None], shifted_r.shape)
    valid = valid.astype(featL.dtype)
    inter = interweave_volume(left_b * valid, shifted_r * valid)
    inter = inter.reshape(b * n_shifts, h, w, 2 * c)
    red = reducer.apply(variables, inter, train=False)
    vol = red.reshape(b, n_shifts, h, w)
    col = jnp.arange(w)[None, None, None, :]
    shf = jnp.arange(n_shifts)[None, :, None, None]
    return jnp.where(col >= shf, vol, 0.0)


def _loop_volume(reducer, variables, featL, featR, n_shifts):
    """Literal reference loop: per-shift variable-width slices."""
    b, h, w, c = featL.shape
    vol = np.zeros((b, n_shifts, h, w), dtype=np.float32)
    for i in range(n_shifts):
        if i > 0:
            x = interweave_volume(featL[:, :, i:, :], featR[:, :, :-i, :])
        else:
            x = interweave_volume(featL, featR)
        red = reducer.apply(variables, x, train=False)  # (B, H, W-i, 1)
        vol[:, i, :, i:] = np.asarray(red[..., 0])
    return vol


def test_batched_volume_equals_reference_loop(rng):
    b, h, w, c = 1, 8, 20, 32
    n_shifts = 6
    featL = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))
    featR = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))

    reducer = InterweaveVolumeReducer()
    variables = reducer.init(jax.random.PRNGKey(0),
                             jnp.zeros((2, h, w, 2 * c)), train=False)
    # randomize batch stats so BN actually transforms (init means/vars are 0/1)
    bs = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.uniform(0.5, 1.5, x.shape), x.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    got = np.asarray(_batched_volume(reducer, variables, featL, featR, n_shifts))
    want = _loop_volume(reducer, variables, featL, featR, n_shifts)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # boundary columns must be exactly zero
    for i in range(1, n_shifts):
        np.testing.assert_array_equal(got[:, i, :, :i], 0.0)


def test_chunked_volume_matches_unchunked(rng):
    """The volume_chunk memory knob must not change results."""
    from realtime_stereo_matcher_tpu.models import build_model

    l = jnp.asarray(rng.uniform(0, 255, (1, 32, 48, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(0, 255, (1, 32, 48, 3)).astype(np.float32))
    m_full = build_model({"type": "MobileStereoNetV4",
                          "parameters": {"max_disp": 32, "volume_size": 8,
                                         "hg_size": 8}})
    m_chunk = build_model({"type": "MobileStereoNetV4",
                           "parameters": {"max_disp": 32, "volume_size": 8,
                                          "hg_size": 8, "volume_chunk": 4}})
    v = m_full.init(jax.random.PRNGKey(0), l, r, train=False)
    p_full = m_full.apply(v, l, r, train=False)
    p_chunk = m_chunk.apply(v, l, r, train=False)
    np.testing.assert_allclose(np.asarray(p_full[0]), np.asarray(p_chunk[0]),
                               rtol=1e-5, atol=1e-5)
