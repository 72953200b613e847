"""Numerical-equivalence proof for V4's restructured interweave cost volume.

The reference builds the volume with a 48-iteration Python loop over
variable-width slices (reference model/mobile_stereo_net_v4.py:443-458).
This framework decomposes the first (linear) Conv3d into per-image
convolutions combined by a shift-gather, and batches the rest over shifts
(models/stereo_net_v4.py:InterweaveVolume).  Here we run a *literal*
per-shift loop -- slicing exactly like the reference -- through the same
parameters via ``InterweaveVolume.reduce_slice``, and require tight
agreement with the decomposed result, including the boundary columns and the
zero columns x < shift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_stereo_matcher_tpu.models.stereo_net_v4 import InterweaveVolume
from realtime_stereo_matcher_tpu.ops import interweave_volume


def _loop_volume(vol_mod, variables, featL, featR, n_shifts):
    """Literal reference loop: per-shift variable-width slices."""
    b, h, w, c = featL.shape
    vol = np.zeros((b, n_shifts, h, w), dtype=np.float32)
    for i in range(n_shifts):
        if i > 0:
            x = interweave_volume(featL[:, :, i:, :], featR[:, :, :-i, :])
        else:
            x = interweave_volume(featL, featR)
        red = vol_mod.apply(variables, x, train=False,
                            method=InterweaveVolume.reduce_slice)
        vol[:, i, :, i:] = np.asarray(red[..., 0])
    return vol


def _randomized_variables(vol_mod, rng, h, w):
    """Randomize *all* variables, including BN scale/bias/stats.

    With default init (BN bias 0) the volume's final ReLU clips everything to
    zero and any two formulations agree trivially -- round 1's version of
    this helper did exactly that, hiding a right-edge boundary bug.  The
    nonzero-fraction assertion in the test guards against regressing to a
    vacuous comparison."""
    variables = vol_mod.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, h, w, 32)),
                             jnp.zeros((1, h, w, 32)), train=False)
    flat = jax.tree_util.tree_flatten_with_path(variables)
    leaves = []
    for path, x in flat[0]:
        if str(path[-1].key) == "var":
            leaves.append(jnp.asarray(rng.uniform(0.5, 1.5, x.shape), x.dtype))
        else:
            leaves.append(jnp.asarray(rng.normal(0.2, 0.6, x.shape), x.dtype))
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def test_decomposed_volume_equals_reference_loop(rng):
    b, h, w = 1, 8, 20
    n_shifts = 6
    featL = jnp.asarray(rng.standard_normal((b, h, w, 32), dtype=np.float32))
    featR = jnp.asarray(rng.standard_normal((b, h, w, 32), dtype=np.float32))

    vol_mod = InterweaveVolume(n_shifts=n_shifts)
    variables = _randomized_variables(vol_mod, rng, h, w)

    got = np.asarray(vol_mod.apply(variables, featL, featR, train=False))
    want = np.asarray(_loop_volume(vol_mod, variables, featL, featR, n_shifts))
    assert (want != 0).mean() > 0.2, "vacuous comparison: volume all zero"
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # boundary columns must be exactly zero
    for i in range(1, n_shifts):
        np.testing.assert_array_equal(got[:, i, :, :i], 0.0)


@pytest.mark.slow
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
