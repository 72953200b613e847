"""Disparity-sharded cost volume + filter + soft-argmin vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from realtime_stereo_matcher_tpu.models.stereo_net import (
    CostFilter3D,
    _coarse_disparity,
)
from realtime_stereo_matcher_tpu.parallel.disparity_sharding import (
    make_sharded_coarse_fn,
)


def test_sharded_coarse_matches_single_device(rng):
    b, h, w, c = 1, 8, 24, 32
    max_disp = 16  # 2 shifts per device on the 8-device mesh
    left = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))
    right = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))

    module = CostFilter3D(hidden_dim=c)
    dummy_vol = jnp.zeros((b, max_disp, h, w, c), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), dummy_vol, train=True)

    want = _coarse_disparity(
        left, right, max_disp,
        lambda vol, train: module.apply(variables, vol, train), False)[..., 0]

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("disp",))
    fn = make_sharded_coarse_fn(
        mesh, variables["params"], variables["batch_stats"], max_disp,
        hidden_dim=c)
    got = fn(left, right)

    assert got.shape == want.shape == (b, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sharded_v4_volume_matches_single_device(rng):
    from realtime_stereo_matcher_tpu.models.stereo_net_v4 import (
        InterweaveVolume,
    )
    from realtime_stereo_matcher_tpu.parallel.disparity_sharding import (
        make_sharded_v4_volume_fn,
    )

    b, h, w = 1, 8, 24
    n_shifts = 16  # 2 shifts per device on the 8-device mesh
    featL = jnp.asarray(rng.standard_normal((b, h, w, 32), dtype=np.float32))
    featR = jnp.asarray(rng.standard_normal((b, h, w, 32), dtype=np.float32))

    module = InterweaveVolume(n_shifts=n_shifts)
    variables = module.init(jax.random.PRNGKey(0), featL, featR, train=False)
    bs = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.uniform(0.5, 1.5, x.shape), x.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    want = module.apply(variables, featL, featR, train=False)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("disp",))
    fn = make_sharded_v4_volume_fn(mesh, module, variables)
    got = fn(featL, featR)

    assert got.shape == want.shape == (b, n_shifts, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
