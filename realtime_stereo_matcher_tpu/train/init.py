"""Reference weight-init semantics for training.

The reference re-initializes at train start (train_stereo.py:127-135, called
at :158): every ``Conv2d`` kernel gets ``kaiming_normal_(mode="fan_out",
nonlinearity="relu")`` and every norm layer constant scale-1/bias-0.  Layers
the loop does not touch keep whatever their constructors left:

* v1/v2/v3: torch-default conv init everywhere else -- Conv3d kernels and all
  conv biases keep ``kaiming_uniform_(a=sqrt(5))`` == U(+-1/sqrt(fan_in));
  the v3 U-Net's ConvTranspose2d likewise (torch computes a transposed
  conv's "fan_in" from dim 1, i.e. out_channels * receptive field).
* V4's constructor (mobile_stereo_net_v4.py:411-430) draws Conv2d *and*
  Conv3d from N(0, sqrt(2 / (out_channels * prod(kernel)))); the train-start
  pass then re-draws only the Conv2d ones with the (numerically identical)
  Kaiming fan_out formula.  Its ConvTranspose2d layers keep torch defaults.
* DispNetC's constructor (mobile_disp_net_c.py:325-335) applies
  ``kaiming_normal`` (torch default: fan_in, leaky_relu(0) -> gain sqrt(2))
  to Conv2d and ConvTranspose2d and zeroes their biases; the train-start
  pass then overrides the Conv2d kernels with fan_out Kaiming.

One reference bug is consciously NOT reproduced: the reference calls
``initialize`` *after* checkpoint restore, clobbering restored weights
(train_stereo.py:149-158).  Here the init applies to fresh state only;
restore wins.

All of this is implemented as a pure function over the Flax variables,
dispatching per leaf on the module path (ConvTranspose vs Conv vs the V4
interweave volume's raw kernels) and kernel rank.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _rf(shape, spatial_ndim):
    """Receptive-field size = product of the leading spatial dims."""
    return int(np.prod(shape[:spatial_ndim]))


def _kaiming_normal_fan_out(key, shape, spatial_ndim, dtype):
    """torch kaiming_normal_(mode=fan_out, nonlinearity=relu) on an
    HWIO/DHWIO kernel: std = sqrt(2 / (out_ch * receptive_field))."""
    fan_out = shape[-1] * _rf(shape, spatial_ndim)
    std = float(np.sqrt(2.0 / fan_out))
    return std * jax.random.normal(key, shape, dtype)


def _kaiming_normal_fan_in(key, shape, fan_in, dtype):
    std = float(np.sqrt(2.0 / fan_in))
    return std * jax.random.normal(key, shape, dtype)


def _torch_default_uniform(key, shape, fan_in, dtype):
    """torch's default conv weight/bias init: kaiming_uniform_(a=sqrt(5))
    == U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = float(1.0 / np.sqrt(fan_in)) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _conv_fan_in_of(kernel_shape, spatial_ndim):
    return kernel_shape[-2] * _rf(kernel_shape, spatial_ndim)


# V4 InterweaveVolume raw kernels: (name -> (torch Conv3d kernel prod, out))
# conv3d0 (3,3,8,16) <- Conv3d(1,16,(8,3,3)):  n = 16*8*3*3
# conv1   (3,3,64,32) <- Conv3d(16,32,(4,3,3)): n = 32*4*3*3
_V4_RAW = {
    "conv3d0": (8 * 3 * 3, None),
    "conv1": (4 * 3 * 3, None),
}


def reference_initialize(variables, rng_key, model_type: str = ""):
    """Return variables re-initialized with the reference's effective
    train-start distribution (see module docstring).

    ``variables`` supplies structure/shape/dtype; batch_stats reset to
    mean 0 / var 1.
    """
    dispnet = model_type == "MobileDispNetC"
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    leaves = []
    for i, (path, leaf) in enumerate(flat):
        parts = [str(p.key) for p in path]
        name = parts[-1]
        parent = parts[-2] if len(parts) >= 2 else ""
        key = jax.random.fold_in(rng_key, i)
        shape, dtype = leaf.shape, leaf.dtype
        col = parts[0]  # 'params' or 'batch_stats'

        if col == "batch_stats":
            leaves.append(jnp.zeros(shape, dtype) if name == "mean"
                          else jnp.ones(shape, dtype))
            continue
        if parent.startswith("BatchNorm") or name == "scale":
            leaves.append(jnp.ones(shape, dtype) if name == "scale"
                          else jnp.zeros(shape, dtype))
            continue

        in_v4_volume = any(p.startswith("InterweaveVolume") for p in parts)
        if in_v4_volume and name in _V4_RAW:
            # constructor init N(0, sqrt(2/n)), n = out * prod(3d kernel)
            rf3d, _ = _V4_RAW[name]
            std = float(np.sqrt(2.0 / (shape[-1] * rf3d)))
            leaves.append(std * jax.random.normal(key, shape, dtype))
            continue

        if name == "kernel":
            spatial = leaf.ndim - 2
            if parent.startswith("ConvTranspose"):
                # torch "fan_in" of a transposed conv = out_ch * rf (dim 1)
                t_fan_in = shape[-1] * _rf(shape, spatial)
                if dispnet:
                    leaves.append(_kaiming_normal_fan_in(
                        key, shape, t_fan_in, dtype))
                else:
                    leaves.append(_torch_default_uniform(
                        key, shape, t_fan_in, dtype))
            elif in_v4_volume and parent.startswith("Conv"):
                # cb2 folds Conv3d(32,16,(2,3,3)) depth into channels:
                # n = out * 2*3*3
                if shape == (3, 3, 64, 16):
                    std = float(np.sqrt(2.0 / (shape[-1] * 2 * 3 * 3)))
                    leaves.append(std * jax.random.normal(key, shape, dtype))
                else:
                    leaves.append(_kaiming_normal_fan_out(
                        key, shape, spatial, dtype))
            elif spatial == 3:
                # Conv3d: torch default (v1-v3 cost filters); V4's Conv3d
                # layers live in InterweaveVolume and are handled above
                leaves.append(_torch_default_uniform(
                    key, shape, _conv_fan_in_of(shape, spatial), dtype))
            else:
                leaves.append(_kaiming_normal_fan_out(
                    key, shape, spatial, dtype))
            continue

        if name == "bias":
            if dispnet:
                leaves.append(jnp.zeros(shape, dtype))
            else:
                # torch default conv bias: U(+-1/sqrt(fan_in)) of the owning
                # conv; recover fan_in from the sibling kernel
                sib = dict(
                    (str(p[-1].key), l) for p, l in flat
                    if [str(q.key) for q in p[:-1]] == parts[:-1])
                kern = sib.get("kernel")
                if kern is not None and kern.ndim >= 3:
                    fan_in = _conv_fan_in_of(kern.shape, kern.ndim - 2)
                    leaves.append(_torch_default_uniform(
                        key, shape, fan_in, dtype))
                else:
                    leaves.append(jnp.zeros(shape, dtype))
            continue

        # anything else (none today): keep as-is
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)
