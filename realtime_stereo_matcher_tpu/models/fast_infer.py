"""Kernel-accelerated inference path for MobileStereoNet v1/v2.

``make_fast_forward(model, variables)`` returns a jit-ready
``forward(left, right) -> [negative disparity maps]`` that reproduces
``model.apply(variables, ..., train=False)`` but runs every RefineNet conv
stack through the fused Pallas conv3x3 kernel
(:mod:`realtime_stereo_matcher_tpu.kernels.refine_stack`) instead of XLA
convolutions -- ~4x faster on the dominant full-resolution cascade.

The encoder, cost volume, 3D filter and soft-argmin are reused *from the
Flax model itself* (submodule apply on the corresponding parameter
sub-trees), so there is a single source of truth for those weights; a parity
test pins fast-path output to the reference Flax path.

Weight folding (numpy) happens once, at build time, outside jit.

Constraints: batch 1 (latency path), eval mode, input W a multiple of
8 * 2**down_factor so every refine level's folded width is 8-lane-tile
aligned.  v3 is not yet wired (its refine input is 65 channels, exceeding
the 32-channel lane fold; its stack-tail could be folded separately).
"""

from __future__ import annotations

import jax.numpy as jnp

from realtime_stereo_matcher_tpu.kernels.cost_filter3d import (
    build_cost_filter_plan,
    fast_cost_filter,
)
from realtime_stereo_matcher_tpu.kernels.refine_stack import (
    build_refine_plan,
    fast_refine,
)
from realtime_stereo_matcher_tpu.models.stereo_net import (
    FeatureEncoder,
    MobileStereoNet,
    MobileStereoNetV2,
    _coarse_disparity,
    _full_res_nearest,
)
from realtime_stereo_matcher_tpu.models.layers import normalize_images


def _alignment_pad(h: int, w: int, down: int) -> tuple[int, int]:
    """Zero-pad amounts so every kernel level is lane-fold/tile friendly.

    W must make the *volume-level* flat width (W / 2^down / 4) a multiple of
    8 lanes-tiles => W % (32 << down) == 0.  H must give every refine-level
    height a tile divisor in [8, 24] (VMEM-sized double buffers).
    """
    w_pad = (-w) % (32 << down)
    step = 1 << down
    hp = ((h + step - 1) // step) * step

    def ok(x):
        return all(
            any(lvl % t == 0 for t in range(8, 25))
            for lvl in (x >> (down - 1 - i) for i in range(down)))

    while not ok(hp):
        hp += step
    return hp - h, w_pad


def make_fast_forward(model, variables, *, dtype=jnp.bfloat16):
    """Build the kernel-path forward for a v1/v2 model + trained variables."""
    if isinstance(model, MobileStereoNetV2):
        warp_guidance = True
    elif isinstance(model, MobileStereoNet):
        warp_guidance = False
    else:
        raise NotImplementedError(
            f"fast inference path supports v1/v2, not {type(model).__name__}")

    params = variables["params"]
    batch_stats = variables["batch_stats"]
    down = model.down_factor
    align = 2 ** down
    vol_disp = (model.max_disp + 1) // align

    plans = [
        build_refine_plan(params[f"RefineNet_{i}"],
                          batch_stats[f"RefineNet_{i}"],
                          model.refine_dilates)
        for i in range(down)
    ]

    encoder = FeatureEncoder(model.hidden_dim, down, dtype=dtype)
    enc_vars = {"params": params["FeatureEncoder_0"],
                "batch_stats": batch_stats["FeatureEncoder_0"]}
    cf_plan = build_cost_filter_plan(params["CostFilter3D_0"],
                                     batch_stats["CostFilter3D_0"])

    def forward(left_img, right_img):
        left = normalize_images(left_img, dtype)
        right = normalize_images(right_img, dtype)
        orig_hw = left.shape[1:3]
        h_pad, w_pad = _alignment_pad(orig_hw[0], orig_hw[1], down)
        pads = ((0, 0), (0, h_pad), (0, w_pad), (0, 0))
        left = jnp.pad(left, pads)
        right = jnp.pad(right, pads)

        # one batch-2 encoder pass instead of two batch-1 passes (~1ms at 720p)
        feats = encoder.apply(
            enc_vars, jnp.concatenate([left, right], axis=0), False)
        lf, rf = feats[:1], feats[1:]
        x = _coarse_disparity(
            lf, rf, vol_disp,
            lambda vol, train: fast_cost_filter(vol, cf_plan, dtype=dtype),
            False).astype(jnp.float32)

        multi_scale = []
        out_hw = left.shape[1:3]
        for i in range(down):
            x = fast_refine(x, left, right if warp_guidance else None,
                            plans[i], warp_guidance=warp_guidance, dtype=dtype)
            multi_scale.append(_full_res_nearest(x, out_hw, orig_hw))
        return [-1.0 * m for m in multi_scale]

    return forward
