"""Kernel-accelerated inference path for MobileStereoNet v1/v2/v3.

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

Constraints: batch 1 (latency path), eval mode.  Inputs of any size are
zero-padded to lane-tile-friendly shapes and cropped back (exactly like the
models' own /2^k padding).  For v3 the 65-channel refine entry conv stays in
XLA; the remaining 13 convs per level run in the kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from realtime_stereo_matcher_tpu.kernels.cost_filter3d import (
    build_cost_filter_plan,
    fast_cost_filter,
)
from realtime_stereo_matcher_tpu.kernels.encoder import (
    build_encoder_plan,
    fast_encoder,
)
from realtime_stereo_matcher_tpu.kernels.refine_stack import (
    build_refine_plan,
    fast_refine,
)
from realtime_stereo_matcher_tpu.models.stereo_net import (
    FeatureEncoder,
    MobileStereoNet,
    MobileStereoNetV2,
    MobileStereoNetV3,
    UNetFeatureExtractor,
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
    """Build the kernel-path forward for a v1/v2/v3 model + variables."""
    if isinstance(model, MobileStereoNetV3):
        variant = "v3"
    elif isinstance(model, MobileStereoNetV2):
        variant = "v2"
    elif isinstance(model, MobileStereoNet):
        variant = "v1"
    else:
        raise NotImplementedError(
            f"fast inference path supports v1/v2/v3, not {type(model).__name__}")
    warp_guidance = variant in ("v2", "v3")

    params = variables["params"]
    batch_stats = variables["batch_stats"]
    down = model.down_factor
    align = 2 ** down
    vol_disp = (model.max_disp + 1) // align

    # v3's refine input layout is disp(1) ‖ l_fmap(32) ‖ r_fmap(32) = 65ch
    # (models/stereo_net.py RefineNet wide-guidance concat) -> opt in to the
    # kernel entry-conv split; v1/v2 use the 32-ch lane fold directly
    entry_ch = 1 + 2 * model.hidden_dim if variant == "v3" else 32
    plans = [
        build_refine_plan(params[f"RefineNet_{i}"],
                          batch_stats[f"RefineNet_{i}"],
                          model.refine_dilates, entry_channels=entry_ch,
                          entry_split=(variant == "v3"))
        for i in range(down)
    ]

    enc_plan = None
    unet_plan = None
    if variant == "v3":
        # round 4: the flat-lane U-Net (kernels/unet.py fast_unet_flat)
        # replaces the batch-2 XLA extractor.  Round 3's first kernelized
        # attempt (fast_unet) lost to XLA glue between levels (stem, k4s2,
        # up-projection interleave, 1x1 skip-mix: 1.4-3.5 ms of NHWC
        # relayout each at 720p); the flat variant expresses that glue as
        # full-lane 128x128 block matmuls on the folded layout, so only the
        # stem and the 1/8-res bottleneck remain in NHWC.
        extractor = UNetFeatureExtractor(
            hidden_dims=(model.hidden_dim,) * (down + 1), dtype=dtype)
        enc_vars = {"params": params["UNetFeatureExtractor_0"],
                    "batch_stats": batch_stats.get("UNetFeatureExtractor_0",
                                                   {})}
        if model.hidden_dim == 32 and down == 3:
            from realtime_stereo_matcher_tpu.kernels.unet import (
                build_unet_flat_plan,
            )

            unet_plan = build_unet_flat_plan(
                params["UNetFeatureExtractor_0"], down)
    else:
        extractor = FeatureEncoder(model.hidden_dim, down, dtype=dtype)
        enc_vars = {"params": params["FeatureEncoder_0"],
                    "batch_stats": batch_stats["FeatureEncoder_0"]}
        if model.hidden_dim == 32:
            # v1/v2 encoder runs on the fused stride-2/split-window kernels
            enc_plan = build_encoder_plan(params["FeatureEncoder_0"],
                                          batch_stats["FeatureEncoder_0"],
                                          down_factor=down)
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

        if enc_plan is not None:
            lf = fast_encoder(left, enc_plan, dtype=dtype)
            rf = fast_encoder(right, enc_plan, dtype=dtype)
        elif unet_plan is not None:
            from realtime_stereo_matcher_tpu.kernels.unet import (
                fast_unet_flat_pair,
            )

            l_py, r_py = fast_unet_flat_pair(left, right, unet_plan,
                                             dtype=dtype)
            lf, rf = l_py[0], r_py[0]
        else:
            # one batch-2 extractor pass instead of two batch-1 passes
            feats = extractor.apply(
                enc_vars, jnp.concatenate([left, right], axis=0), False)
            if variant == "v3":
                l_py = [f[:1] for f in feats]
                r_py = [f[1:] for f in feats]
                lf, rf = l_py[0], r_py[0]
            else:
                lf, rf = feats[:1], feats[1:]

        x = _coarse_disparity(
            lf, rf, vol_disp,
            lambda vol, train: fast_cost_filter(vol, cf_plan, dtype=dtype),
            False).astype(jnp.float32)

        multi_scale = []
        out_hw = left.shape[1:3]
        for i in range(down):
            if variant == "v3":
                l_g, r_g = l_py[i + 1], r_py[i + 1]
            else:
                l_g = left
                r_g = right if warp_guidance else None
            ms = (model.max_disp >> (down - 1 - i)) + 16
            x = fast_refine(x, l_g, r_g, plans[i],
                            warp_guidance=warp_guidance, dtype=dtype,
                            max_shift=ms)
            multi_scale.append(_full_res_nearest(x, out_hw, orig_hw))
        return [-1.0 * m for m in multi_scale]

    return forward
