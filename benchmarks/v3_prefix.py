#!/usr/bin/env python
"""Cumulative-prefix latency of the real v3 720p fast path.

Rebuilds make_fast_forward's v3 pipeline and times jitted prefixes of it
(extractor; +coarse; +refine0; +refine1; +refine2; +outputs), so glue between
the stage-isolation numbers (normalize/pad, resizes, upsamples) is attributed.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from realtime_stereo_matcher_tpu.kernels.cost_filter3d import (
        build_cost_filter_plan, fast_cost_filter)
    from realtime_stereo_matcher_tpu.kernels.refine_stack import (
        build_refine_plan, fast_refine)
    from realtime_stereo_matcher_tpu.kernels.unet import (
        build_unet_flat_plan, fast_unet_flat_pair)
    from realtime_stereo_matcher_tpu.models import build_model
    from realtime_stereo_matcher_tpu.models.fast_infer import _alignment_pad
    from realtime_stereo_matcher_tpu.models.layers import normalize_images
    from realtime_stereo_matcher_tpu.models.stereo_net import (
        _coarse_disparity, _full_res_nearest)
    from realtime_stereo_matcher_tpu.utils.timing import measure_latency

    h, w = 720, 1280
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    model = build_model({"type": "MobileStereoNetV3"}, dtype=dtype)
    down = model.down_factor
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), left, right, train=False))()
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    unet_plan = build_unet_flat_plan(params["UNetFeatureExtractor_0"], down)
    cf_plan = build_cost_filter_plan(params["CostFilter3D_0"],
                                     batch_stats["CostFilter3D_0"])
    entry_ch = 1 + 2 * model.hidden_dim
    plans = [build_refine_plan(params[f"RefineNet_{i}"],
                               batch_stats[f"RefineNet_{i}"],
                               model.refine_dilates, entry_channels=entry_ch,
                               entry_split=True)
             for i in range(down)]
    vol_disp = (model.max_disp + 1) // (2 ** down)

    def forward_prefix(left_img, right_img, stop):
        lft = normalize_images(left_img, dtype)
        rgt = normalize_images(right_img, dtype)
        orig_hw = lft.shape[1:3]
        h_pad, w_pad = _alignment_pad(orig_hw[0], orig_hw[1], down)
        pads = ((0, 0), (0, h_pad), (0, w_pad), (0, 0))
        lft = jnp.pad(lft, pads)
        rgt = jnp.pad(rgt, pads)
        l_py, r_py = fast_unet_flat_pair(lft, rgt, unet_plan, dtype=dtype)
        if stop == 0:
            return l_py[0]
        x = _coarse_disparity(
            l_py[0], r_py[0], vol_disp,
            lambda vol, train: fast_cost_filter(vol, cf_plan, dtype=dtype),
            False).astype(jnp.float32)
        if stop == 1:
            return x
        multi_scale = []
        out_hw = lft.shape[1:3]
        for i in range(down):
            ms = (model.max_disp >> (down - 1 - i)) + 16
            x = fast_refine(x, l_py[i + 1], r_py[i + 1], plans[i],
                            warp_guidance=True, dtype=dtype, max_shift=ms)
            multi_scale.append(_full_res_nearest(x, out_hw, orig_hw))
            if stop == 2 + i:
                return x
        return -1.0 * multi_scale[-1]

    names = ["extractor", "+coarse", "+refine0", "+refine1", "+refine2",
             "full"]
    for stop, name in enumerate(names):
        def step(c, stop=stop):
            l, r = c
            out = forward_prefix(l, r, stop)
            return (l + out.sum().astype(l.dtype) * 1e-20, r)
        lat = measure_latency(jax.jit(step), (left, right), k=16)
        print(f"{name:12s}: {lat * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
