#!/usr/bin/env python
"""Cumulative-prefix latency of the v2 720p fast path (kernel path)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from realtime_stereo_matcher_tpu.kernels.cost_filter3d import (
        build_cost_filter_plan, fast_cost_filter)
    from realtime_stereo_matcher_tpu.kernels.encoder import (
        build_encoder_plan, fast_encoder)
    from realtime_stereo_matcher_tpu.kernels.refine_stack import (
        build_refine_plan, fast_refine)
    from realtime_stereo_matcher_tpu.models import build_model
    from realtime_stereo_matcher_tpu.models.fast_infer import _alignment_pad
    from realtime_stereo_matcher_tpu.models.layers import normalize_images
    from realtime_stereo_matcher_tpu.models.stereo_net import (
        _coarse_disparity, _full_res_nearest)
    from realtime_stereo_matcher_tpu.ops import (
        resize_bilinear, warp_by_flow_map_banded)
    from realtime_stereo_matcher_tpu.utils.timing import measure_latency

    h, w = 720, 1280
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    model = build_model({"type": "MobileStereoNetV2"}, dtype=dtype)
    down = model.down_factor
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), left, right, train=False))()
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    enc_plan = build_encoder_plan(params["FeatureEncoder_0"],
                                  batch_stats["FeatureEncoder_0"],
                                  down_factor=down)
    cf_plan = build_cost_filter_plan(params["CostFilter3D_0"],
                                     batch_stats["CostFilter3D_0"])
    plans = [build_refine_plan(params[f"RefineNet_{i}"],
                               batch_stats[f"RefineNet_{i}"],
                               model.refine_dilates, entry_channels=32)
             for i in range(down)]
    vol_disp = (model.max_disp + 1) // (2 ** down)

    def forward_prefix(left_img, right_img, stop, with_warp=True):
        lft = normalize_images(left_img, dtype)
        rgt = normalize_images(right_img, dtype)
        orig_hw = lft.shape[1:3]
        h_pad, w_pad = _alignment_pad(orig_hw[0], orig_hw[1], down)
        pads = ((0, 0), (0, h_pad), (0, w_pad), (0, 0))
        lft = jnp.pad(lft, pads)
        rgt = jnp.pad(rgt, pads)
        lf = fast_encoder(lft, enc_plan, dtype=dtype)
        rf = fast_encoder(rgt, enc_plan, dtype=dtype)
        if stop == 0:
            return lf + rf
        x = _coarse_disparity(
            lf, rf, vol_disp,
            lambda vol, train: fast_cost_filter(vol, cf_plan, dtype=dtype),
            False).astype(jnp.float32)
        if stop == 1:
            return x
        out_hw = lft.shape[1:3]
        for i in range(down):
            ms = (model.max_disp >> (down - 1 - i)) + 16
            x = fast_refine(x, lft, rgt if with_warp else None, plans[i],
                            warp_guidance=with_warp, dtype=dtype,
                            max_shift=ms)
            if stop == 2 + i:
                return x
        return -1.0 * _full_res_nearest(x, out_hw, orig_hw)

    names = ["encoders", "+coarse", "+refine0", "+refine1", "+refine2",
             "full"]
    for stop, name in enumerate(names):
        def step(c, stop=stop):
            l, r = c
            out = forward_prefix(l, r, stop)
            return (l + out.sum().astype(l.dtype) * 1e-20, r)
        lat = measure_latency(jax.jit(step), (left, right), k=16)
        print(f"{name:12s}: {lat * 1e3:7.2f} ms", flush=True)

    # v1-style (no warp guidance) for comparison
    def step_nw(c):
        l, r = c
        out = forward_prefix(l, r, 99, with_warp=False)
        return (l + out.sum().astype(l.dtype) * 1e-20, r)
    lat = measure_latency(jax.jit(step_nw), (left, right), k=16)
    print(f"{'full, no-warp':12s}: {lat * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
