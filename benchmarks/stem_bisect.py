#!/usr/bin/env python
"""Bisect which composed stage triggers the stem+downpath blow-up."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from realtime_stereo_matcher_tpu.kernels import conv3x3 as k3
    from realtime_stereo_matcher_tpu.kernels.unet import (
        _conv, _run_kconvs_flat, _to_flat_phase2, build_unet_flat_plan)
    from realtime_stereo_matcher_tpu.models import build_model
    from realtime_stereo_matcher_tpu.models.fast_infer import _alignment_pad
    from realtime_stereo_matcher_tpu.utils.timing import measure_latency

    h, w = 720, 1280
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    model = build_model({"type": "MobileStereoNetV3"}, dtype=dtype)
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), left, left + 1.0, train=False))()
    plan = build_unet_flat_plan(
        variables["params"]["UNetFeatureExtractor_0"], 3)
    base = plan.base

    h_pad, w_pad = _alignment_pad(h, w, 3)
    l0 = jnp.pad(left / 127.5 - 1,
                 ((0, 0), (0, h_pad), (0, w_pad), (0, 0))).astype(dtype)
    r0 = l0 * 0.7 + 0.01
    x2 = jnp.concatenate([l0, r0], axis=0)

    def t(name, fn, carry, k=16):
        lat = measure_latency(jax.jit(fn), carry, k=k)
        print(f"{name:40s}: {lat * 1e3:7.2f} ms", flush=True)

    def pipe(c, stop):
        stems = _conv(c, base.conv0_w, base.conv0_b,
                      padding=((1, 1), (1, 1)))
        acc = None
        for v in range(2):
            y = _to_flat_phase2(stems[v:v + 1], 32)
            if stop >= 1:
                y = k3.fused_conv4x4_s2_flat(y, *plan.k4_blocks[0], relu=0.2)
            if stop >= 2:
                y, _ = _run_kconvs_flat(y, base.down[0][2])
            if stop >= 3:
                y = k3.fused_conv4x4_s2_flat(y, *plan.k4_blocks[1], relu=0.2)
            if stop >= 4:
                y, _ = _run_kconvs_flat(y, base.down[1][2])
            if stop >= 5:
                y = k3.fused_conv4x4_s2_flat(y, *plan.k4_blocks[2], relu=0.2)
            if stop >= 6:
                y, _ = _run_kconvs_flat(y, plan.bott)
            acc = y if acc is None else acc + y
        return c + acc.sum().astype(c.dtype) * 1e-20

    for stop, name in enumerate(
            ["stem+fold", "+k4s2/2", "+conv/2", "+k4s2/4", "+conv/4",
             "+k4s2/8", "+bott"]):
        t(name, lambda c, stop=stop: pipe(c, stop), x2)


if __name__ == "__main__":
    main()
