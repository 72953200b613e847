#!/usr/bin/env python
"""Stage-wise latency breakdown of MobileStereoNetV3 720p fast inference.

Times the extractor (batch-2 XLA U-Net), the coarse volume+filter path, and
each refine level in isolation to locate the 47.3 ms (BASELINE.md round 2).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from realtime_stereo_matcher_tpu.models import build_model
    from realtime_stereo_matcher_tpu.models.fast_infer import (
        _alignment_pad,
        make_fast_forward,
    )
    from realtime_stereo_matcher_tpu.models.stereo_net import (
        UNetFeatureExtractor,
    )
    from realtime_stereo_matcher_tpu.ops import warp_by_flow_map_matmul
    from realtime_stereo_matcher_tpu.utils.timing import measure_latency

    h, w = 720, 1280
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    model = build_model({"type": "MobileStereoNetV3"})
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), left, right, train=False))()

    fwd = jax.jit(make_fast_forward(model, variables))
    out = fwd(left, right)
    jax.block_until_ready(out)

    def chain(fn, x, k=16):
        step = jax.jit(lambda c: fn(c))
        return measure_latency(step, x, k=k)

    # whole fast path
    def whole(c):
        o = fwd(c, right)[-1]
        return c + jnp.pad(o, ((0, 0), (0, 0), (0, 0), (0, 2))) * 1e-12

    print(f"whole fast path      : {chain(whole, left) * 1e3:7.2f} ms",
          flush=True)

    # extractor alone (batch 2, padded shape)
    hp, wp = _alignment_pad(h, w, model.down_factor)
    x2 = jnp.zeros((2, h + hp, w + wp, 3), dtype)
    extractor = UNetFeatureExtractor(
        hidden_dims=(model.hidden_dim,) * (model.down_factor + 1), dtype=dtype)
    evars = {"params": variables["params"]["UNetFeatureExtractor_0"]}

    def ext(c):
        f = extractor.apply(evars, c, False)[-1]
        return c + f[:, :, :, :3] * jnp.asarray(1e-12, dtype)

    print(f"U-Net extractor (b2) : {chain(ext, x2) * 1e3:7.2f} ms",
          flush=True)

    # full-res matmul warp (level-3 refine guidance)
    img32 = jnp.zeros((1, h + hp, w + wp, 32), dtype)
    disp = jnp.asarray(
        rng.uniform(0, 150, (1, h + hp, w + wp, 1)).astype(np.float32))

    def wrp(c):
        o = warp_by_flow_map_matmul(c, disp)
        return c + o * jnp.asarray(1e-12, dtype)

    print(f"matmul warp full res : {chain(wrp, img32) * 1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
