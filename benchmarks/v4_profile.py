#!/usr/bin/env python
"""Stage-wise fwd+bwd latency breakdown of the MobileStereoNetV4 train step.

Times each architectural stage (feature extraction, volume, aggregation,
heads) as an isolated jitted value_and_grad at the reference train config
(batch 6, 240x320, bf16) to locate where the 178 ms XLA step goes.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from realtime_stereo_matcher_tpu.models.stereo_net_v4 import (
        Classif,
        FeatureExtraction,
        Hourglass2D,
        InterweaveVolume,
        MobileStereoNetV4,
        PreConv11,
    )
    from realtime_stereo_matcher_tpu.utils.timing import measure_latency

    b, h, w = 6, 240, 320
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    img = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32))
    h4, w4 = h // 4, w // 4

    def bench(name, module, *args, train=True):
        vars_ = jax.jit(lambda *a: module.init(key, *a, train=True))(*args)

        def fwd(params, *a):
            out, _ = module.apply(
                {"params": params, "batch_stats": vars_["batch_stats"]},
                *a, train=train, mutable=["batch_stats"])
            if isinstance(out, (list, tuple)):
                return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        # chain on the params (tiny SGD step) so iterations are dependent
        step = jax.jit(lambda p: jax.tree_util.tree_map(
            lambda x, g: x - 1e-30 * g.astype(x.dtype), p,
            jax.grad(fwd)(p, *args)))
        lat = measure_latency(step, vars_["params"], k=8, repeats=3)
        print(f"{name:30s} {lat * 1e3:7.2f} ms", flush=True)
        return vars_

    # stage 1: feature extraction (two passes in the model)
    fe = FeatureExtraction(dtype=dtype)
    x = (jnp.asarray(img, jnp.float32) / 127.5 - 1.0).astype(dtype)
    bench("FeatureExtraction (1 pass)", fe, x)

    # stage 2: preconv
    feat320 = jnp.asarray(
        rng.standard_normal((b, h4, w4, 320)).astype(np.float32)).astype(dtype)
    bench("PreConv11 (1 pass)", PreConv11(dtype=dtype), feat320)

    # stage 3: interweave volume (48 shifts)
    f32ch = jnp.asarray(
        rng.standard_normal((b, h4, w4, 32)).astype(np.float32)).astype(dtype)
    bench("InterweaveVolume", InterweaveVolume(dtype=dtype), f32ch, f32ch)

    # stage 4: one hourglass (x3 in the model)
    cost48 = jnp.asarray(
        rng.standard_normal((b, h4, w4, 48)).astype(np.float32)).astype(dtype)
    bench("Hourglass2D (1 of 3)", Hourglass2D(48, dtype=dtype), cost48)

    # stage 5: classif head (x4 in train) -- trilinear soft-argmin timed in situ
    bench("Classif (1 of 4)", Classif(48, dtype=dtype), cost48)

    # full model for reference
    model = MobileStereoNetV4(dtype=dtype)
    bench("FULL forward+backward", model, img, img)


def extra_stages():
    """dres/head/batched-extractor breakdowns (run with 'extra' arg)."""
    from realtime_stereo_matcher_tpu.models.stereo_net_v4 import (
        FeatureExtraction,
    )
    from realtime_stereo_matcher_tpu.models.layers import MobileV2Residual
    from realtime_stereo_matcher_tpu.ops import soft_argmin_trilinear
    from realtime_stereo_matcher_tpu.utils.timing import measure_latency
    import flax.linen as nn

    b, h, w = 6, 240, 320
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    h4, w4 = h // 4, w // 4

    class Dres(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            er = 3
            c0 = MobileV2Residual(48, 48, 1, er, dtype=dtype)(x, train)
            c0 = nn.relu(c0)
            c0 = MobileV2Residual(48, 48, 1, er, dtype=dtype)(c0, train)
            cost0 = nn.relu(c0)
            d1 = MobileV2Residual(48, 48, 1, er, dtype=dtype)(cost0, train)
            d1 = nn.relu(d1)
            d1 = MobileV2Residual(48, 48, 1, er, dtype=dtype)(d1, train)
            return d1 + cost0

    cost48 = jnp.asarray(
        rng.standard_normal((b, h4, w4, 48)).astype(np.float32)).astype(dtype)

    mod = Dres()
    vars_ = jax.jit(lambda a: mod.init(key, a, train=True))(cost48)

    def fwd(params, a):
        out, _ = mod.apply({"params": params,
                            "batch_stats": vars_["batch_stats"]},
                           a, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    step = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda x, g: x - 1e-30 * g.astype(x.dtype), p,
        jax.grad(fwd)(p, cost48)))
    print(f"{'dres0+dres1':30s} {measure_latency(step, vars_['params'], k=8) * 1e3:7.2f} ms",
          flush=True)

    # trilinear soft-argmin head fwd+bwd (x4 in train)
    def head_loss(c):
        pred = soft_argmin_trilinear(
            jnp.transpose(c, (0, 3, 1, 2)), 192, (h, w))
        return jnp.sum(pred ** 2)

    hstep = jax.jit(lambda c: c - (1e-30 * jax.grad(head_loss)(c)).astype(c.dtype))
    print(f"{'trilinear head (1 of 4)':30s} {measure_latency(hstep, cost48, k=8) * 1e3:7.2f} ms",
          flush=True)

    # extractor as ONE batch-12 pass (vs 2 x batch-6)
    fe = FeatureExtraction(dtype=dtype)
    x12 = jnp.asarray(rng.uniform(-1, 1, (2 * b, h, w, 3)).astype(np.float32)
                      ).astype(dtype)
    fvars = jax.jit(lambda a: fe.init(key, a, train=True))(x12)

    def fe_loss(params, a):
        out, _ = fe.apply({"params": params,
                           "batch_stats": fvars["batch_stats"]},
                          a, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    festep = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda x, g: x - 1e-30 * g.astype(x.dtype), p,
        jax.grad(fe_loss)(p, x12)))
    print(f"{'FeatureExtraction (batch 12)':30s} {measure_latency(festep, fvars['params'], k=8) * 1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "extra":
        extra_stages()
    else:
        main()
