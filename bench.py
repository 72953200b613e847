#!/usr/bin/env python
"""Benchmark harness: flagship 720p inference FPS on one TPU chip.

Prints ONE JSON line:
    {"metric": "mobile_stereo_net_720p_fps", "value": N, "unit": "frames/s",
     "vs_baseline": N / 60}

Baseline: BASELINE.md north star of >= 60 FPS/chip at 720p for
MobileStereoNet inference (bf16 compute, batch 1, full 1280x720 input,
eval mode, final head only).

Timing methodology: this environment's TPU is reached through a relay where
``block_until_ready`` acks before device execution completes, so naive
wall-clock timing is bogus (it "measures" >50 PFLOP/s).  We instead dispatch
a K-long *chained* forward (each call's input depends on the previous
output, so iterations cannot overlap or be elided), force completion with a
scalar device_get, and report (t_K - t_1) / (K - 1).  Validated against the
MXU roofline: an 8192^3 bf16 matmul chain measures ~174 TFLOP/s on v5e
(~197 peak).
"""

import json
import time

import numpy as np

from realtime_stereo_matcher_tpu.utils.timing import (  # shared methodology
    measure_latency,
    timed_chain,  # noqa: F401  (re-exported for existing callers/tests)
)

BASELINE_FPS = 60.0


def main():
    import jax
    import jax.numpy as jnp

    from realtime_stereo_matcher_tpu.models import build_model

    model = build_model({"type": "MobileStereoNet", "parameters": {}})
    rng = np.random.default_rng(0)
    h, w = 720, 1280
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left[:, :64, :64],
                           right[:, :64, :64], train=True)

    # flagship path: Pallas kernel inference (models/fast_infer.py); fall
    # back to the plain Flax/XLA forward if it is unavailable on this backend
    try:
        from realtime_stereo_matcher_tpu.models.fast_infer import (
            make_fast_forward,
        )

        fast = make_fast_forward(model, variables, dtype=jnp.bfloat16)

        def forward(l, r):
            return fast(l, r)[-1]
    except Exception:  # pragma: no cover - safety net for the driver
        bf16 = build_model({"type": "MobileStereoNet", "parameters": {}},
                           dtype=jnp.bfloat16)

        def forward(l, r):
            return bf16.apply(variables, l, r, train=False)[-1]

    @jax.jit
    def step(carry):
        l, r = carry
        out = forward(l, r)
        # feed the output back so iterations are data-dependent (no overlap,
        # no elision); the epsilon keeps numerics unchanged
        l2 = l + out * jnp.asarray(1e-12, l.dtype)
        return (l2, r)

    t0 = time.time()
    latency = measure_latency(step, (left, right), k=32)
    bench_s = time.time() - t0
    fps = 1.0 / latency

    print(json.dumps({
        "metric": "mobile_stereo_net_720p_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "latency_ms": round(latency * 1000, 3),
        "bench_wall_s": round(bench_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
