#!/usr/bin/env python
"""Benchmark harness: flagship 720p inference FPS on one TPU chip.

Prints ONE JSON line:
    {"metric": "mobile_stereo_net_720p_fps", "value": N, "unit": "frames/s",
     "vs_baseline": N / 60, "path": "kernel" | "xla-fallback", ...}

Baseline: BASELINE.md north star of >= 60 FPS/chip at 720p for
MobileStereoNet inference (bf16 compute, batch 1, full 1280x720 input,
eval mode, final head only).

Which path ran is part of the record.  Round 4's official number was 3.1x
wrong because a bare ``except Exception`` silently benched the plain XLA
forward after a transient kernel-path construction failure (BENCH_r04.json:
27.38 FPS vs the 86 FPS the committed code actually runs at).  This harness
therefore (a) retries kernel-path construction, (b) records ``path`` and, on
fallback, the stringified exceptions in the emitted JSON, (c) prints the
failure tracebacks to stderr, and (d) exits nonzero with ``"degraded": true``
when the kernel path was expected but unavailable, so a degraded run can
never be mistaken for the real measurement.

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
import sys
import time
import traceback

import numpy as np

from realtime_stereo_matcher_tpu.utils.timing import (  # shared methodology
    measure_latency,
    timed_chain,  # noqa: F401  (re-exported for existing callers/tests)
)

BASELINE_FPS = 60.0
KERNEL_PATH_ATTEMPTS = 2  # one retry: round-4's failure was a transient


def build_forward(model, variables, *, attempts=KERNEL_PATH_ATTEMPTS,
                  _inject_failure=None):
    """Build the flagship forward; NEVER silently substitute a slower path.

    Returns ``(forward, info)`` where ``info["path"]`` is ``"kernel"`` or
    ``"xla-fallback"``.  Kernel-path construction is retried ``attempts``
    times (transient relay hiccups during build-time weight fetches were the
    round-4 failure mode); every failure's traceback goes to stderr and its
    stringified exception into ``info["kernel_errors"]``.  On fallback,
    ``info["degraded"]`` is True — callers must surface it.

    ``_inject_failure``: test hook — an exception instance raised in place of
    kernel-path construction on every attempt (tests/test_bench_path.py).
    """
    import jax.numpy as jnp

    from realtime_stereo_matcher_tpu.models import build_model
    from realtime_stereo_matcher_tpu.models.fast_infer import make_fast_forward

    kernel_errors = []
    for attempt in range(attempts):
        try:
            if _inject_failure is not None:
                raise _inject_failure
            fast = make_fast_forward(model, variables, dtype=jnp.bfloat16)

            def forward(l, r, _fast=fast):
                return _fast(l, r)[-1]

            info = {"path": "kernel", "degraded": False,
                    "kernel_attempts": attempt + 1}
            if kernel_errors:
                info["kernel_errors"] = kernel_errors
            return forward, info
        except Exception as exc:  # noqa: BLE001 — recorded + re-surfaced
            kernel_errors.append(f"{type(exc).__name__}: {exc}")
            print(f"bench.py: kernel-path construction FAILED "
                  f"(attempt {attempt + 1}/{attempts}):", file=sys.stderr)
            traceback.print_exc()

    print("bench.py: all kernel-path attempts failed; benching the plain "
          "XLA forward — this measurement is DEGRADED and does not reflect "
          "the production path.", file=sys.stderr)
    bf16 = build_model({"type": "MobileStereoNet", "parameters": {}},
                       dtype=jnp.bfloat16)

    def forward(l, r):
        return bf16.apply(variables, l, r, train=False)[-1]

    return forward, {"path": "xla-fallback", "degraded": True,
                     "kernel_attempts": attempts,
                     "kernel_errors": kernel_errors}


def main(argv=()):
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

    forward, info = build_forward(model, variables)

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

    record = {
        "metric": "mobile_stereo_net_720p_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "latency_ms": round(latency * 1000, 3),
        "bench_wall_s": round(bench_s, 1),
        "device": str(jax.devices()[0]),
    }
    record.update(info)
    print(json.dumps(record))
    if info["degraded"]:
        # a degraded number must never pass as the real one
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
