"""Honest device-latency measurement through async/relayed runtimes.

This environment reaches the TPU through a relay where ``block_until_ready``
acks before device execution completes, so naive wall-clock timing around a
single dispatch is bogus (it "measures" >50 PFLOP/s).  The fix: dispatch a
K-long *chained* computation (each call's input depends on the previous
output, so iterations cannot overlap or be elided), force completion with a
scalar device_get, and report (t_K - t_1) / (K - 1).  Validated against the
MXU roofline: an 8192^3 bf16 matmul chain measures ~174 TFLOP/s on v5e
(~197 peak).

Used by bench.py and eval/validators.py (the reference times each forward
naively, evaluate_stereo.py:125-127 -- accurate on local CUDA, wrong here).
"""

from __future__ import annotations

import time


def timed_chain(jitted_step, init_carry, k: int, repeats: int = 3) -> float:
    """Min wall time of K dependent dispatches ending in a scalar fetch.

    ``jitted_step(carry) -> carry`` must make each call's input depend on the
    previous call's output; async dispatch pipelines the K executions and the
    final scalar device_get forces completion of the whole chain.  (A
    lax.scan formulation measures identically but recompiles the model inside
    the loop, costing ~10x the compile time on this toolchain.)
    """
    import jax

    carry = jitted_step(init_carry)  # compile + warm
    _ = float(jax.tree_util.tree_leaves(carry)[0].ravel()[0])
    ts = []
    for _ in range(repeats):
        carry = init_carry
        t0 = time.time()
        for _ in range(k):
            carry = jitted_step(carry)
        _ = float(jax.tree_util.tree_leaves(carry)[0].ravel()[0])
        ts.append(time.time() - t0)
    return min(ts)


def measure_latency(jitted_step, init_carry, k: int = 32,
                    repeats: int = 3) -> float:
    """Per-iteration device latency in seconds via delta-K chained timing.

    If the delta is swamped by fetch-overhead jitter (short chains on fast
    models), fall back to the pessimistic whole-chain mean ``t_k / k`` rather
    than reporting a clamped nonsense number."""
    t1 = timed_chain(jitted_step, init_carry, 1, repeats)
    tk = timed_chain(jitted_step, init_carry, k, repeats)
    delta = (tk - t1) / (k - 1)
    if delta <= 0:
        return tk / k
    return delta


def chain_forward_latency(forward, left, right, k: int = 24,
                          repeats: int = 3) -> float:
    """Chained latency of ``forward(left, right) -> [maps]`` at one shape.

    Feeds an epsilon of the final map back into the left image so successive
    iterations are data-dependent (no overlap, no elision) without changing
    numerics.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(carry):
        l, r = carry
        out = forward(l, r)[-1]
        pad_h = l.shape[1] - out.shape[1]
        pad_w = l.shape[2] - out.shape[2]
        if pad_h or pad_w:
            out = jnp.pad(out, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        l2 = l + out * jnp.asarray(1e-12, l.dtype)
        return (l2, r)

    return measure_latency(step, (left, right), k=k, repeats=repeats)
