"""Model capacity + cost profiling (reference tools/profiler.py:11-26).

The reference reports MACs/FLOPs/params via ``thop.profile`` and fvcore's
``FlopCountAnalysis`` on a torch module.  The TPU-native equivalent derives
the same numbers from the XLA compiler itself: ``jit(...).lower().compile()
.cost_analysis()`` returns the *post-optimization* flop count for the exact
program that will run on the chip (so fusion/layout choices are reflected),
plus bytes accessed -- which the torch profilers cannot see.

Also exposes a trace helper around ``jax.profiler`` as the tracing subsystem
(the reference has none, SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def count_parameters(params) -> int:
    """Total scalar parameter count of a pytree of arrays."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def get_model_capacity(model, variables, left, right, *, verbose: bool = True):
    """(flops, params) of one eval-mode forward at the given input shapes.

    Mirrors reference tools/profiler.py:11-26 (thop MACs*2 == FLOPs here;
    XLA reports FLOPs directly).  ``left``/``right`` may be arrays or
    ShapeDtypeStructs -- only shapes/dtypes are used.
    """

    def fwd(variables, left, right):
        return model.apply(variables, left, right, train=False)[-1]

    lowered = jax.jit(fwd).lower(variables, left, right)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jaxlib returns [dict]
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))
    params = count_parameters(variables.get("params", variables))
    if verbose:
        print(
            f"Model FLOPs: {flops / 1e9:.3f} GFLOPs | "
            f"HBM bytes: {bytes_accessed / 1e6:.1f} MB | "
            f"params: {params / 1e6:.3f} M."
        )
    return flops, params


def cost_analysis(fn, *args, **kwargs) -> dict[str, Any]:
    """Raw XLA cost analysis dict for an arbitrary jittable callable."""
    cost = jax.jit(fn).lower(*args, **kwargs).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return dict(cost)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` device trace viewable in TensorBoard/XProf.

    The TPU-native analog of the tracing subsystem the reference lacks
    (SURVEY.md §5: its only profiling is wall-clock FPS + thop).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def shape_struct(shape, dtype=jnp.float32) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(tuple(shape), dtype)
