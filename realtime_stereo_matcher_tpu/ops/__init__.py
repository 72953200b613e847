"""Functional op library (pure JAX, NHWC, jit/vmap/pjit-friendly)."""

from realtime_stereo_matcher_tpu.ops.cost_volume import (
    concat_cost_volume,
    correlation_cost_volume,
    difference_cost_volume,
    groupwise_cost_volume,
    interweave_volume,
    shift_stack,
    soft_argmin,
    soft_argmin_trilinear,
)
from realtime_stereo_matcher_tpu.ops.padding import InputPadder, pad_to_multiple
from realtime_stereo_matcher_tpu.ops.sampling import (
    grid_sample_2d,
    resize_bilinear,
    resize_nearest,
    resize_trilinear,
    warp_by_flow_map,
    warp_by_flow_map_banded,
    warp_by_flow_map_matmul,
    warp_by_flow_map_matmul_banded,
)

__all__ = [
    "concat_cost_volume",
    "correlation_cost_volume",
    "difference_cost_volume",
    "groupwise_cost_volume",
    "interweave_volume",
    "shift_stack",
    "soft_argmin",
    "soft_argmin_trilinear",
    "InputPadder",
    "pad_to_multiple",
    "grid_sample_2d",
    "resize_bilinear",
    "resize_nearest",
    "resize_trilinear",
    "warp_by_flow_map",
    "warp_by_flow_map_banded",
    "warp_by_flow_map_matmul",
    "warp_by_flow_map_matmul_banded",
]
