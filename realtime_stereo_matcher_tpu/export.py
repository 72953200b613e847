"""Deployment export: serialized StableHLO serving artifacts.

TPU-native analog of the reference's ONNX deployment path
(reference tools/convert.py:5-26, which exports ``model(left, right)`` at a
fixed shape with named ``left``/``right`` inputs at opset 16 for an arm64
NPU).  Here the portable artifact is a **jax.export StableHLO module**: the
eval-mode forward is traced at fixed serving shapes, serialized to bytes,
and can be reloaded and called from any process with a compatible jaxlib --
no Python model code or checkpoint needed at serving time.

Weights are baked into the artifact as constants (the ONNX convention); the
module takes exactly two inputs, ``left`` and ``right`` NHWC float32 images,
and returns the final negative-disparity map.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
from jax import export as jax_export


def make_serving_fn(model, variables):
    """Close over weights: (left, right) -> final negative-disparity map."""

    def serve(left, right):
        return model.apply(variables, left, right, train=False)[-1]

    return serve


def export_stereo_model(model, variables, *, image_hw, output_file,
                        batch_size: int = 1, dtype=jnp.float32,
                        platforms=("tpu",)) -> Path:
    """Serialize the eval forward at fixed shapes to ``output_file``.

    Mirrors reference tools/convert.py:18-26 (fixed ``1x3xHxW`` dummy inputs,
    named left/right) with NHWC shapes.  Writes ``<output_file>`` (bytes) and
    ``<output_file>.json`` (shape/platform metadata for the loader).
    """
    h, w = image_hw
    spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), dtype)
    serve = make_serving_fn(model, variables)
    exported = jax_export.export(
        jax.jit(serve), platforms=list(platforms))(spec, spec)
    blob = exported.serialize()
    out = Path(output_file)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(blob)
    meta = {
        "input_shape": [batch_size, h, w, 3],
        "dtype": str(jnp.dtype(dtype)),
        "platforms": list(platforms),
        "inputs": ["left", "right"],
        "output": "negative_disparity_nhwc",
    }
    out.with_suffix(out.suffix + ".json").write_text(json.dumps(meta, indent=2))
    return out


def load_exported(path) -> "jax_export.Exported":
    """Deserialize an exported artifact; ``.call(left, right)`` runs it."""
    return jax_export.deserialize(Path(path).read_bytes())


def aot_compile(model, variables, *, image_hw, batch_size: int = 1,
                dtype=jnp.float32):
    """AOT-compile the serving function for the *local* devices.

    Returns the compiled executable (``.call`` / ``__call__`` runs with zero
    retracing) -- the low-latency serving path when export portability is
    not needed.
    """
    h, w = image_hw
    spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), dtype)
    serve = make_serving_fn(model, variables)
    return jax.jit(serve).lower(spec, spec).compile()
