#!/usr/bin/env python
"""720p batch-1 inference FPS for any model family (BASELINE.md rows).

Usage: python benchmarks/infer_720p.py [v1] [v2] [v3] ...
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

CFGS = {
    "v1": {"type": "MobileStereoNet", "parameters": {}},
    "v2": {"type": "MobileStereoNetV2", "parameters": {}},
    "v3": {"type": "MobileStereoNetV3", "parameters": {}},
}


def main():
    from realtime_stereo_matcher_tpu.models import build_model
    from realtime_stereo_matcher_tpu.models.fast_infer import make_fast_forward
    from realtime_stereo_matcher_tpu.utils.timing import chain_forward_latency

    rng = np.random.default_rng(0)
    h, w = 720, 1280
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))

    for name in sys.argv[1:] or ["v3"]:
        model = build_model(CFGS[name], dtype=jnp.bfloat16)
        variables = jax.jit(lambda m=model: m.init(
            jax.random.PRNGKey(0), left, right, train=False))()
        fwd = jax.jit(make_fast_forward(model, variables))
        lat = chain_forward_latency(fwd, left, right)
        print(f"{name} 720p fast path: {lat * 1e3:.2f} ms = "
              f"{1.0 / lat:.1f} FPS", flush=True)


if __name__ == "__main__":
    main()
