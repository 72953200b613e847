#!/usr/bin/env python
"""Compare banded static-shift vs banded matmul warp on 3ch/32ch at 720p."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from realtime_stereo_matcher_tpu.ops import (
        warp_by_flow_map_banded, warp_by_flow_map_matmul_banded)
    from realtime_stereo_matcher_tpu.utils.timing import measure_latency

    rng = np.random.default_rng(0)
    for (hh, ww, ms) in ((720, 1280, 208), (360, 640, 112), (180, 320, 64)):
        for c in (3, 32):
            img = jnp.asarray(
                rng.uniform(-1, 1, (1, hh, ww, c)).astype(np.float32)
            ).astype(jnp.bfloat16)
            disp = jnp.asarray(
                rng.uniform(0, ms - 20, (1, hh, ww, 1)).astype(np.float32))

            def t(name, fn):
                lat = measure_latency(jax.jit(fn), disp, k=16)
                print(f"{hh}x{ww} c={c:2d} ms={ms:3d} {name:12s}: "
                      f"{lat * 1e3:7.2f} ms", flush=True)

            t("shift-band", lambda d: d + warp_by_flow_map_banded(
                img, d, ms).sum().astype(jnp.float32) * 1e-20)
            t("matmul-band", lambda d: d + warp_by_flow_map_matmul_banded(
                img, d, ms).sum().astype(jnp.float32) * 1e-20)


if __name__ == "__main__":
    main()
