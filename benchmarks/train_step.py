#!/usr/bin/env python
"""Per-model train-step latency on one TPU chip, at the reference configs.

Measures the jitted donated-free train step (XLA path, and the Pallas kernel
path where ``fast_step_supported``) for each trainable model family at its
reference crop/batch (``configure/*.json`` train sections), using the
chained-dispatch methodology from ``utils/timing.py`` (naive wall-clock is
bogus through this environment's TPU relay -- see bench.py docstring).

Usage::

    python benchmarks/train_step.py [config_name ...]

with config names from ``configure/`` (default: all five trainable configs).
Prints one line per (model, path): latency ms and samples/s.  Results are
recorded in BASELINE.md.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIGS = [
    "stereo_net_config.json",
    "stereo_net_config_v2.json",
    "stereo_net_config_v3.json",
    "stereo_net_config_v4.json",
    "disp_net_c_config.json",
]


def bench_config(name: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realtime_stereo_matcher_tpu.config import load_config
    from realtime_stereo_matcher_tpu.models.fast_train import (
        fast_step_supported,
        make_fast_train_step,
    )
    from realtime_stereo_matcher_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )
    from realtime_stereo_matcher_tpu.utils.timing import measure_latency

    cfg_path = Path(__file__).resolve().parent.parent / "configure" / name
    exp_config = load_config(json.loads(cfg_path.read_text()))
    b = exp_config.train.batch_size
    h, w = exp_config.data.image_size
    dtype = jnp.bfloat16 if exp_config.model.mixed_precision else None

    model, tx, _, state = create_train_state(exp_config, dtype=dtype)
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32))
    flow = jnp.asarray(
        -rng.uniform(0, 160, (b, h, w, 1)).astype(np.float32))
    valid = jnp.ones((b, h, w), jnp.float32)

    loss_params = exp_config.train.loss.parameters
    paths = {"xla": make_train_step(model, tx, loss_params)}
    if fast_step_supported(model, exp_config):
        paths["kernel"] = make_fast_train_step(model, tx, loss_params)

    for path_name, step in paths.items():
        # no donation: the chained-timing harness re-feeds the same initial
        # state across repeats, which donation would invalidate
        jstep = jax.jit(lambda s, step=step: step(s, img1, img2, flow,
                                                  valid)[0])
        lat = measure_latency(jstep, state, k=16, repeats=3)
        print(f"{exp_config.model.type:20s} {path_name:6s} "
              f"batch {b} @ {h}x{w}: {lat * 1e3:7.1f} ms  "
              f"{b / lat:6.1f} samples/s", flush=True)


def main():
    names = sys.argv[1:] or CONFIGS
    for name in names:
        bench_config(name)


if __name__ == "__main__":
    main()
