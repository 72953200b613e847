#!/usr/bin/env python
"""Whole-model MFU / roofline accounting (BASELINE.md round-4 table).

For each production path this prints: analytical FLOPs + HBM bytes of the
*XLA-compiled model forward* (post-optimization ``cost_analysis()`` -- the
useful algorithmic work, not including kernel fold-waste), measured latency
of the path actually shipped (kernel path where one exists), the achieved
TFLOP/s, MFU = flops / (latency * peak), and the roofline lower bound
``max(flops / PEAK, bytes / HBM_BW)``.

Peak numbers are TPU v5e per-chip: 197 TFLOP/s bf16 (MXU), 819 GB/s HBM.
The chained-dispatch timing (utils/timing.py) is validated at ~174 TFLOP/s
on an 8192^3 bf16 matmul chain (88% of peak), so an "MFU" here of ~0.88
would be the practical speed of light, not 1.0.

Usage: python benchmarks/mfu.py [row ...]  (default: all rows)
Rows: v1_720p v3_720p v4_kitti dispnetc_kitti v1_train v4_train
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = 197e12     # v5e bf16
HBM_BW = 819e9          # v5e HBM GB/s


def _cost(fn, *args):
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0)), float(cost.get("bytes accessed", 0.0))


def _report(name, flops, bytes_acc, latency_s, note=""):
    tflops = flops / latency_s / 1e12
    mfu = flops / (latency_s * PEAK_FLOPS)
    bound = max(flops / PEAK_FLOPS, bytes_acc / HBM_BW)
    regime = "compute" if flops / PEAK_FLOPS >= bytes_acc / HBM_BW else "memory"
    print(f"{name:18s} {flops / 1e9:9.1f} GF {bytes_acc / 1e9:7.2f} GB "
          f"{latency_s * 1e3:8.2f} ms {tflops:7.1f} TF/s "
          f"MFU {mfu * 100:5.1f}% roofline>={bound * 1e3:6.2f} ms "
          f"({regime}-bound{', ' + note if note else ''})")
    return {"name": name, "flops": flops, "bytes": bytes_acc,
            "ms": latency_s * 1e3, "mfu": mfu, "roofline_ms": bound * 1e3}


def _infer_row(name, model_cfg, h, w, fast=False):
    from realtime_stereo_matcher_tpu.models import build_model
    from realtime_stereo_matcher_tpu.utils.timing import chain_forward_latency

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))

    model = build_model(model_cfg, dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), left, right, train=False))()
    flops, bytes_acc = _cost(
        lambda l, r: model.apply(variables, l, r, train=False)[-1],
        left, right)

    if fast:
        from realtime_stereo_matcher_tpu.models.fast_infer import (
            make_fast_forward,
        )
        fwd = jax.jit(make_fast_forward(model, variables))
        note = "kernel path"
    else:
        fwd = jax.jit(
            lambda l, r: model.apply(variables, l, r, train=False))
        note = "XLA path"
    lat = chain_forward_latency(fwd, left, right)
    return _report(name, flops, bytes_acc, lat, note)


def _train_row(name, config_path, fast_kernels):
    from realtime_stereo_matcher_tpu.config import load_config
    from realtime_stereo_matcher_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )
    from realtime_stereo_matcher_tpu.utils.timing import measure_latency

    exp = load_config(config_path)
    exp.train.fast_kernels = fast_kernels
    rng = np.random.default_rng(0)
    b = exp.train.batch_size
    h, w = exp.data.image_size
    img1 = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-64, 0, (b, h, w, 2)).astype(np.float32))
    flow = flow.at[..., 1].set(0.0)
    valid = jnp.ones((b, h, w), jnp.float32)

    model, tx, _, state = create_train_state(exp, dtype=jnp.bfloat16)
    # analytic flops of the XLA train step (fwd+bwd+opt), kernel-free
    xla_step = make_train_step(model, tx, exp.train.loss.parameters)
    flops, bytes_acc = _cost(
        lambda s, a, b2, f, v: xla_step(s, a, b2, f, v)[0],
        state, img1, img2, flow, valid)

    # NOTE: no donate_argnums here -- timed_chain re-feeds the same initial
    # state across repeats, which donation would invalidate
    if fast_kernels == "on":
        from realtime_stereo_matcher_tpu.models.fast_train import (
            make_fast_train_step,
        )
        step = jax.jit(make_fast_train_step(
            model, tx, exp.train.loss.parameters))
        note = "kernel step"
    else:
        step = jax.jit(xla_step)
        note = "XLA step"

    def one(carry):
        s, m = step(carry[0], img1, img2, flow, valid)
        return (s, m["live_loss"])

    lat = measure_latency(one, (state, jnp.zeros(())), k=16)
    return _report(name, flops, bytes_acc, lat, note)


ROWS = {
    "v1_720p": lambda: _infer_row(
        "v1 720p", {"type": "MobileStereoNet", "parameters": {}},
        720, 1280, fast=True),
    "v3_720p": lambda: _infer_row(
        "v3 720p", {"type": "MobileStereoNetV3", "parameters": {}},
        720, 1280, fast=True),
    "v4_kitti": lambda: _infer_row(
        "V4 384x1248", {"type": "MobileStereoNetV4", "parameters": {}},
        384, 1248, fast=False),
    "dispnetc_kitti": lambda: _infer_row(
        "DispNetC 384x1248",
        {"type": "MobileDispNetC",
         "parameters": {"hidden_dim": 8, "max_disp": 192,
                        "with_batch_norm": True}},
        384, 1248, fast=False),
    "v1_train": lambda: _train_row(
        "v1 train b8", "configure/stereo_net_synthetic_config.json", "on"),
    "v4_train": lambda: _train_row(
        "V4 train b6", "configure/stereo_net_v4_synthetic_config.json", "off"),
}


def main():
    names = sys.argv[1:] or list(ROWS)
    print(f"{'row':18s} {'analytic':>12s} {'HBM':>10s} {'measured':>11s} "
          f"{'achieved':>10s}")
    for n in names:
        ROWS[n]()


if __name__ == "__main__":
    main()
