"""Multi-device scaling-efficiency benchmark (BASELINE.md north star:
>= 80% frames/s scaling efficiency on a v5e slice).

Measures data-parallel inference throughput at increasing device counts and
reports ``efficiency(n) = fps(n) / (n * fps(1))``.  Each measurement jits the
batch-sharded forward over a ``data``-axis mesh of the first ``n`` devices,
feeding ``frames_per_device`` images per chip.

Run standalone:  ``python -m realtime_stereo_matcher_tpu.parallel.scaling_bench``
(on a multi-chip slice; on one chip it degenerates to the single-device FPS).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from realtime_stereo_matcher_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    shard_batch,
)


def measure_throughput(model, variables, mesh, *, image_hw=(720, 1280),
                       frames_per_device: int = 2, iters: int = 8) -> float:
    """Frames/s of the eval forward with the batch sharded over 'data'."""
    n = mesh.shape["data"] * mesh.shape["spatial"]
    batch = frames_per_device * mesh.shape["data"]
    rng = np.random.default_rng(0)
    h, w = image_hw
    left = rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32)
    right = rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32)

    v = jax.device_put(variables, replicated(mesh))
    li, ri = shard_batch(mesh, (left, right))

    @jax.jit
    def step(carry):
        l, r = carry
        out = model.apply(v, l, r, train=False)[-1]
        return (l + out * jnp.asarray(1e-12, l.dtype), r)

    carry = step((li, ri))
    jax.block_until_ready(carry)
    t0 = time.time()
    for _ in range(iters):
        carry = step(carry)
    jax.block_until_ready(carry)
    dt = (time.time() - t0) / iters
    del n
    return batch / dt


def scaling_efficiency(model, variables, device_counts=None, *,
                       image_hw=(720, 1280), frames_per_device: int = 2
                       ) -> dict:
    """fps + efficiency per device count.  Returns
    {n: {"fps": ..., "efficiency": ...}}."""
    devices = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32)
                         if n <= len(devices)]
    results = {}
    base = None
    for n in device_counts:
        mesh = make_mesh(data=n, spatial=1, devices=devices[:n])
        fps = measure_throughput(model, variables, mesh, image_hw=image_hw,
                                 frames_per_device=frames_per_device)
        if base is None:
            base = fps / n
        results[n] = {"fps": fps, "efficiency": fps / (n * base)}
    return results


def measure_sharded_latency(model, variables, *, image_hw=(720, 1280),
                            iters: int = 8) -> float:
    """Single-image latency (s) of the end-to-end disparity+spatially
    sharded forward (parallel/sharded_infer.py) over all devices -- the
    model-parallel lever for latency (vs. the throughput DP above)."""
    from realtime_stereo_matcher_tpu.parallel.sharded_infer import (
        make_sharded_infer,
    )

    rng = np.random.default_rng(0)
    h, w = image_hw
    left = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    fwd = make_sharded_infer(model, variables)
    out = fwd(left, right)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fwd(left, right)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():  # pragma: no cover - measured entry point, not unit-testable
    """Run the efficiency curve on whatever devices exist.

    On a multi-chip slice this measures the real north-star number.  With
    one chip it degenerates to single-device FPS.  ``--cpu`` forces the
    virtual host-platform mesh (run with
    ``XLA_FLAGS=--xla_force_host_platform_device_count=8``) -- on 2 vCPUs
    the cores are oversubscribed, so the resulting curve measures
    partitioner+runtime overhead, not ICI (that projection lives in
    parallel/comm_audit.py + BASELINE.md); it is still the same benchmark
    component, executed end to end.
    """
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the host-platform (virtual-device) mesh")
    ap.add_argument("--image_hw", type=int, nargs=2, default=None,
                    help="override the 720p default (e.g. 96 128 on CPU)")
    ap.add_argument("--frames_per_device", type=int, default=2)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    image_hw = tuple(args.image_hw) if args.image_hw else (720, 1280)

    from realtime_stereo_matcher_tpu.models import build_model

    model = build_model({"type": "MobileStereoNet", "parameters": {}},
                        dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(rng, dummy, dummy, train=True)
    for n, r in scaling_efficiency(
            model, variables, image_hw=image_hw,
            frames_per_device=args.frames_per_device).items():
        print(f"devices={n:3d}  fps={r['fps']:8.2f}  "
              f"efficiency={r['efficiency']:.3f}", flush=True)
    lat = measure_sharded_latency(model, variables, image_hw=image_hw)
    print(f"sharded single-image latency over {len(jax.devices())} devices: "
          f"{lat * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
