"""Sequence loss + flow-map metrics (reference loss/loss.py).

Functional JAX re-design of the reference's ``SequenceLoss`` (loss/loss.py:25-81)
and ``get_flow_map_metrics`` (:6-22):

* exponentially weighted multi-prediction loss: weight ``gamma^(n-1-i)``,
  plain L1 for intermediate predictions, SmoothL1 (beta=1) for the final one;
* predictions whose shape differs from GT are upsampled with *nearest*
  interpolation and rescaled by the width ratio (the reference's mode-less
  ``F.interpolate``, :70-72);
* the valid mask combines the dataset mask with ``|flow| < max_flow_magnitude``.

Masked means are computed with explicit sum/count (no boolean indexing --
static shapes under jit).  Everything reduces in float32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from realtime_stereo_matcher_tpu.ops import resize_nearest


def smooth_l1(diff: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray,
                 axis_name: str | None = None) -> jnp.ndarray:
    """Masked mean; with ``axis_name`` (inside shard_map/pmap) numerator and
    denominator psum over the axis -- the exact global-batch mean."""
    m = mask.astype(jnp.float32)
    num = jnp.sum(x * m)
    den = jnp.sum(m)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)


def sequence_loss(
    flow_preds: Sequence[jnp.ndarray],
    flow_gt: jnp.ndarray,
    flow_valid: jnp.ndarray,
    *,
    loss_gamma: float = 0.9,
    max_flow_magnitude: float = 700.0,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Reference SequenceLoss.forward (loss/loss.py:35-81).

    Args:
      flow_preds: list of (B, H', W', 1) predictions, coarse -> fine.
      flow_gt: (B, H, W, 1) ground-truth flow (negative disparity).
      flow_valid: (B, H, W) float/bool validity mask.
    Returns:
      scalar float32 loss.
    """
    n_preds = len(flow_preds)
    assert n_preds >= 1, f"empty flow predictions ({n_preds})!"

    gt = flow_gt.astype(jnp.float32)
    flow_mag = jnp.sqrt(jnp.sum(gt ** 2, axis=-1))  # (B, H, W)
    valid = (flow_valid.astype(jnp.float32) >= 0.5) & (
        flow_mag < max_flow_magnitude
    )
    valid = valid[..., None]  # (B, H, W, 1)

    total = jnp.float32(0.0)
    h, w = gt.shape[1], gt.shape[2]
    for i, pred in enumerate(flow_preds):
        weight = loss_gamma ** (n_preds - 1 - i)
        p = pred.astype(jnp.float32)
        if p.shape[1] != h or p.shape[2] != w:
            scale = float(w) / p.shape[2]
            p = resize_nearest(p * scale, (h, w))
        diff = gt - p
        err = smooth_l1(diff) if i == n_preds - 1 else jnp.abs(diff)
        total = total + weight * _masked_mean(err, valid, axis_name)
    return total


def flow_map_metrics(flow_gt, flow_pred, flow_valid,
                     axis_name: str | None = None) -> dict:
    """Reference get_flow_map_metrics (loss/loss.py:6-22): masked EPE plus
    <0.5/1/3/5 px accuracy rates and the first image's pred min/max.

    With ``axis_name`` the masked means are global-batch exact and min/max
    reduce across shards."""
    gt = flow_gt.astype(jnp.float32)
    pred = flow_pred.astype(jnp.float32)
    valid = flow_valid.astype(jnp.float32) >= 0.5  # (B, H, W)

    epe = jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1))  # (B, H, W)
    mn, mx = jnp.min(pred[0]), jnp.max(pred[0])
    if axis_name is not None:
        mn = jax.lax.pmin(mn, axis_name)
        mx = jax.lax.pmax(mx, axis_name)
    return {
        "epe": _masked_mean(epe, valid, axis_name),
        "0.5px": _masked_mean((epe < 0.5).astype(jnp.float32), valid,
                              axis_name),
        "1px": _masked_mean((epe < 1.0).astype(jnp.float32), valid,
                            axis_name),
        "3px": _masked_mean((epe < 3.0).astype(jnp.float32), valid,
                            axis_name),
        "5px": _masked_mean((epe < 5.0).astype(jnp.float32), valid,
                            axis_name),
        "min": mn,
        "max": mx,
    }


def build_loss_function(loss_config: dict):
    """Loss factory dispatching on config ``type``
    (reference loss/__init__.py:4-10).

    Accepts ``{"type": ..., "parameters": {...}}``; returns
    ``loss_fn(preds, gt, valid, axis_name=None)`` with parameters bound.
    Unknown types raise, matching the reference -- previously the trainer
    hardwired SequenceLoss and silently ignored the config type.
    """
    ltype = loss_config.get("type", "SequenceLoss")
    params = dict(loss_config.get("parameters", {}))
    if ltype == "SequenceLoss":
        gamma = float(params.get("loss_gamma", 0.9))
        max_flow = float(params.get("max_flow_magnitude", 700))

        def loss_fn(preds, gt, valid, axis_name=None):
            return sequence_loss(preds, gt, valid, loss_gamma=gamma,
                                 max_flow_magnitude=max_flow,
                                 axis_name=axis_name)

        return loss_fn
    raise NotImplementedError(f"invalid loss type: {ltype}!")
