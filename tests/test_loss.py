"""Sequence loss / metrics vs. a torch oracle implementing the reference math."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from realtime_stereo_matcher_tpu.train.loss import (
    flow_map_metrics,
    sequence_loss,
    smooth_l1,
)


def _torch_sequence_loss(preds, gt, valid, gamma=0.9, max_mag=700.0):
    """Oracle reproducing reference loss/loss.py:35-81 with torch primitives
    (NCHW)."""
    n = len(preds)
    flow_mag = torch.sum(gt ** 2, dim=1).sqrt()
    v = (valid >= 0.5) & (flow_mag < max_mag)
    v = v.unsqueeze(1)
    total = 0.0
    for i, p in enumerate(preds):
        w = gamma ** (n - 1 - i)
        if p.shape != gt.shape:
            scale = float(gt.shape[-1]) / p.shape[-1]
            p = F.interpolate(p * scale, gt.shape[2:])  # nearest
        if i == n - 1:
            loss = F.smooth_l1_loss(gt, p, reduction="none", beta=1.0)
        else:
            loss = F.l1_loss(gt, p, reduction="none")
        total = total + w * loss[v].mean()
    return float(total)


def test_sequence_loss_matches_torch(rng):
    b, h, w = 2, 16, 24
    gt = rng.standard_normal((b, h, w, 1), dtype=np.float32) * 5
    valid = (rng.uniform(size=(b, h, w)) > 0.3).astype(np.float32)
    preds = [
        rng.standard_normal((b, h // 2, w // 2, 1), dtype=np.float32) * 5,
        rng.standard_normal((b, h, w, 1), dtype=np.float32) * 5,
        rng.standard_normal((b, h, w, 1), dtype=np.float32) * 5,
    ]
    got = float(sequence_loss([jnp.asarray(p) for p in preds], jnp.asarray(gt),
                              jnp.asarray(valid)))

    gt_t = torch.from_numpy(gt).permute(0, 3, 1, 2)
    preds_t = [torch.from_numpy(p).permute(0, 3, 1, 2) for p in preds]
    want = _torch_sequence_loss(preds_t, gt_t, torch.from_numpy(valid))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sequence_loss_max_flow_mask(rng):
    """Pixels with |gt| >= max_flow_magnitude must not contribute."""
    gt = np.zeros((1, 4, 4, 1), np.float32)
    gt[0, 0, 0, 0] = 1000.0  # excluded by magnitude
    valid = np.ones((1, 4, 4), np.float32)
    pred = np.zeros((1, 4, 4, 1), np.float32)
    loss = float(sequence_loss([jnp.asarray(pred)], jnp.asarray(gt),
                               jnp.asarray(valid)))
    assert loss == 0.0


def test_smooth_l1():
    d = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 3.0])
    got = np.asarray(smooth_l1(d))
    np.testing.assert_allclose(got, [1.5, 0.125, 0.0, 0.125, 2.5])


def test_flow_map_metrics(rng):
    b, h, w = 1, 8, 8
    gt = rng.standard_normal((b, h, w, 1), dtype=np.float32)
    pred = gt + rng.standard_normal((b, h, w, 1), dtype=np.float32) * 0.5
    valid = np.ones((b, h, w), np.float32)
    m = {k: float(v) for k, v in
         flow_map_metrics(jnp.asarray(gt), jnp.asarray(pred),
                          jnp.asarray(valid)).items()}
    epe = np.abs(pred - gt)[..., 0]
    np.testing.assert_allclose(m["epe"], epe.mean(), rtol=1e-5)
    np.testing.assert_allclose(m["1px"], (epe < 1.0).mean(), rtol=1e-6)
    np.testing.assert_allclose(m["min"], pred[0].min(), rtol=1e-6)
