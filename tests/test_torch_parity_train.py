"""Train-mode (gradient + BatchNorm-update) parity vs. the torch reference.

Eval-mode transplant parity (test_torch_parity.py) proves the architectures
match; this file proves the TRAINING DYNAMICS match: for each model we
transplant random torch weights, run one identical train-mode forward +
SequenceLoss backward on the same batch in both frameworks, and compare

* the loss value,
* every parameter gradient (torch grads are converted into the flax pytree
  through the same layout mapper the weights use -- it is linear, so it maps
  cotangents exactly), and
* the post-step BatchNorm running statistics.

Reference: train_stereo.py:164-186 (the train step this pins), loss/loss.py.

Known, bounded deviations (asserted, not assumed):

* torch updates running_var with the UNBIASED batch variance while flax uses
  the biased one (factor n/(n-1) on the update term) -- absorbed by the stat
  tolerance at the reduction sizes used here (documented per call);
* MobileStereoNetV4's conscious batched-BN deviation (the reference
  normalizes each of the 48 volume shifts by its own slice statistics,
  reference mobile_stereo_net_v4.py:443-458; models/stereo_net_v4.py
  normalizes all shifts at once) makes train-mode forwards differ -- for V4
  the test QUANTIFIES the deviation (output gap + global gradient cosine)
  instead of asserting bitwise parity.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from realtime_stereo_matcher_tpu.models import build_model
from realtime_stereo_matcher_tpu.models.torch_import import (
    import_torch_state_dict,
)
from realtime_stereo_matcher_tpu.train.loss import sequence_loss

from tests.test_torch_parity import _load_ref, _randomize_bn_stats


def _torch_sequence_loss(preds, gt, valid, gamma=0.9, max_mag=700.0):
    """Reference loss/loss.py:35-81 on torch NCHW tensors (differentiable)."""
    import torch.nn.functional as F

    n = len(preds)
    flow_mag = torch.sum(gt ** 2, dim=1).sqrt()
    v = ((valid >= 0.5) & (flow_mag < max_mag)).unsqueeze(1)
    total = 0.0
    for i, p in enumerate(preds):
        w = gamma ** (n - 1 - i)
        if p.shape != gt.shape:
            scale = float(gt.shape[-1]) / p.shape[-1]
            p = F.interpolate(p * scale, gt.shape[2:])
        if i == n - 1:
            loss = F.smooth_l1_loss(gt, p, reduction="none", beta=1.0)
        else:
            loss = F.l1_loss(gt, p, reduction="none")
        total = total + w * loss[v].mean()
    return total


def _make_batch(rng, b, hw, max_disp=40.0):
    left = rng.uniform(0, 255, (b, *hw, 3)).astype(np.float32)
    right = rng.uniform(0, 255, (b, *hw, 3)).astype(np.float32)
    # disparity-as-negative-flow targets (stereo_datasets.py:78) + holes
    flow = -rng.uniform(0, max_disp, (b, *hw, 1)).astype(np.float32)
    valid = (rng.uniform(size=(b, *hw)) > 0.2).astype(np.float32)
    return left, right, flow, valid


def _torch_train_step(tmodel, left, right, flow, valid):
    """One train-mode forward + SequenceLoss backward; returns
    (loss, grads state_dict, post-forward state_dict)."""
    tmodel.train()
    tmodel.zero_grad()
    out = tmodel(torch.from_numpy(left.transpose(0, 3, 1, 2)),
                 torch.from_numpy(right.transpose(0, 3, 1, 2)))
    loss = _torch_sequence_loss(
        list(out), torch.from_numpy(flow.transpose(0, 3, 1, 2)),
        torch.from_numpy(valid))
    loss.backward()
    grads = {}
    named = dict(tmodel.named_parameters())
    for k, v in tmodel.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        p = named.get(k)
        if p is not None:
            grads[k] = (np.zeros_like(v.detach().numpy()) if p.grad is None
                        else p.grad.detach().numpy())
        else:  # running stats: pass values through (only 'params' is read)
            grads[k] = v.detach().numpy().copy()
    post_sd = {k: v.detach().numpy().copy()
               for k, v in tmodel.state_dict().items()}
    return float(loss.detach()), grads, post_sd


def _jax_train_step(model_type, variables, left, right, flow, valid):
    """One train-mode forward + SequenceLoss grad; returns
    (loss, grads pytree, new batch_stats)."""
    model = build_model({"type": model_type})

    def loss_fn(params):
        preds, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(left), jnp.asarray(right), train=True,
            mutable=["batch_stats"])
        return (sequence_loss(preds, jnp.asarray(flow), jnp.asarray(valid)),
                updates["batch_stats"])

    (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    return float(loss), jax.device_get(grads), jax.device_get(new_bs)


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flat(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _compare_trees(got, want, rtol, atol, what, slack=None):
    """Leafwise |got - want| <= atol + rtol*scale (+ optional per-leaf
    elementwise ``slack`` arrays for exactly-known semantic gaps)."""
    g, w = _flat(got), _flat(want)
    assert set(g) == set(w), (what, set(g) ^ set(w))
    worst = (0.0, None)
    for k in sorted(w):
        scale = max(np.abs(w[k]).max(), 1e-8)
        diff = np.abs(g[k] - w[k])
        if slack and k in slack:
            diff = np.maximum(diff - slack[k], 0.0)
        err = diff.max()
        rel = err / max(scale, atol / max(rtol, 1e-30))
        if rel > worst[0]:
            worst = (rel, k)
        assert err <= atol + rtol * scale, (
            f"{what} '{k}': max abs err {err:.3e} vs scale {scale:.3e} "
            f"(tol {atol + rtol * scale:.3e})")
    return worst


def _train_parity(ref_file, ref_cls, model_type, hw, rng, *, b=2,
                  grad_rtol=5e-2, grad_atol=1e-4, stat_rtol=5e-3,
                  stat_atol=1e-5, loss_tol=1e-4, **ref_kwargs):
    # grad_atol floor: leaves whose true gradient is ~0 by symmetry (e.g. the
    # cost filter's final bias -- softmax is shift-invariant) hold only fp
    # cancellation noise in BOTH frameworks; they cannot be compared
    # relatively.  grad_rtol: gradients traverse cascaded BN+softmax chains
    # under random untrained weights -- fp reassociation amplifies to
    # ~1-3e-2 on the worst leaf (measured, CPU f32 both sides), and torch's
    # intra-op threading makes the exact magnitude vary run-to-run under CPU
    # contention; 5e-2 bounds systematic divergence while the 1e-4 loss
    # tolerance pins the forward tightly.
    mod = _load_ref(ref_file)
    # pin the torch init draw: the global-RNG state otherwise depends on test
    # order, and an unlucky untrained-weight draw can push the worst grad
    # leaf past rtol (observed once on v2 under heavy CPU contention)
    torch.manual_seed(0)
    tmodel = getattr(mod, ref_cls)(**ref_kwargs)
    _randomize_bn_stats(tmodel, rng)
    # .copy(): state_dict tensors alias the live buffers -- without it the
    # in-place BN running-stat updates of the torch forward would silently
    # rewrite this "pre-step" snapshot
    sd = {k: v.detach().numpy().copy()
          for k, v in tmodel.state_dict().items()}

    left, right, flow, valid = _make_batch(rng, b, hw)
    t_loss, t_grads, t_post = _torch_train_step(tmodel, left, right, flow,
                                                valid)

    model = build_model({"type": model_type})
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(left),
                           jnp.asarray(right), train=True)
    variables = import_torch_state_dict(model_type, sd, variables)
    j_loss, j_grads, j_bs = _jax_train_step(model_type, variables, left,
                                            right, flow, valid)

    assert abs(t_loss - j_loss) <= loss_tol * max(abs(t_loss), 1.0), (
        t_loss, j_loss)

    # torch grads -> flax pytree through the (linear) layout mapper
    want_grads = import_torch_state_dict(model_type, t_grads,
                                         variables)["params"]
    _compare_trees(j_grads, want_grads, grad_rtol, grad_atol, "grad")

    # post-forward BN running stats.  torch's running-var update uses the
    # UNBIASED batch variance, flax the biased one: the var updates differ by
    # exactly (update term)/(n-1).  The per-leaf reduction size n is not
    # recoverable here, so every var leaf gets an elementwise slack of
    # (new - m*old)/(n_min - 1) with n_min the smallest BN reduction in any
    # model under test (DispNetC's 1/64-res blocks: n = 2*1*2 = 4).  Mean
    # leaves and everything else stay at the tight tolerance, so a real
    # semantic break still fails.
    want_bs = import_torch_state_dict(model_type, t_post,
                                      variables)["batch_stats"]
    old_bs = import_torch_state_dict(model_type, sd,
                                     variables)["batch_stats"]
    wf, of = _flat(want_bs), _flat(old_bs)
    n_min = 4
    slack = {k: np.abs(wf[k] - 0.9 * of[k]) / (n_min - 1)
             for k in wf if k.endswith("/var")}
    _compare_trees(j_bs, want_bs, stat_rtol, stat_atol, "batch_stat",
                   slack=slack)


@pytest.mark.slow
def test_train_parity_v1(rng):
    _train_parity("mobile_stereo_net", "MobileStereoNet", "MobileStereoNet",
                  (48, 64), rng)


@pytest.mark.slow
def test_train_parity_v2(rng):
    _train_parity("mobile_stereo_net_v2", "MobileStereoNetV2",
                  "MobileStereoNetV2", (48, 64), rng)


@pytest.mark.slow
def test_train_parity_v3(rng):
    _train_parity("mobile_stereo_net_v3", "MobileStereoNetV3",
                  "MobileStereoNetV3", (48, 64), rng)


@pytest.mark.slow
def test_train_parity_dispnetc(rng):
    # the unbiased-var gap of the 1/64-res blocks (n = 4) is covered by the
    # exact elementwise var slack in _train_parity
    _train_parity("mobile_disp_net_c", "MobileDispNetC", "MobileDispNetC",
                  (64, 128), rng)


@pytest.mark.slow
def test_train_deviation_v4(rng):
    """V4's conscious batched-BN deviation, QUANTIFIED.

    The reference normalizes each of the 48 volume shifts by its own slice
    statistics during training (mobile_stereo_net_v4.py:443-458 calls the
    same BatchNorm 48 times); this framework normalizes the batched volume
    once.  Eval-mode equivalence is exact (test_torch_parity.py); here we
    bound the train-mode divergence on one step: final-head output MAE in
    disparity units and the global gradient cosine similarity.
    """
    mod = _load_ref("mobile_stereo_net_v4")
    torch.manual_seed(0)  # pin the init draw (see _train_parity)
    tmodel = mod.MobileStereoNetV4(max_disp=192)
    _randomize_bn_stats(tmodel, rng)
    sd = {k: v.detach().numpy().copy()
          for k, v in tmodel.state_dict().items()}

    hw = (48, 224)
    left, right, flow, valid = _make_batch(rng, 1, hw)
    t_loss, t_grads, _ = _torch_train_step(tmodel, left, right, flow, valid)

    tmodel.train()
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(left.transpose(0, 3, 1, 2)),
                       torch.from_numpy(right.transpose(0, 3, 1, 2)))

    model_type = "MobileStereoNetV4"
    model = build_model({"type": model_type})
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(left),
                           jnp.asarray(right), train=True)
    variables = import_torch_state_dict(model_type, sd, variables)
    j_loss, j_grads, _ = _jax_train_step(model_type, variables, left, right,
                                         flow, valid)

    preds, _ = model.apply(variables, jnp.asarray(left), jnp.asarray(right),
                           train=True, mutable=["batch_stats"])
    assert len(t_out) == len(preds) == 4

    # output deviation in disparity units (disparities span 0..191)
    mae = max(
        float(np.abs(np.asarray(p).transpose(0, 3, 1, 2)
                     - o.detach().numpy()).mean())
        for p, o in zip(preds, t_out))
    # measured ~3.9px under RANDOM untrained weights (a worst case: the
    # volume BN sees wildly varying per-shift statistics); the bound is an
    # upper quantification -- the meaningful gates are exact eval-mode parity
    # (test_torch_parity.py) and the V4 convergence run (BASELINE.md)
    assert mae < 8.0, f"train-mode BN deviation too large: MAE {mae:.3f}px"

    assert abs(t_loss - j_loss) <= 0.1 * max(abs(t_loss), 1.0), (
        t_loss, j_loss)

    # Gradient-direction quantification, per region.  The supervision heads
    # sit AFTER the volume whose normalization deviates, so their gradients
    # must stay aligned (measured mean cosine ~0.96); deep extractor
    # BatchNorm-scale gradients genuinely decorrelate under random weights
    # (per-shift vs batched statistics rescale each shift differently), which
    # is the honest quantification of the deviation's training-dynamics reach
    # -- the empirical validation that it trains fine is the V4 convergence
    # run (BASELINE.md).
    want = import_torch_state_dict(model_type, t_grads, variables)["params"]
    g, w = _flat(j_grads), _flat(want)

    def region_cos(substr):
        cs = []
        for k in w:
            if substr in k:
                a, b = g[k].ravel(), w[k].ravel()
                denom = np.linalg.norm(a) * np.linalg.norm(b) + 1e-30
                cs.append(float(a @ b / denom))
        return float(np.mean(cs))

    head_cos = region_cos("Classif")
    assert head_cos > 0.8, f"head gradient cosine {head_cos:.4f}"
