"""Kernel-accelerated TRAINING path for MobileStereoNet v1/v2.

``make_fast_train_step(model, tx, loss_params)`` is a drop-in replacement for
``train.trainer.make_train_step`` whose RefineNet cascades -- ~70% of the
XLA train step's 321 ms at the reference config (batch 4, 480x640, bf16) --
run on the differentiable fused Pallas conv
(:func:`kernels.train_conv.flat_conv3x3`) instead of XLA convolutions.
Forward AND backward (custom_vjp: dx through the same kernel, dw through
full-lane folded reductions) use the flat lane-folded layout; BatchNorm,
ReLU and masking run in XLA between kernels, batched by stacking images
along flat rows with zero gap rows (``to_flat_batch``).

Semantics match the Flax path (models/stereo_net.py RefineNet; reference
model/mobile_stereo_net.py:59-87):

* identical parameter tree -- weights are read from the same ``params`` /
  ``batch_stats`` pytrees the Flax model owns;
* train-mode BatchNorm with flax statistics (biased batch variance, f32
  stats, momentum 0.9) and *sequential* running-stat threading where the
  reference applies one module twice (encoder on left then right);
* BN bias / affine outputs are re-masked to the true image rows so the flat
  layout's zero-halo invariant (per-image SAME padding + batch gap rows)
  survives every epilogue.

All conv stages run on the kernels: RefineNet cascades, encoder ResBlocks
(stride-2 convs and heads stay XLA) and the 5-layer Conv3d cost filter
(kernels/train_conv3d.py).  Parity tests pin each stage's outputs, grads and
batch-stats updates to the Flax path.

Data parallelism: ``make_fast_train_step(..., mesh=...)`` wraps the step in
``shard_map`` over the mesh's ``data`` axis -- per-shard Pallas kernels,
psum'd gradients, and sync-BN (batch statistics psum over shards, the same
global-batch semantics the Flax path gets from jit-level batch sharding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from realtime_stereo_matcher_tpu.kernels import conv3x3 as k3
from realtime_stereo_matcher_tpu.kernels.train_conv import (
    batch_flat_geometry,
    batch_image_mask,
    flat_conv3x3,
    from_flat_batch,
    to_flat_batch,
)
from realtime_stereo_matcher_tpu.models.stereo_net import (
    CostFilter3D,
    FeatureEncoder,
    MobileStereoNet,
    MobileStereoNetV2,
    MobileStereoNetV3,
    UNetFeatureExtractor,
    _full_res_nearest,
)
from realtime_stereo_matcher_tpu.models.layers import (
    BN_EPS,
    BN_MOMENTUM,
    normalize_images,
)
from realtime_stereo_matcher_tpu.ops import (
    difference_cost_volume,
    pad_to_multiple,
    resize_bilinear,
    soft_argmin,
    warp_by_flow_map,
    warp_by_flow_map_banded,
    warp_by_flow_map_matmul_banded,
)


def refine_conv_plan(dilations, entry_in_kernel=True):
    """Static conv metadata for one RefineNet: (param path, dilation,
    phase_in, has_bn, res_from) per conv + the head's output phase.
    ``entry_in_kernel=False`` leaves the entry conv to the caller (XLA) when
    its input exceeds the 32-channel lane fold (v3: 65 channels).

    Mirrors the inference plan's phase bookkeeping
    (kernels/refine_stack.py:build_refine_plan): split folds (d <= 2) flip
    the pixel phase, 9-block folds (d > 2) keep it.  ``res_from`` indexes the
    activation history (history[0] = stack input).
    """
    specs = []
    phase = 0
    hist_phase = [0]

    def push(path, d, bn, res):
        nonlocal phase
        specs.append((path, d, phase, bn, res))
        phase = 2 - phase if d <= 2 else phase
        hist_phase.append(phase)

    if entry_in_kernel:
        push(("ConvBN_0",), 1, True, None)
    for j, d in enumerate(dilations):
        block_in = len(specs)
        push((f"ResBlock_{j}", "ConvBN_0"), d, True, None)
        push((f"ResBlock_{j}", "ConvBN_1"), d, True, block_in)
        assert hist_phase[block_in] == hist_phase[-1], (j, d)
    push(("Conv_0",), 1, False, None)
    return tuple(specs), phase


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _pad_w(w):
    """(3, 3, Ci, Co) -> (3, 3, 32, 32) zero-padded HWIO weights."""
    w = jnp.asarray(w, jnp.float32)
    ci, co = w.shape[2], w.shape[3]
    return jnp.pad(w, ((0, 0), (0, 0), (0, 32 - ci), (0, 32 - co)))


def _bn_relu_mask(yf, bn_p, bn_s, mask, count, train, dtype,
                  axis_name=None):
    """Train/eval BatchNorm + ReLU + image re-mask on a flat activation.

    Stats reduce over true image pixels only (zeros outside contribute
    nothing to the sums; ``count`` is the true pixel count).  With
    ``axis_name`` (inside shard_map) the stats psum over the axis --
    sync-BN over the global batch, matching the Flax path under
    jit-level batch sharding (models/layers.py docstring).  Returns the
    masked activation and the updated (mean, var) running stats.
    """
    c = np.shape(bn_p["scale"])[0]  # true channel count (may be < 32)
    red = tuple(range(yf.ndim - 1))  # all but the lane axis
    ym = yf * jnp.asarray(mask, yf.dtype)
    if train:
        s = jnp.sum(ym.astype(jnp.float32), axis=red)           # (128,)
        s2 = jnp.sum(jnp.square(ym.astype(jnp.float32)), axis=red)
        s = s.reshape(4, 32).sum(0)[:c]
        s2 = s2.reshape(4, 32).sum(0)[:c]
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
            s2 = jax.lax.psum(s2, axis_name)
            count = jax.lax.psum(count, axis_name)
        mu = s / count
        var = s2 / count - jnp.square(mu)
        new_mean = BN_MOMENTUM * jnp.asarray(bn_s["mean"], jnp.float32) \
            + (1 - BN_MOMENTUM) * mu
        new_var = BN_MOMENTUM * jnp.asarray(bn_s["var"], jnp.float32) \
            + (1 - BN_MOMENTUM) * var
    else:
        mu = jnp.asarray(bn_s["mean"], jnp.float32)
        var = jnp.asarray(bn_s["var"], jnp.float32)
        new_mean, new_var = mu, var

    inv = jax.lax.rsqrt(var + BN_EPS)
    scale = jnp.asarray(bn_p["scale"], jnp.float32) * inv
    bias = jnp.asarray(bn_p["bias"], jnp.float32) - mu * scale
    scale_l = jnp.tile(jnp.pad(scale, (0, 32 - c)), 4).astype(dtype)
    bias_l = jnp.tile(jnp.pad(bias, (0, 32 - c)), 4).astype(dtype)
    out = jnp.maximum(ym.astype(dtype) * scale_l + bias_l, 0)
    out = out * jnp.asarray(mask, dtype)
    return out, (new_mean, new_var)


def _pad_w3(w):
    """(3, 3, 3, Ci, Co) -> (3, 3, 3, 32, 32) zero-padded DHWIO weights."""
    w = jnp.asarray(w, jnp.float32)
    ci, co = w.shape[3], w.shape[4]
    return jnp.pad(w, ((0, 0),) * 3 + ((0, 32 - ci), (0, 32 - co)))


def cost_filter_train(cf_params, cf_stats, vol, *, train=True,
                      dtype=jnp.bfloat16, axis_name=None):
    """CostFilter3D forward (models/stereo_net.py:52-67) on the
    differentiable flat conv3d kernels.

    ``vol`` (B, D, h, w, C) difference volume -> (B, D, h, w) filtered cost
    plus the filter's batch-stats update subtree.
    """
    from realtime_stereo_matcher_tpu.kernels.train_conv3d import (
        batch_slab_mask,
        flat_conv3d,
        vol_from_flat_batch,
        vol_to_flat_batch,
    )

    b, dvol, h, w, c = vol.shape
    xf3 = vol_to_flat_batch(vol.astype(dtype))
    slabs, rows, wt, _ = xf3.shape
    count = jnp.float32(b * dvol * h * w)
    masks = {p: batch_slab_mask(slabs, rows, wt, b, dvol, w, p)
             for p in (0, 2)}

    phase = 0
    upd = {}
    for i in range(4):
        sub_p = cf_params[f"ConvBN_{i}"]
        yf3 = flat_conv3d(xf3, _pad_w3(sub_p["Conv_0"]["kernel"]), phase)
        phase = 2 - phase
        xf3, u = _bn_relu_mask(
            yf3, sub_p["BatchNorm_0"],
            cf_stats[f"ConvBN_{i}"]["BatchNorm_0"],
            masks[phase], count, train, dtype, axis_name)
        upd[f"ConvBN_{i}"] = {"BatchNorm_0": {"mean": u[0], "var": u[1]}}

    head = cf_params["Conv_0"]
    yf3 = flat_conv3d(xf3, _pad_w3(head["kernel"]), phase)
    phase = 2 - phase
    cost = vol_from_flat_batch(yf3, b, dvol, h, w, 1, phase=phase)[..., 0]
    return cost + jnp.asarray(head["bias"], cost.dtype)[0], upd


def _bn_relu_nhwc(y, bn_p, bn_s, train, dtype, axis_name=None):
    """flax-semantics BatchNorm + ReLU on an NHWC tensor (XLA path);
    sync-BN over ``axis_name`` when inside shard_map."""
    if train:
        yf32 = y.astype(jnp.float32)
        mu = jnp.mean(yf32, axis=(0, 1, 2))
        m2 = jnp.mean(jnp.square(yf32), axis=(0, 1, 2))
        if axis_name is not None:
            mu = jax.lax.pmean(mu, axis_name)
            m2 = jax.lax.pmean(m2, axis_name)
        var = m2 - jnp.square(mu)
        new_mean = BN_MOMENTUM * jnp.asarray(bn_s["mean"], jnp.float32) \
            + (1 - BN_MOMENTUM) * mu
        new_var = BN_MOMENTUM * jnp.asarray(bn_s["var"], jnp.float32) \
            + (1 - BN_MOMENTUM) * var
    else:
        mu = jnp.asarray(bn_s["mean"], jnp.float32)
        var = jnp.asarray(bn_s["var"], jnp.float32)
        new_mean, new_var = mu, var
    inv = jax.lax.rsqrt(var + BN_EPS)
    scale = (jnp.asarray(bn_p["scale"], jnp.float32) * inv).astype(dtype)
    bias = (jnp.asarray(bn_p["bias"], jnp.float32)
            - mu * jnp.asarray(bn_p["scale"], jnp.float32) * inv).astype(dtype)
    out = jnp.maximum(y.astype(dtype) * scale + bias, 0)
    return out, (new_mean, new_var)


def encoder_train(enc_params, enc_stats, x, *, down=3, train=True,
                  dtype=jnp.bfloat16, axis_name=None):
    """FeatureEncoder forward (models/stereo_net.py:71-88) with ResBlock
    convs on the differentiable flat kernels; the stride-2 convs and head
    stay in XLA.  Returns (features, batch-stats update subtree)."""
    stats_upd = {}
    for i in range(down):
        w = jnp.asarray(enc_params[f"ConvBN_{i}"]["Conv_0"]["kernel"], dtype)
        # measured: XLA's own stride-2 backward beats the kernel-path
        # adjoint here (train_conv.conv3x3_s2 pays full-resolution kernels
        # on the zero-upsampled cotangent: 93 -> 100 ms step), so the
        # downsampling convs stay fully in XLA
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y, upd = _bn_relu_nhwc(
            y, enc_params[f"ConvBN_{i}"]["BatchNorm_0"],
            enc_stats[f"ConvBN_{i}"]["BatchNorm_0"], train, dtype,
            axis_name)
        stats_upd[f"ConvBN_{i}"] = {
            "BatchNorm_0": {"mean": upd[0], "var": upd[1]}}

        b, hh, ww, c = y.shape
        yf = to_flat_batch(y, 32)
        rows, wt, _ = yf.shape
        masks = {p: batch_image_mask(rows, wt, b, hh, ww, p) for p in (0, 2)}
        count = jnp.float32(b * hh * ww)
        rb_p = enc_params[f"ResBlock_{i}"]
        rb_s = enc_stats[f"ResBlock_{i}"]
        z = yf
        phase = 0
        rb_upd = {}
        for ci in range(2):
            wk = _pad_w(rb_p[f"ConvBN_{ci}"]["Conv_0"]["kernel"])
            z = flat_conv3x3(z, wk, 1, phase)
            phase = 2 - phase
            z, u = _bn_relu_mask(
                z, rb_p[f"ConvBN_{ci}"]["BatchNorm_0"],
                rb_s[f"ConvBN_{ci}"]["BatchNorm_0"],
                masks[phase], count, train, dtype, axis_name)
            rb_upd[f"ConvBN_{ci}"] = {
                "BatchNorm_0": {"mean": u[0], "var": u[1]}}
        stats_upd[f"ResBlock_{i}"] = rb_upd
        x = from_flat_batch(z + yf, b, hh, ww, c)  # residual, both phase 0

    head = enc_params["Conv_0"]
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(head["kernel"], dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x + jnp.asarray(head["bias"], dtype), stats_upd


def refine_net_train(rn_params, rn_stats, disp, l_guide, r_guide=None, *,
                     dilations=(1, 2, 4, 8, 1, 1), warp_guidance=False,
                     train=True, dtype=jnp.bfloat16, axis_name=None,
                     max_shift=192):
    """RefineNet forward on the differentiable flat kernels.

    ``disp`` (B, h, w, 1) float32 -> (B, 2h, 2w, 1) float32, plus the
    RefineNet's batch-stats update subtree.
    """
    b = disp.shape[0]
    h2, w2 = disp.shape[1] * 2, disp.shape[2] * 2
    disp = resize_bilinear(disp.astype(jnp.float32), (h2, w2)) * 2.0

    feats = [disp]
    if l_guide.shape[1:3] != (h2, w2):
        l_guide = resize_bilinear(l_guide, (h2, w2))
    feats.append(l_guide)
    if r_guide is not None:
        if r_guide.shape[1:3] != (h2, w2):
            r_guide = resize_bilinear(r_guide, (h2, w2))
        if warp_guidance:
            # the flow stays f32: both warps upcast it internally, and a
            # bf16 cast here would quantize the sample position to whole
            # pixels near max_disp (bf16 ulp is 1.0 in [128, 256))
            if r_guide.shape[-1] <= 8 and max_shift <= 64:
                # banded (gather/scatter-free) warp: XLA's gather lowering
                # costs ~17 ms per level fwd+bwd at batch 8, 240x320.  The
                # unrolled band scales with shifts x C, so it only pays for
                # narrow guidance at SMALL shift bounds (v2's RGB at the
                # coarse levels) -- same gate as the inference path
                # (kernels/refine_stack.py).
                r_guide = warp_by_flow_map_banded(
                    r_guide.astype(dtype), disp, max_shift)
            else:
                # banded per-row selection-matrix warp -- MXU matmuls in
                # both directions over a static max_shift tap band
                # (ops/sampling.py); cost is channel-independent, serving
                # v3's 32ch pyramid and v2's RGB at large shift bounds
                r_guide = warp_by_flow_map_matmul_banded(
                    r_guide.astype(dtype), disp, max_shift)
        feats.append(r_guide)
    x = jnp.concatenate([f.astype(dtype) for f in feats], axis=-1)
    bn_updates = {}
    entry_in_kernel = x.shape[-1] <= 32
    if not entry_in_kernel:
        # wide entry conv (v3: 1 + 2*hidden = 65ch) stays in XLA, like the
        # inference plan (kernels/refine_stack.py RefinePlan.entry_w)
        ep = rn_params["ConvBN_0"]
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(ep["Conv_0"]["kernel"], dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x, u = _bn_relu_nhwc(x, ep["BatchNorm_0"],
                             _get(rn_stats, ("ConvBN_0",))["BatchNorm_0"],
                             train, dtype, axis_name)
        bn_updates["ConvBN_0"] = {
            "BatchNorm_0": {"mean": u[0], "var": u[1]}}

    specs, final_phase = refine_conv_plan(tuple(dilations), entry_in_kernel)
    xf = to_flat_batch(x, 32)
    rows, wt, _ = xf.shape
    count = jnp.float32(b * h2 * w2)
    masks = {p: batch_image_mask(rows, wt, b, h2, w2, p) for p in (0, 2)}

    history = [xf]
    for path, d, phase_in, has_bn, res in specs:
        sub_p = _get(rn_params, path)
        if has_bn:
            w = _pad_w(sub_p["Conv_0"]["kernel"])
        else:
            w = _pad_w(sub_p["kernel"])
        yf = flat_conv3x3(history[-1], w, d, phase_in)
        phase_out = 2 - phase_in if d <= 2 else phase_in
        if has_bn:
            yf, upd = _bn_relu_mask(
                yf, sub_p["BatchNorm_0"], _get(rn_stats, path)["BatchNorm_0"],
                masks[phase_out], count, train, dtype, axis_name)
            node = bn_updates
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = {"BatchNorm_0": {"mean": upd[0], "var": upd[1]}}
        if res is not None:
            yf = yf + history[res]
        history.append(yf)

    head_p = rn_params["Conv_0"]
    delta = from_flat_batch(history[-1], b, h2, w2, 1, phase=final_phase)
    delta = delta.astype(jnp.float32) + jnp.asarray(head_p["bias"],
                                                    jnp.float32)[0]
    return jnp.maximum(disp + delta, 0.0), bn_updates


def fast_train_forward(model, params, batch_stats, left_img, right_img, *,
                       train=True, axis_name=None):
    """Full v1/v2 forward with kernel-path refinements.

    Returns (multi_scale predictions, new batch_stats tree) -- the same
    contract as ``model.apply(..., mutable=["batch_stats"])``.
    """
    if isinstance(model, MobileStereoNetV3):
        variant = "v3"
    elif isinstance(model, MobileStereoNetV2):
        variant = "v2"
    elif isinstance(model, MobileStereoNet):
        variant = "v1"
    else:
        raise NotImplementedError(type(model).__name__)
    warp_guidance = variant in ("v2", "v3")

    dtype = model.dtype or jnp.float32
    down = model.down_factor
    align = 2 ** down
    vol_disp = (model.max_disp + 1) // align

    left = normalize_images(left_img, dtype)
    right = normalize_images(right_img, dtype)
    left, orig_hw = pad_to_multiple(left, align)
    right, _ = pad_to_multiple(right, align)

    if variant == "v3":
        # U-Net pyramid extractor: plain bias convs + leaky ReLU, no BN
        # (stereo_net.py:130-177) -> XLA, no batch stats
        extractor = UNetFeatureExtractor(
            hidden_dims=(model.hidden_dim,) * (down + 1), dtype=model.dtype)
        l_fmaps = extractor.apply(
            {"params": params["UNetFeatureExtractor_0"]}, left, train)
        r_fmaps = extractor.apply(
            {"params": params["UNetFeatureExtractor_0"]}, right, train)
        lf, rf = l_fmaps[0], r_fmaps[0]
        enc_stats = {}
    else:
        # encoder: sequential running-stat threading exactly like the Flax
        # model (one module applied to left then right, stereo_net.py:
        # 223-224); ResBlock convs run on the flat kernels (encoder_train)
        lf, upd1 = encoder_train(params["FeatureEncoder_0"],
                                 batch_stats["FeatureEncoder_0"], left,
                                 down=down, train=train, dtype=dtype,
                                 axis_name=axis_name)
        rf, enc_stats = encoder_train(params["FeatureEncoder_0"], upd1,
                                      right, down=down, train=train,
                                      dtype=dtype, axis_name=axis_name)

    vol = difference_cost_volume(lf, rf, vol_disp)
    cost, cf_upd = cost_filter_train(
        params["CostFilter3D_0"], batch_stats["CostFilter3D_0"], vol,
        train=train, dtype=dtype, axis_name=axis_name)
    x = soft_argmin(cost, axis=1)[..., None].astype(jnp.float32)

    multi_scale = []
    new_stats = {"CostFilter3D_0": cf_upd}
    if variant != "v3":
        new_stats["FeatureEncoder_0"] = enc_stats
    out_hw = left.shape[1:3]
    for i in range(down):
        if variant == "v3":
            l_g, r_g = l_fmaps[i + 1], r_fmaps[i + 1]
        else:
            l_g = left
            r_g = right if warp_guidance else None
        # disparity at this level is bounded by the model's design range
        # scaled to the level's width (+ headroom for refinement deltas)
        ms = (model.max_disp >> (down - 1 - i)) + 16
        x, rn_upd = refine_net_train(
            params[f"RefineNet_{i}"], batch_stats[f"RefineNet_{i}"],
            x, l_g, r_g,
            dilations=tuple(model.refine_dilates),
            warp_guidance=warp_guidance, train=train, dtype=dtype,
            axis_name=axis_name, max_shift=ms)
        new_stats[f"RefineNet_{i}"] = rn_upd
        multi_scale.append(_full_res_nearest(x, out_hw, orig_hw))
    return [-1.0 * m for m in multi_scale], new_stats


def make_fast_train_step(model, tx, loss_params: dict, mesh=None,
                         loss_type: str = "SequenceLoss"):
    """Kernel-path (state, batch) -> (state, metrics) step; same contract as
    train.trainer.make_train_step.

    With ``mesh`` (size > 1), the step runs under ``shard_map`` over the
    mesh's ``data`` axis: the batch is sharded, every shard runs the Pallas
    kernels on its local images, gradients are psum'd, and BatchNorm
    statistics / the masked loss mean reduce over the global batch.
    """
    import optax

    from realtime_stereo_matcher_tpu.train.loss import (
        build_loss_function,
        flow_map_metrics,
    )

    loss = build_loss_function({"type": loss_type, "parameters": loss_params})
    axis = "data" if mesh is not None and mesh.size > 1 else None

    def train_step(state, img1, img2, flow, valid):
        def loss_fn(prms):
            preds, new_bs = fast_train_forward(
                model, prms, state.batch_stats, img1, img2, train=True,
                axis_name=axis)
            return loss(preds, flow, valid, axis_name=axis), (preds, new_bs)

        (loss_val, (preds, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if axis is not None:
            # loss is the exact global masked mean (psum'd num/den inside);
            # its local backward yields partial grads -> sum over shards
            grads = jax.lax.psum(grads, axis)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = flow_map_metrics(flow, preds[-1], valid, axis_name=axis)
        metrics["live_loss"] = loss_val
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs,
                             opt_state=new_opt_state), metrics

    if axis is None:
        return train_step

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(
        train_step, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=(P(), P()),
        check_rep=False)


def fast_step_supported(model, exp_config, mesh=None) -> bool:
    """Whether the kernel train path applies: v1/v2 model, a data-only mesh
    (batch divisible over the ``data`` axis; ``spatial`` unsharded), and a
    crop size whose every refine level satisfies the flat-layout width
    constraint."""
    if not isinstance(model,
                      (MobileStereoNet, MobileStereoNetV2,
                       MobileStereoNetV3)):
        return False
    b = exp_config.train.batch_size
    if mesh is not None and mesh.size > 1:
        if dict(mesh.shape).get("spatial", 1) != 1:
            return False
        n_data = dict(mesh.shape).get("data", mesh.size)
        if b % n_data:
            return False
    try:
        h, w = exp_config.data.image_size
    except (AttributeError, TypeError, ValueError):
        return False
    down = model.down_factor
    # every refine level's width must be a multiple of the 4-px lane fold
    if w % (4 << (down - 1)) or h % (2 ** down):
        return False
    return True
