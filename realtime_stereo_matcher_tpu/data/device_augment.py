"""On-device (TPU) training augmentation: the host-pipeline bottleneck moved
into the jitted train step.

The reference augments on the host inside DataLoader workers
(reference dataset/augmentor.py:60-182).  Profiled on this 2-vCPU host, that
costs ~110 ms/sample (79 ms of it torchvision-semantics color jitter), gating
training end-to-end at 5-7x the device step time.  On a TPU the same math is
nearly free: the photometric ops are elementwise chains that XLA fuses, and
the joint resize+crop is one separable bilinear resampling expressed as two
small selection-matrix contractions on the MXU (the same trick as
``ops.warp_by_flow_map_matmul``).

Semantics mirror ``data/augment.py``'s ``FlowAugmentor`` (dense GT) with two
conscious deviations, both bounded and tested:

* no uint8 re-quantization between photometric ops (the host path rounds to
  uint8 after the jitter chain; device stays float -- difference < 1 gray
  level per op);
* random draws come from ``jax.random`` instead of ``numpy.random`` -- the
  distributions match, the streams do not (they never needed to: the host
  path's stream depends on worker scheduling history anyway).

Layout contract: per-sample images are (H, W, 3) float32 in [0, 255]; flow is
(H, W, 1) carrying the x-component only (stereo flow_y is identically 0,
data/datasets.py sample contract).  Batched entry points vmap over the
leading axis with per-sample folded keys, so results are independent of the
data-parallel sharding.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentSpec:
    """Static augmentation hyperparameters (FlowAugmentor ctor surface)."""

    src_hw: tuple  # raw sample (H, W) -- fixed-shape sources only
    crop_size: tuple
    min_scale: float = -0.2
    max_scale: float = 0.5
    do_flip: object = False  # False | "h" | "hf" | "v"
    yjitter: bool = False
    brightness: tuple = (0.6, 1.4)
    contrast: tuple = (0.6, 1.4)
    saturation: tuple = (0.6, 1.4)
    hue: float = 0.5 / 3.14
    gamma: tuple = (1.0, 1.0, 1.0, 1.0)
    asymmetric_prob: float = 0.2
    eraser_prob: float = 0.5
    eraser_bounds: tuple = (50, 100)
    stretch_prob: float = 0.8
    max_stretch: float = 0.2

    @classmethod
    def from_aug_params(cls, aug_params: dict, src_hw) -> "AugmentSpec":
        """Build from the config's augmentor kwargs (config.aug_params())."""
        p = dict(aug_params)
        kw = {
            "src_hw": tuple(src_hw),
            "crop_size": tuple(p.pop("crop_size")),
            "min_scale": p.pop("min_scale", -0.2),
            "max_scale": p.pop("max_scale", 0.5),
            "do_flip": p.pop("do_flip", False),
            "yjitter": p.pop("yjitter", False),
        }
        if "saturation_range" in p:
            kw["saturation"] = tuple(p.pop("saturation_range"))
        if "gamma" in p:
            kw["gamma"] = tuple(p.pop("gamma"))
        assert not p, f"unsupported aug params for device augment: {p}"
        return cls(**kw)


# ---------------------------------------------------------------------------
# photometric primitives (same formulas as data/augment.py, jnp)
# ---------------------------------------------------------------------------


def _blend(a, b, f):
    return jnp.clip(f * a + (1.0 - f) * b, 0.0, 255.0)


def _gray(x):
    return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]


def adjust_hue(x, shift):
    """Hue rotation by ``shift`` turns (data/augment.py adjust_hue, jnp)."""
    xn = x / 255.0
    mx = xn.max(-1)
    mn = xn.min(-1)
    diff = mx - mn + 1e-12
    r, g, b = xn[..., 0], xn[..., 1], xn[..., 2]
    h = jnp.where(mx == b, (r - g) / diff + 4,
                  jnp.where(mx == g, (b - r) / diff + 2,
                            ((g - b) / diff) % 6))
    h = (h / 6.0 + shift) % 1.0
    s = jnp.where(mx > 0, diff / (mx + 1e-12), 0.0)
    v = mx
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    # mask-weighted sums, not gathers: TPU gathers over the sextant index are
    # ~20x slower than these fused elementwise selects (and under vmap the
    # color-op switch runs every branch, so hue must be cheap)
    sel = [(i == k).astype(x.dtype) for k in range(6)]

    def pick(opts):
        return sum(s * o for s, o in zip(sel, opts))

    ch_r = pick((v, q, p, p, t, v))
    ch_g = pick((t, v, v, q, p, p))
    ch_b = pick((p, p, t, v, v, q))
    return jnp.clip(jnp.stack([ch_r, ch_g, ch_b], -1) * 255.0, 0.0, 255.0)


def _apply_color_op(x, op, factor, mean):
    """One ColorJitter op by index: 0=brightness 1=contrast 2=sat 3=hue."""
    return jax.lax.switch(op, [
        lambda x: _blend(x, jnp.zeros_like(x), factor),
        lambda x: _blend(x, jnp.full_like(x, mean), factor),
        lambda x: _blend(x, jnp.broadcast_to(_gray(x)[..., None], x.shape),
                         factor),
        lambda x: adjust_hue(x, factor),
    ], x)


def _color_pair(x1, x2, p, spec: AugmentSpec):
    """Random-order jitter on the pair.

    Symmetric mode (shared order/factors) is exactly the host path's
    stacked-pair jitter: every op is pixelwise except contrast, whose mean is
    taken jointly over both images (the stacked image's mean) -- reproduced
    here as the average of the two per-image means (equal pixel counts).
    """
    order, factors, asym = p["color_order"], p["color_factors"], p["asym"]

    def step(i, xs):
        x1, x2 = xs
        m1 = _gray(x1).mean()
        m2 = _gray(x2).mean()
        mj = 0.5 * (m1 + m2)
        mean1 = jnp.where(asym, m1, mj)
        mean2 = jnp.where(asym, m2, mj)
        o1, o2 = order[0, i], order[1, i]
        x1 = _apply_color_op(x1, o1, factors[0, o1], mean1)
        x2 = _apply_color_op(x2, o2, factors[1, o2], mean2)
        return (x1, x2)

    x1, x2 = jax.lax.fori_loop(0, 4, step, (x1, x2))
    if tuple(spec.gamma) != (1.0, 1.0, 1.0, 1.0):
        g, gain = p["gamma"], p["gamma_gain"]
        x1 = jnp.clip(255.0 * gain[0] * (x1 / 255.0) ** g[0], 0.0, 255.0)
        x2 = jnp.clip(255.0 * gain[1] * (x2 / 255.0) ** g[1], 0.0, 255.0)
    return x1, x2


def _eraser(x2, p, spec: AugmentSpec):
    """Rectangle occlusions on img2, filled with its (pre-eraser) mean color
    (FlowAugmentor.eraser_transform)."""
    h, w = spec.src_hw
    mean_c = x2.reshape(-1, 3).mean(0)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    mask = jnp.zeros((h, w), bool)
    rects = p["eraser_rects"]  # (2, 4) [x0, y0, dx, dy]
    active = jnp.stack([p["eraser_on"],
                        p["eraser_on"] & p["eraser_two"]])
    for r in range(2):
        x0, y0, dx, dy = rects[r]
        inside = (xx >= x0) & (xx < x0 + dx) & (yy >= y0) & (yy < y0 + dy)
        mask = mask | (inside & active[r])
    return jnp.where(mask[..., None], mean_c, x2)


# ---------------------------------------------------------------------------
# spatial: joint resize+crop as separable bilinear selection matrices
# ---------------------------------------------------------------------------


def _sel_matrix(coords, n):
    """(m,) sample positions -> (m, n) bilinear row-selection matrix with
    replicate borders (cv2 INTER_LINEAR semantics)."""
    coords = jnp.clip(coords, 0.0, n - 1.0)
    i0 = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, n - 2)
    f = coords - i0
    cols = jnp.arange(n)[None, :]
    m0 = (cols == i0[:, None]) * (1.0 - f)[:, None]
    m1 = (cols == (i0 + 1)[:, None]) * f[:, None]
    return m0 + m1


def _resample(img, ys, xs):
    """Bilinear-sample (H, W, C) at the outer product of ys x xs -- two MXU
    contractions instead of a TPU-hostile elementwise gather."""
    h, w = img.shape[:2]
    ry = _sel_matrix(ys, h)
    rx = _sel_matrix(xs, w)
    tmp = jnp.einsum("oh,hwc->owc", ry, img)
    return jnp.einsum("pw,owc->opc", rx, tmp)


def _spatial(x1, x2, flow, p, spec: AugmentSpec):
    h, w = spec.src_hw
    ch, cw = spec.crop_size
    sx, sy = p["scale_x"], p["scale_y"]
    # cv2.resize maps dst->src with the *rounded* output size's ratio
    nh = jnp.round(h * sy)
    nw = jnp.round(w * sx)

    if spec.do_flip:
        # flips commute with the (mirror-symmetric) resize, so apply them on
        # the source; reference order is resize -> flip -> crop
        if spec.do_flip == "hf":
            do = p["flip_h"]
            fx1, fx2 = x1[:, ::-1], x2[:, ::-1]
            x1 = jnp.where(do, fx1, x1)
            x2 = jnp.where(do, fx2, x2)
            flow = jnp.where(do, -flow[:, ::-1], flow)
        elif spec.do_flip == "h":
            do = p["flip_h"]
            # reference quirk mirrored: views swap, flow is NOT remapped
            nx1 = jnp.where(do, x2[:, ::-1], x1)
            nx2 = jnp.where(do, x1[:, ::-1], x2)
            x1, x2 = nx1, nx2
        elif spec.do_flip == "v":
            do = p["flip_v"]
            x1 = jnp.where(do, x1[::-1], x1)
            x2 = jnp.where(do, x2[::-1], x2)
            flow = jnp.where(do, flow[::-1], flow)  # flow_y == 0 unaffected

    if spec.yjitter:
        y0 = 2.0 + jnp.floor(p["crop_u"] * (nh - ch - 4))
        x0 = 2.0 + jnp.floor(p["crop_v"] * (nw - cw - 4))
        y1 = y0 + p["yjitter_delta"]
    else:
        y0 = jnp.floor(p["crop_u"] * (nh - ch))
        x0 = jnp.floor(p["crop_v"] * (nw - cw))
        y1 = y0
    ys = (y0 + jnp.arange(ch) + 0.5) * (h / nh) - 0.5
    ys2 = (y1 + jnp.arange(ch) + 0.5) * (h / nh) - 0.5
    xs = (x0 + jnp.arange(cw) + 0.5) * (w / nw) - 0.5
    x1 = _resample(x1, ys, xs)
    x2 = _resample(x2, ys2, xs)
    # flow x-values scale by the *unrounded* scale_x (FlowAugmentor :283)
    flow = _resample(flow, ys, xs) * sx
    return x1, x2, flow


# ---------------------------------------------------------------------------
# parameter sampling + single-sample / batched entry points
# ---------------------------------------------------------------------------


def draw_params(key, spec: AugmentSpec) -> dict:
    """Sample one call's worth of augmentation randomness (a pytree)."""
    h, w = spec.src_hw
    ch, cw = spec.crop_size
    ks = jax.random.split(key, 12)
    u = lambda k, lo, hi: jax.random.uniform(k, (), minval=lo, maxval=hi)

    ord_a = jax.random.permutation(ks[0], 4)
    ord_b = jax.random.permutation(ks[1], 4)
    f_a = jnp.stack([u(jax.random.fold_in(ks[2], i), lo, hi)
                     for i, (lo, hi) in enumerate(
                         [spec.brightness, spec.contrast, spec.saturation,
                          (-spec.hue, spec.hue)])])
    f_b = jnp.stack([u(jax.random.fold_in(ks[3], i), lo, hi)
                     for i, (lo, hi) in enumerate(
                         [spec.brightness, spec.contrast, spec.saturation,
                          (-spec.hue, spec.hue)])])
    asym = u(ks[4], 0.0, 1.0) < spec.asymmetric_prob
    gmin, gmax, gainmin, gainmax = spec.gamma
    g_a = jnp.stack([u(jax.random.fold_in(ks[5], 0), gmin, gmax),
                     u(jax.random.fold_in(ks[5], 1), gmin, gmax)])
    gain_a = jnp.stack([u(jax.random.fold_in(ks[5], 2), gainmin, gainmax),
                        u(jax.random.fold_in(ks[5], 3), gainmin, gainmax)])

    eb0, eb1 = spec.eraser_bounds
    er = jax.random.uniform(ks[6], (2, 4))
    rects = jnp.stack([jnp.floor(er[:, 0] * w),
                       jnp.floor(er[:, 1] * h),
                       eb0 + jnp.floor(er[:, 2] * (eb1 - eb0)),
                       eb0 + jnp.floor(er[:, 3] * (eb1 - eb0))], axis=-1)

    min_s = max((ch + 8) / h, (cw + 8) / w)
    scale = 2.0 ** u(ks[7], spec.min_scale, spec.max_scale)
    do_stretch = u(jax.random.fold_in(ks[7], 1), 0.0, 1.0) < spec.stretch_prob
    st_x = 2.0 ** u(jax.random.fold_in(ks[7], 2),
                    -spec.max_stretch, spec.max_stretch)
    st_y = 2.0 ** u(jax.random.fold_in(ks[7], 3),
                    -spec.max_stretch, spec.max_stretch)
    scale_x = jnp.maximum(scale * jnp.where(do_stretch, st_x, 1.0), min_s)
    scale_y = jnp.maximum(scale * jnp.where(do_stretch, st_y, 1.0), min_s)

    return {
        "color_order": jnp.stack([ord_a, jnp.where(asym, ord_b, ord_a)]),
        "color_factors": jnp.stack([f_a, jnp.where(asym, f_b, f_a)]),
        "asym": asym,
        "gamma": jnp.where(asym, g_a, g_a[0]),
        "gamma_gain": jnp.where(asym, gain_a, gain_a[0]),
        "eraser_on": u(ks[8], 0.0, 1.0) < spec.eraser_prob,
        "eraser_two": u(jax.random.fold_in(ks[8], 1), 0.0, 1.0) < 0.5,
        "eraser_rects": rects,
        "scale_x": scale_x,
        "scale_y": scale_y,
        "crop_u": u(ks[9], 0.0, 1.0),
        "crop_v": u(jax.random.fold_in(ks[9], 1), 0.0, 1.0),
        "yjitter_delta": jnp.floor(
            jax.random.uniform(ks[10], ()) * 5.0) - 2.0,
        "flip_h": u(ks[11], 0.0, 1.0) < 0.5,
        "flip_v": u(jax.random.fold_in(ks[11], 1), 0.0, 1.0) < 0.1,
    }


def apply_augment(spec: AugmentSpec, p: dict, img1, img2, flow):
    """Deterministic augmentation given pre-drawn params (testable core).

    img1/img2: (H, W, 3) any dtype in [0, 255]; flow: (H, W, 1) float32.
    Returns (img1, img2, flow, valid) at crop_size, float32.
    """
    x1 = img1.astype(jnp.float32)
    x2 = img2.astype(jnp.float32)
    flow = flow.astype(jnp.float32)
    x1, x2 = _color_pair(x1, x2, p, spec)
    x2 = _eraser(x2, p, spec)
    x1, x2, flow = _spatial(x1, x2, flow, p, spec)
    # dense-GT valid recompute (data/datasets.py _get: |flow| < 512; the
    # y-component is identically zero for stereo)
    valid = (jnp.abs(flow[..., 0]) < 512).astype(jnp.float32)
    return x1, x2, flow, valid


def make_device_augment(spec: AugmentSpec):
    """Batched jittable augment: (key, img1, img2, flow) -> augmented batch.

    Inputs are (B, H, W, 3) uint8/float images and (B, H, W, 1) flow; the key
    is split per sample, so outputs don't depend on device sharding.
    """

    def one(key, i1, i2, fl):
        return apply_augment(spec, draw_params(key, spec), i1, i2, fl)

    def batched(key, img1, img2, flow):
        keys = jax.random.split(key, img1.shape[0])
        return jax.vmap(one)(keys, img1, img2, flow)

    return batched
