"""Resize / warp ops vs. torch reference semantics.

torch (CPU) is used *only in tests* as the ground-truth oracle for the
interpolate/grid_sample semantics the reference framework relies on.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from realtime_stereo_matcher_tpu.ops import (
    grid_sample_2d,
    resize_bilinear,
    resize_nearest,
    resize_trilinear,
    warp_by_flow_map,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def _nhwc(x_nchw):
    return x_nchw.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("in_hw,out_hw", [((7, 9), (14, 18)), ((8, 10), (5, 7)),
                                          ((6, 8), (13, 3)), ((60, 80), (480, 640))])
def test_resize_bilinear_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    want = _nhwc(F.interpolate(_nchw(x), out_hw, mode="bilinear",
                               align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((7, 9), (14, 18)), ((8, 10), (5, 7)),
                                          ((60, 80), (480, 640))])
def test_resize_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    want = _nhwc(F.interpolate(_nchw(x), out_hw))  # torch default = nearest
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("in_dhw,out_dhw", [((4, 6, 8), (12, 24, 32)),
                                            ((48, 16, 20), (192, 64, 80))])
def test_resize_trilinear_matches_torch(rng, in_dhw, out_dhw):
    x = rng.standard_normal((1, *in_dhw), dtype=np.float32)
    got = np.asarray(resize_trilinear(jnp.asarray(x), out_dhw))
    xt = torch.from_numpy(x)[:, None]  # (B, 1, D, H, W)
    want = F.interpolate(xt, out_dhw, mode="trilinear",
                         align_corners=False)[:, 0].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_matches_torch(rng):
    b, h, w, c = 2, 12, 17, 4
    img = rng.standard_normal((b, h, w, c), dtype=np.float32)
    # sample coords spanning in and out of bounds
    x_pix = rng.uniform(-3, w + 2, size=(b, h, w)).astype(np.float32)
    y_pix = rng.uniform(-3, h + 2, size=(b, h, w)).astype(np.float32)

    got = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(x_pix),
                                    jnp.asarray(y_pix)))

    # torch oracle: convert pixel coords back to align_corners=False normalized
    gx = (2.0 * torch.from_numpy(x_pix) + 1.0) / w - 1.0
    gy = (2.0 * torch.from_numpy(y_pix) + 1.0) / h - 1.0
    grid = torch.stack([gx, gy], dim=-1)
    want = _nhwc(F.grid_sample(_nchw(img), grid, mode="bilinear",
                               padding_mode="zeros", align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warp_by_flow_map_matches_reference_semantics(rng):
    """Oracle reproduces the reference warp math (mobile_stereo_net_v2.py:59-96)
    with torch primitives: normalized grid 2x/(W-1)-1, align_corners=False."""
    b, h, w, c = 1, 10, 14, 3
    img = rng.standard_normal((b, h, w, c), dtype=np.float32)
    flow = rng.uniform(-4, 4, size=(b, h, w, 1)).astype(np.float32)

    got = np.asarray(warp_by_flow_map(jnp.asarray(img), jnp.asarray(flow)))

    image_t = _nchw(img)
    flow_t = torch.from_numpy(flow).permute(0, 3, 1, 2)
    grid_y, grid_x = torch.meshgrid(
        torch.arange(h, dtype=torch.float32),
        torch.arange(w, dtype=torch.float32), indexing="ij")
    gx = grid_x.view(1, 1, h, w) - flow_t[:, 0].view(b, 1, h, w)
    gx = gx.permute(0, 2, 3, 1)
    gy = grid_y.view(1, h, w, 1).repeat(b, 1, 1, 1)
    gx = 2.0 * gx / (w - 1.0) - 1.0
    gy = 2.0 * gy / (h - 1.0) - 1.0
    grid = torch.cat([gx, gy], dim=-1)
    want = _nhwc(F.grid_sample(image_t, grid, mode="bilinear",
                               padding_mode="zeros", align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_banded_warp_matches_gather_warp(rng):
    import jax.numpy as jnp

    from realtime_stereo_matcher_tpu.ops import (
        warp_by_flow_map,
        warp_by_flow_map_banded,
    )

    img = jnp.asarray(rng.standard_normal((2, 10, 48, 3)).astype(np.float32))
    # the models warp by POSITIVE disparity (stereo_net.py RefineNet)
    flow = jnp.asarray(rng.uniform(0, 20, (2, 10, 48, 1)).astype(np.float32))

    want = warp_by_flow_map(img, flow)
    got = warp_by_flow_map_banded(img, flow, max_shift=20)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # gradients agree too (both image and flow)
    def loss(fn):
        def f(im, fl):
            out = fn(im, fl) if fn is warp_by_flow_map else fn(im, fl, 20)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    import jax
    g_ref = jax.grad(loss(warp_by_flow_map), argnums=(0, 1))(img, flow)
    g_new = jax.grad(loss(warp_by_flow_map_banded), argnums=(0, 1))(img, flow)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_matmul_warp_matches_gather_warp(rng):
    import jax
    import jax.numpy as jnp

    from realtime_stereo_matcher_tpu.ops import (
        warp_by_flow_map,
        warp_by_flow_map_matmul,
    )

    img = jnp.asarray(rng.standard_normal((2, 10, 48, 5)).astype(np.float32))
    # no band limit: include flows past the image edge (zeros padding) and
    # slightly negative values (refine deltas can momentarily overshoot)
    flow = jnp.asarray(rng.uniform(-3, 60, (2, 10, 48, 1)).astype(np.float32))

    want = warp_by_flow_map(img, flow)
    got = warp_by_flow_map_matmul(img, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        def f(im, fl):
            return jnp.sum(fn(im, fl).astype(jnp.float32) ** 2)
        return f

    g_ref = jax.grad(loss(warp_by_flow_map), argnums=(0, 1))(img, flow)
    g_new = jax.grad(loss(warp_by_flow_map_matmul), argnums=(0, 1))(img, flow)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_matmul_warp_bf16_production_dtype(rng):
    """The production path runs bf16 images with an f32 flow; pin its
    numerics to the bf16 gather path (weight truncation + f32-accumulated
    dot_general)."""
    import jax.numpy as jnp

    from realtime_stereo_matcher_tpu.ops import (
        warp_by_flow_map,
        warp_by_flow_map_matmul,
    )

    img = jnp.asarray(rng.standard_normal((2, 10, 48, 32)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-3, 40, (2, 10, 48, 1)).astype(np.float32))

    want = np.asarray(warp_by_flow_map(img.astype(jnp.bfloat16), flow),
                      np.float32)
    got = np.asarray(warp_by_flow_map_matmul(img.astype(jnp.bfloat16), flow),
                     np.float32)
    # both paths quantize taps/weights to bf16; accumulation differs (f32
    # dot_general vs elementwise) -> one-bf16-ulp tolerance on O(1) values
    np.testing.assert_allclose(got, want, rtol=0.03, atol=0.03)


def test_matmul_warp_row_block_tiling(rng):
    """Row-block scan (memory bounding) must be exact vs the one-shot path,
    value and grads."""
    import jax
    import jax.numpy as jnp

    from realtime_stereo_matcher_tpu.ops import warp_by_flow_map_matmul

    img = jnp.asarray(rng.standard_normal((2, 12, 32, 5)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(0, 20, (2, 12, 32, 1)).astype(np.float32))

    want = warp_by_flow_map_matmul(img, flow, row_block=12)   # single block
    for rb in (1, 3, 4, 6):
        got = warp_by_flow_map_matmul(img, flow, row_block=rb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def loss(rb):
        def f(im, fl):
            out = warp_by_flow_map_matmul(im, fl, row_block=rb)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    g_ref = jax.grad(loss(12), argnums=(0, 1))(img, flow)
    g_new = jax.grad(loss(3), argnums=(0, 1))(img, flow)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_banded_matmul_warp_matches_gather_warp(rng):
    """In-band flows: banded x-tiled selection warp == gather warp, values
    and grads; exercises multiple x-tiles and the edge-window clamps."""
    import jax
    import jax.numpy as jnp

    from realtime_stereo_matcher_tpu.ops import (
        warp_by_flow_map,
        warp_by_flow_map_matmul_banded,
    )

    # W = 300 -> 3 x-tiles (two full 128s + a 44 remainder)
    img = jnp.asarray(rng.standard_normal((2, 6, 300, 5)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(0, 40, (2, 6, 300, 1)).astype(np.float32))

    want = warp_by_flow_map(img, flow)
    got = warp_by_flow_map_matmul_banded(img, flow, max_shift=40)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        def f(im, fl):
            out = fn(im, fl) if fn is warp_by_flow_map else fn(im, fl, 40)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    g_ref = jax.grad(loss(warp_by_flow_map), argnums=(0, 1))(img, flow)
    g_new = jax.grad(loss(warp_by_flow_map_matmul_banded),
                     argnums=(0, 1))(img, flow)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_banded_matmul_warp_out_of_band_is_zero(rng):
    """Out-of-band flows contribute zero (warp_by_flow_map_banded's
    contract), in-band pixels stay exact."""
    import jax.numpy as jnp

    from realtime_stereo_matcher_tpu.ops import (
        warp_by_flow_map,
        warp_by_flow_map_matmul_banded,
    )

    img = jnp.asarray(rng.standard_normal((1, 4, 160, 3)).astype(np.float32))
    flow = np.full((1, 4, 160, 1), 5.0, np.float32)
    flow[0, :, 100:120, 0] = 90.0         # beyond max_shift=16
    flow = jnp.asarray(flow)

    got = np.asarray(warp_by_flow_map_matmul_banded(img, flow, max_shift=16))
    want = np.asarray(warp_by_flow_map(img, flow))
    np.testing.assert_allclose(got[0, :, :100], want[0, :, :100],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[0, :, 120:], want[0, :, 120:],
                               rtol=1e-5, atol=1e-5)
    assert np.all(got[0, :, 100:120] == 0.0)


def test_banded_matmul_warp_row_block_and_bf16(rng):
    """Row-block tiling is exact; bf16 matches the bf16 gather path."""
    import jax.numpy as jnp

    from realtime_stereo_matcher_tpu.ops import (
        warp_by_flow_map,
        warp_by_flow_map_matmul_banded,
    )

    img = jnp.asarray(rng.standard_normal((2, 12, 160, 32)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(0, 30, (2, 12, 160, 1)).astype(np.float32))

    want = warp_by_flow_map_matmul_banded(img, flow, 30, row_block=12)
    for rb in (1, 4, 6):
        got = warp_by_flow_map_matmul_banded(img, flow, 30, row_block=rb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    want16 = np.asarray(warp_by_flow_map(img.astype(jnp.bfloat16), flow),
                        np.float32)
    got16 = np.asarray(
        warp_by_flow_map_matmul_banded(img.astype(jnp.bfloat16), flow, 30),
        np.float32)
    np.testing.assert_allclose(got16, want16, rtol=0.03, atol=0.03)
