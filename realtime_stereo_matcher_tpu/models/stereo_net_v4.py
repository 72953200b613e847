"""MobileStereoNetV4 (cogsys-tuebingen MobileStereoNet, 2D variant).

TPU-native re-design of reference model/mobile_stereo_net_v4.py.  The
reference's single most TPU-hostile construct is its cost-volume builder
(:443-458): a 48-iteration Python loop, each iteration interleaving
variable-width slices of the left/right features and pushing them through a
depth-strided Conv3d stack.  Here that becomes dense batched compute:

1.  The first Conv3d of the reducer -- (1->16, k=(8,3,3), s=(8,1,1)) over
    the 64 interleaved channels -- is *linear in its input*, so its response
    to every (left, shifted-right) pair decomposes into two groups=8
    convolutions computed ONCE and combined per shift by a gather
    (InterweaveVolume.__call__): 48 lane-starved 8->16 convs become 3
    MXU-shaped 32->128 convs + a shift-gather + an exact one-column boundary
    correction.
2.  The remaining depth-strided Conv3d layers -- (4,3,3)/(2,3,3) with
    matching depth strides -- factorize *exactly* into 2D convolutions with
    depth-block reshapes, batched over all shifts at once, because each
    output depth consumes one non-overlapping depth window:

        conv2d 64->32    == Conv3d(16->32, k=(4,3,3), s=(4,1,1))
        conv2d 64->16    == Conv3d(32->16, k=(2,3,3), s=(2,1,1))

    (tests/test_model_v4.py proves numerical equivalence against a literal
    per-shift loop formulation in eval mode.)  2D convs are exactly what the
    MXU wants: large batched contractions, no dynamic shapes.
3.  Columns x < shift are zero-masked after *every* layer, so each conv sees
    exactly the zero padding the reference's per-shift sliced conv saw at its
    left edge, and the volume output zeros match the reference's sparse
    writes (``volume[:, :, i, :, i:]``).

Conscious deviation: the reference calls the same BatchNorm3d 48 times per
step (one per shift), so each shift is normalized by its own slice statistics
during training; the batched form normalizes over all shifts at once (a
strictly more stable estimator).  Eval-mode semantics are identical.

The train head path (4 supervision heads) / eval path (1 head) split follows
reference :470-520; heads upsample the (48, H/4, W/4) cost trilinearly to
(max_disp, H, W), softmax over disparity, and regress the expectation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from realtime_stereo_matcher_tpu.models.layers import (
    BN_EPS,
    BN_MOMENTUM,
    ConvBN,
    ConvTransposeBN,
    MobileV1Residual,
    MobileV2Residual,
    normalize_images,
    torch_pad,
)
from realtime_stereo_matcher_tpu.ops import (
    pad_to_multiple,
    soft_argmin_trilinear,
)


class FeatureExtraction(nn.Module):
    """MobileNet encoder at 1/4 res -> 320-ch concat of layer2/3/4
    (reference mobile_stereo_net_v4.py:151-205, add_relus=True).

    ``bn_groups=2``: the batch axis carries [left; right] stacked -- one
    batched pass whose BatchNorms normalize each view by its own statistics
    and thread the running updates sequentially (GroupedBatchNorm), exactly
    reproducing the reference's two sequential extractor calls
    (mobile_stereo_net_v4.py:434-441) at half the XLA op count.
    """

    bn_groups: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        er = 3
        bg = self.bn_groups
        # firstconv (1/2 res)
        x = MobileV2Residual(3, 32, 2, er, bn_groups=bg, dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = MobileV2Residual(32, 32, 1, er, bn_groups=bg, dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = MobileV2Residual(32, 32, 1, er, bn_groups=bg, dtype=self.dtype)(x, train)
        x = nn.relu(x)

        def make_layer(x, in_planes, planes, blocks, stride, pad, dilation):
            downsample = stride != 1 or in_planes != planes
            x = MobileV1Residual(in_planes, planes, stride, downsample, pad,
                                 dilation, bn_groups=bg, dtype=self.dtype)(x, train)
            for _ in range(1, blocks):
                x = MobileV1Residual(planes, planes, 1, False, pad, dilation,
                                     bn_groups=bg, dtype=self.dtype)(x, train)
            return x

        x = make_layer(x, 32, 32, 3, 1, 1, 1)       # layer1 (1/2)
        l2 = make_layer(x, 32, 64, 16, 2, 1, 1)     # layer2 (1/4)
        l3 = make_layer(l2, 64, 128, 3, 1, 1, 1)    # layer3 (1/4)
        l4 = make_layer(l3, 128, 128, 3, 1, 1, 2)   # layer4 (1/4, dilated)
        return jnp.concatenate([l2, l3, l4], axis=-1)  # 320 ch


class InterweaveVolume(nn.Module):
    """Interweave cost volume + factorized Conv3d reducer
    (reference mobile_stereo_net_v4.py:317-335,443-458) for all shifts at once.

    The per-shift work of the reference loop is 4 convolutions on an
    interleaved (left, shifted-right) tensor.  The first of them -- Conv3d
    (1->16, k=(8,3,3), s=(8,1,1)) over the 64 interleaved channels -- is
    *linear*, so its response to every shift decomposes into two convolutions
    computed ONCE:

        z_s[x] = convL(L)[x] + convR(R)[x - s]          (x > s)
        z_s[s] = convL(L)[s] - tapL(L)[s] + convR(R)[0]

    where convL/convR use the even/odd (left/right) kernel slices over the 8
    depth blocks (a groups=8 conv, 32ch -> 8x16), and tapL is the kernel's
    leftmost column only -- the exact correction for the zero the reference's
    sliced conv saw at its left boundary.  48 lane-starved 8->16 convolutions
    become 3 MXU-shaped 32->128 convolutions plus a shift-gather.

    The remaining 3 convs mix shifted features and must run per shift
    (batched over shifts).  Outputs are re-zeroed at columns x < s after
    every layer, so each layer sees exactly the zero padding the reference's
    per-shift sliced conv saw: the batched volume equals the literal loop
    (tests/test_model_v4.py) to float tolerance, structurally -- not only
    where ReLUs happen to clip the boundary columns.

    ``__call__(featL, featR) -> (B, S, H, W)`` volume with x < s zeroed;
    ``reduce_slice(x)`` applies the same parameters to one interleaved
    (N, H, W, 64) tensor with the reference's layer stack -- the test oracle.
    """

    n_shifts: int = 48
    chunk: int | None = None    # shifts per layer-2..4 pass (memory knob)
    dtype: jnp.dtype | None = None

    def setup(self):
        # Conv3d(1->16, k=(8,3,3), s=(8,1,1)) kernel; HWIO over the 8-channel
        # depth window, shared across the 8 depth blocks (in_channels == 1).
        self.conv3d0 = self.param(
            "conv3d0", nn.initializers.lecun_normal(), (3, 3, 8, 16))
        self.bn0 = nn.BatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                dtype=self.dtype)
        # Conv3d(16->32, k=(4,3,3), s=(4,1,1)): one (4 depth x 16)ch window
        # per output depth block, shared across the 2 blocks.
        self.conv1 = self.param(
            "conv1", nn.initializers.lecun_normal(), (3, 3, 64, 32))
        self.bn1 = nn.BatchNorm(momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                dtype=self.dtype)
        self.cb2 = ConvBN(16, kernel_size=(3, 3), padding=torch_pad(1),
                          dtype=self.dtype)
        self.cb3 = ConvBN(1, kernel_size=(1, 1), padding="VALID",
                          dtype=self.dtype)

    @staticmethod
    def _block_diag(k, blocks):
        """(3, 3, Ci, Co) kernel -> dense (3, 3, blocks*Ci, blocks*Co)
        block-diagonal kernel.  Keeps depth blocks in the channel axis:
        XLA's dense TPU convolution is ~8x faster than feature_group_count
        here, and the pre/post reshapes are free (no relayout)."""
        eye = jnp.eye(blocks, dtype=k.dtype)
        kh, kw, ci, co = k.shape
        kd = k[:, :, None, :, None, :] * eye[None, None, :, None, :, None]
        return kd.reshape(kh, kw, blocks * ci, blocks * co)

    def _conv(self, x, kern):
        return jax.lax.conv_general_dilated(
            x, kern.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def _tail(self, z, train, keep=None, b=1):
        """Layers 2-4 on the (N, H, W, 128) layer-1 output (channel layout:
        8 depth blocks x 16).  ``keep``: optional (N/b, W) column mask applied
        after every layer (the reference's sliced-conv zero boundary)."""
        n, h, w = z.shape[:3]

        def mask(y):
            if keep is None:
                return y
            full = keep[None, :, None, :].reshape(1, keep.shape[0], 1, w, 1)
            return jnp.where(full, y.reshape(b, -1, h, w, y.shape[-1]),
                             0.0).reshape(y.shape)

        zn = nn.relu(self.bn0(z.reshape(n, h, w, 8, 16),
                              use_running_average=not train))
        zn = mask(zn.reshape(n, h, w, 128))

        # Conv3d(16->32, k=(4,3,3), s=(4,1,1)): depth 8 -> 2 blocks of 4,
        # as one dense block-diagonal 128->64 conv (no batch/channel shuffle)
        y = self._conv(zn, self._block_diag(self.conv1, 2))
        y = nn.relu(self.bn1(y.reshape(n, h, w, 2, 32),
                             use_running_average=not train))
        y = mask(y.reshape(n, h, w, 64))

        # Conv3d(32->16, k=(2,3,3), s=(2,1,1)): depth 2 -> 1; the (2, 32)
        # block-major channel layout is already this conv's input layout
        y = mask(self.cb2(y, train))
        return self.cb3(y, train)                       # (N, H, W, 1)

    def volume_slab(self, featL, featR, s0, train: bool = False,
                    n_s: int | None = None):
        """(B, n_s, H, W) volume for global shifts [s0, s0 + n_s).

        ``s0`` may be a traced value (e.g. ``jax.lax.axis_index`` inside a
        ``shard_map`` over a ``disp`` mesh axis -- see
        parallel/disparity_sharding.py); ``n_s`` must be static.
        """
        b, h, w, c = featL.shape
        assert c == 32, f"interweave volume expects 32-channel features, got {c}"
        n_s = self.n_shifts if n_s is None else n_s

        k = self.conv3d0
        kl = self._block_diag(k[:, :, 0::2, :], 8)      # (3,3,32,128)
        kr = self._block_diag(k[:, :, 1::2, :], 8)
        kt = jnp.concatenate(
            [kl[:, :1], jnp.zeros_like(kl[:, 1:])], axis=1)
        # rightmost-column taps of convR: the reference's sliced conv sees
        # zero right-padding at the global last column, but full-width
        # convR(R) reads R[W - s] there -- corrected below (weight-transplant
        # parity vs the torch loop, tests/test_torch_parity.py)
        ktr = jnp.concatenate(
            [jnp.zeros_like(kr[:, :2]), kr[:, 2:]], axis=1)

        a = self._conv(featL, kl)   # (B, H, W, 128): channel = 16*blk + o
        bc = self._conv(featR, kr)
        ct = self._conv(featL, kt)  # leftmost-column taps of convL
        cr = self._conv(featR, ktr)

        colw = jnp.arange(w)
        shifts = s0 + jnp.arange(n_s)
        # in_bounds[j, x] for x >= shift j (2D mask, broadcast per use)
        keep = colw[None, :] >= shifts[:, None]             # (n_s, W)
        at_s = colw[None, :] == shifts[:, None]
        if isinstance(s0, int):
            # static shifts: column-0-replicated left fill reproduces the
            # clamped gather exactly, but autodiff transposes to pads/slices
            # instead of a 48-way scatter-add (XLA's TPU scatter lowering is
            # both slow to run and pathologically slow to compile here)
            def shifted(s):
                s = min(s, w - 1)
                if s == 0:
                    return bc
                fill = jnp.broadcast_to(bc[:, :, :1],
                                        (b, h, s, bc.shape[-1]))
                return jnp.concatenate([fill, bc[:, :, :w - s]], axis=2)

            stack = jnp.stack([shifted(s0 + j) for j in range(n_s)],
                              axis=1)                       # (B,n_s,H,W,C)
        else:
            idx = jnp.maximum(colw[None, :] - shifts[:, None], 0)
            stack = jnp.take(bc, idx, axis=2)               # (B,H,n_s,W,C)
            stack = jnp.transpose(stack, (0, 2, 1, 3, 4))   # (B,n_s,H,W,C)
        m = lambda q: q[None, :, None, :, None]
        z = a[:, None] + stack
        z = z - jnp.where(m(at_s), 1.0, 0.0) * ct[:, None]
        # right-edge: at global column W-1 (shift >= 1), remove convR's
        # right-tap contribution R[W - s] the sliced reference never saw
        if isinstance(s0, int):
            cr_last = jnp.stack(
                [cr[:, :, min(max(w - 1 - (s0 + j), 0), w - 1)]
                 for j in range(n_s)], axis=1)              # (B,n_s,H,C)
        else:
            last_idx = jnp.clip(w - 1 - shifts, 0, w - 1)   # (n_s,)
            cr_last = jnp.take(cr, last_idx, axis=2)        # (B,H,n_s,C)
            cr_last = jnp.transpose(cr_last, (0, 2, 1, 3))  # (B,n_s,H,C)
        rmask = (shifts >= 1)[None, :, None, None]
        z = z.at[:, :, :, w - 1, :].add(
            -jnp.where(rmask, cr_last, 0.0).astype(z.dtype))
        z = z.reshape(b * n_s, h, w, 128)

        red = self._tail(z, train, keep=keep, b=b)          # (B*n_s,H,W,1)
        vol = red.reshape(b, n_s, h, w)
        return jnp.where(keep[None, :, None, :], vol, 0.0)

    def __call__(self, featL, featR, train: bool = False):
        s_all = self.n_shifts
        chunk = self.chunk or s_all
        if chunk >= s_all:
            return self.volume_slab(featL, featR, 0, train)
        assert s_all % chunk == 0, (s_all, chunk)
        return jnp.concatenate(
            [self.volume_slab(featL, featR, i, train, n_s=chunk)
             for i in range(0, s_all, chunk)], axis=1)

    def reduce_slice(self, x, train: bool = False):
        """Reference-layer-stack oracle on one interleaved (N, H, W, 64)
        tensor (the reference's per-shift body, mobile_stereo_net_v4.py:
        317-335) with the same parameters as ``__call__``."""
        n, h, w, c2 = x.shape
        assert c2 == 64, f"interweave reducer expects 64 channels, got {c2}"

        # Conv3d(1->16, k=(8,3,3), s=(8,1,1)): 8 depth blocks of 8 -> batch
        y = x.reshape(n, h, w, 8, 8)                   # [blk, in-window]
        y = jnp.transpose(y, (0, 3, 1, 2, 4))          # (N, blk, H, W, 8)
        y = y.reshape(n * 8, h, w, 8)
        y = jax.lax.conv_general_dilated(
            y, self.conv3d0.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(n, 8, h, w, 16)
        y = jnp.transpose(y, (0, 2, 3, 1, 4)).reshape(n, h, w, 128)
        return self._tail(y, train)


class Hourglass2D(nn.Module):
    """2D hourglass aggregation (reference mobile_stereo_net_v4.py:223-288)."""

    in_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.in_channels
        er = 2
        conv1 = MobileV2Residual(c, c * 2, 2, er, dtype=self.dtype)(x, train)
        conv2 = MobileV2Residual(c * 2, c * 2, 1, er, dtype=self.dtype)(conv1, train)
        conv3 = MobileV2Residual(c * 2, c * 4, 2, er, dtype=self.dtype)(conv2, train)
        conv4 = MobileV2Residual(c * 4, c * 4, 1, er, dtype=self.dtype)(conv3, train)

        # ConvTranspose2d(k=3, s=2, p=1, output_padding=1) + BN: exact 2x.
        # torch puts the output_padding on the high side -> explicit
        # ((1, 2), (1, 2)), not 'SAME' (weight-transplant verified).
        p3 = ((1, 2), (1, 2))
        conv5 = ConvTransposeBN(c * 2, kernel_size=(3, 3), padding=p3,
                                dtype=self.dtype)(conv4, train)
        redir2 = MobileV2Residual(c * 2, c * 2, 1, er, dtype=self.dtype)(conv2, train)
        conv5 = nn.relu(conv5 + redir2)

        conv6 = ConvTransposeBN(c, kernel_size=(3, 3), padding=p3,
                                dtype=self.dtype)(conv5, train)
        redir1 = MobileV2Residual(c, c, 1, er, dtype=self.dtype)(x, train)
        return nn.relu(conv6 + redir1)


class Classif(nn.Module):
    """convbn+ReLU+conv head (reference mobile_stereo_net_v4.py:358-409)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.features, kernel_size=(3, 3), padding=torch_pad(1),
                   dtype=self.dtype)(x, train)
        x = nn.Conv(self.features, (3, 3), padding=torch_pad(1), use_bias=False,
                    dtype=self.dtype)(x)
        return x


class PreConv11(nn.Module):
    """1x1 channel squeeze 320 -> 256 -> 128 -> 64 -> 32 (reference :307-315).
    A single shared instance processes both views (``bn_groups=2`` when they
    arrive stacked along the batch axis)."""

    bn_groups: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for c in (256, 128, 64):
            x = ConvBN(c, kernel_size=(1, 1), padding="VALID",
                       bn_groups=self.bn_groups, dtype=self.dtype)(x, train)
        return nn.Conv(32, (1, 1), padding="VALID", use_bias=True,
                       dtype=self.dtype)(x)


class MobileStereoNetV4(nn.Module):
    """Reference model/mobile_stereo_net_v4.py:291-524.

    forward: (left, right) uint8-range NHWC -> list of (B, H, W, 1) negative
    disparity maps (4 supervision heads in train mode, 1 in eval).
    """

    max_disp: int = 192
    volume_size: int = 48
    hg_size: int = 48
    volume_chunk: int = 48  # shifts per reducer call (memory knob)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, left_img, right_img, train: bool = False):
        left = normalize_images(left_img, self.dtype)
        right = normalize_images(right_img, self.dtype)
        # The hourglass needs 1/16-divisible inputs; the reference assumes its
        # eval-time /64 padding, we make the model shape-safe on its own.
        left, orig_hw = pad_to_multiple(left, 16)
        right, _ = pad_to_multiple(right, 16)

        # TRAIN: one pair-batched pass over [left; right] -- GroupedBatchNorm
        # keeps the reference's per-view statistics and sequential running
        # updates (mobile_stereo_net_v4.py:434-441 calls the extractor on
        # left then right) while the convs run batched: half the XLA op
        # count of two passes on an op-overhead-bound encoder (67 -> 40 ms
        # of the fwd+bwd step at batch 6, 240x320).
        # EVAL: two per-view passes -- eval BN is a running-stats affine, so
        # the math is identical either way, but batch-2 convs at KITTI
        # shapes measure ~7 ms SLOWER than 2x batch-1 on v5e (round-2 note,
        # re-confirmed by the round-5 bisect of the 77 -> 47 FPS regression:
        # r1 two-pass 12.8 ms vs r3 pair-batched 21.2 ms).
        extractor = FeatureExtraction(bn_groups=2, dtype=self.dtype)
        preconv = PreConv11(bn_groups=2, dtype=self.dtype)
        if train:
            pair = jnp.concatenate([left, right], axis=0)
            feat = preconv(extractor(pair, train), train)
            featL, featR = feat[: left.shape[0]], feat[left.shape[0]:]
        else:
            featL = preconv(extractor(left, False), False)
            featR = preconv(extractor(right, False), False)

        volume = InterweaveVolume(
            n_shifts=self.volume_size,
            chunk=min(self.volume_chunk, self.volume_size),
            dtype=self.dtype)(featL, featR, train)        # (B, S, h, w)

        b, s, h, w = volume.shape
        cost = jnp.transpose(volume, (0, 2, 3, 1))  # NHWC, C = 48 shifts

        # dres0 / dres1 (reference :337-350,463-464)
        er = 3
        c0 = MobileV2Residual(self.volume_size, self.hg_size, 1, er,
                              dtype=self.dtype)(cost, train)
        c0 = nn.relu(c0)
        c0 = MobileV2Residual(self.hg_size, self.hg_size, 1, er,
                              dtype=self.dtype)(c0, train)
        cost0 = nn.relu(c0)
        d1 = MobileV2Residual(self.hg_size, self.hg_size, 1, er,
                              dtype=self.dtype)(cost0, train)
        d1 = nn.relu(d1)
        d1 = MobileV2Residual(self.hg_size, self.hg_size, 1, er,
                              dtype=self.dtype)(d1, train)
        cost0 = d1 + cost0

        out1 = Hourglass2D(self.hg_size, dtype=self.dtype)(cost0, train)
        out2 = Hourglass2D(self.hg_size, dtype=self.dtype)(out1, train)
        out3 = Hourglass2D(self.hg_size, dtype=self.dtype)(out2, train)

        out_hw = left.shape[1:3]

        # All four classif convs are always *called* so the parameter tree is
        # identical in train and eval mode; XLA dead-code-eliminates the
        # unused ones under train=False.  Only the expensive trilinear heads
        # are built conditionally.
        costs = [
            Classif(self.hg_size, dtype=self.dtype)(x, train)
            for x in (cost0, out1, out2, out3)
        ]

        def head(c):
            # (N, h, w, S) -> (N, S, h, w) -> fused trilinear-upsample
            # soft-argmin over (maxdisp, H, W) without materializing it.
            # The spatial resize stays in the model compute dtype (the
            # reference upsamples under fp16 autocast); softmax runs in f32.
            c = jnp.transpose(c, (0, 3, 1, 2))
            pred = soft_argmin_trilinear(c, self.max_disp, out_hw)  # (N,H,W)
            return pred[..., None]

        if train:
            # all 4 supervision heads share one batched head pass (identical
            # math; 1/4 the op-dispatch overhead of four separate heads)
            stacked = head(jnp.concatenate(costs, axis=0))    # (4B, H, W, 1)
            preds = list(jnp.split(stacked, 4, axis=0))
        else:
            preds = [head(costs[3])]
        return [
            -1.0 * p[:, : orig_hw[0], : orig_hw[1], :] for p in preds
        ]

