"""End-to-end multi-device stereo inference (disparity + spatial sharding).

Composes the disparity-axis cost-volume sharding
(parallel/disparity_sharding.py) into a runnable full forward for
MobileStereoNet -- the "720p+" scaling lever from SURVEY.md §2.3:

* stage 1 (encoder): jit over a ``spatial`` mesh view -- image rows are
  sharded across devices; XLA's partitioner inserts the conv halo exchanges;
* stage 2 (coarse): the O(C*D*h*w) cost volume + 5-layer 3D filter +
  soft-argmin run under ``shard_map`` over a ``disp`` mesh view -- each
  device owns a disparity slab, combining only at the soft-argmin
  (pmax/psum of scalar fields);
* stage 3 (refines): the RGB-guided refinement cascade, jit-sharded over
  ``spatial`` again (dilated convs at full resolution are the FLOPs here).

The stages are separate jits on the same devices; XLA reshards between them
(features are ~D/n smaller than the volume, so replicating them into stage 2
is the cheap direction).  Output is parity-tested against the single-device
``model.apply`` on the 8-device CPU mesh (tests/test_sharded_infer.py).

Shard-count rule: the spatial shard count is chosen per input shape so that
EVERY pyramid level's row count divides evenly (largest k <= n_devices
dividing padded_H / 2^down_factor).  With uneven shards XLA's SPMD
partitioner miscompiles chains of strided convolutions (reproduced on the
CPU backend: 3 chained stride-2 convs, 32 rows over 8 shards -> max error
~1.1 vs the unsharded result, single conv exact); even shards at every
level sidestep it and are also the only layout with balanced halo traffic.

Reference semantics throughout: model/mobile_stereo_net.py:120-158.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from realtime_stereo_matcher_tpu.models.layers import normalize_images
from realtime_stereo_matcher_tpu.models.stereo_net import (
    FeatureEncoder,
    RefineNet,
    _full_res_nearest,
)
from realtime_stereo_matcher_tpu.ops import pad_to_multiple
from realtime_stereo_matcher_tpu.parallel.disparity_sharding import (
    make_sharded_coarse_fn,
)


def make_sharded_infer(model, variables, devices=None, dtype=None):
    """Build ``f(left, right) -> [negative disparity maps]`` running
    MobileStereoNet v1/v2/v3 over all ``devices`` with disparity+spatial
    sharding.

    ``variables`` is the model's ``{"params", "batch_stats"}``.  Stage
    functions are built (and jitted) once per distinct input shape.

    Variant differences (models/stereo_net.py; reference
    model/mobile_stereo_net{,_v2,_v3}.py):
    * v1: FeatureEncoder; refines guided by the left RGB only.
    * v2: v1 + the right RGB warped by the running disparity (the warp is a
      per-row horizontal gather -- row sharding is communication-free there).
    * v3: U-Net pyramid extractor; refines consume pyramid features of both
      views (right features warped via the selection-matrix warp, also
      row-local).
    """
    from realtime_stereo_matcher_tpu.models import (
        MobileStereoNet,
        MobileStereoNetV2,
        MobileStereoNetV3,
    )
    from realtime_stereo_matcher_tpu.models.stereo_net import (
        UNetFeatureExtractor,
    )

    from realtime_stereo_matcher_tpu.models import MobileStereoNetV4

    if isinstance(model, MobileStereoNetV4):
        return make_sharded_infer_v4(model, variables, devices=devices,
                                     dtype=dtype)
    if isinstance(model, MobileStereoNetV3):
        variant = "v3"
    elif isinstance(model, MobileStereoNetV2):
        variant = "v2"
    elif isinstance(model, MobileStereoNet):
        variant = "v1"
    else:
        # MobileDispNetC is consciously exempt: at 3.98 ms / 251 FPS for a
        # KITTI-size frame on ONE chip (BASELINE.md) there is no disparity
        # or spatial extent left to shard profitably -- its correlation
        # volume is 48 levels at 1/4 res of a tiny hidden_dim-8 encoder.
        raise NotImplementedError(
            f"{type(model).__name__}: no sharded-inference composition "
            "(DispNetC is single-chip by design; see BASELINE.md)")
    warp_guidance = variant in ("v2", "v3")
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dev = np.asarray(devices)

    params = variables["params"]
    stats = variables["batch_stats"]
    align = 2 ** model.down_factor
    vol_disp = (model.max_disp + 1) // align
    # disparity shards must divide the volume depth; small volumes use a
    # device subset for the coarse stage
    n_disp = math.gcd(vol_disp, n)
    mesh_disp = Mesh(dev[:n_disp], ("disp",))

    if variant == "v3":
        encoder = UNetFeatureExtractor(
            hidden_dims=(model.hidden_dim,) * (model.down_factor + 1),
            dtype=dtype)
        enc_vars = {"params": params["UNetFeatureExtractor_0"]}
    else:
        encoder = FeatureEncoder(model.hidden_dim, model.down_factor,
                                 dtype=dtype)
        enc_vars = {"params": params["FeatureEncoder_0"],
                    "batch_stats": stats["FeatureEncoder_0"]}

    refine_mods = []
    for i in range(model.down_factor):
        name = f"RefineNet_{i}"
        refine_mods.append((
            RefineNet(model.hidden_dim, model.refine_dilates,
                      warp_guidance=warp_guidance, dtype=dtype),
            {"params": params[name], "batch_stats": stats[name]},
        ))

    coarse_fn = make_sharded_coarse_fn(
        mesh_disp, params["CostFilter3D_0"], stats["CostFilter3D_0"],
        vol_disp, hidden_dim=model.hidden_dim, dtype=dtype)

    def _n_spatial(padded_h: int) -> int:
        """Largest shard count <= n with every pyramid level divisible (see
        module docstring: uneven shards miscompile strided-conv chains)."""
        coarse_rows = padded_h // align
        for k in range(min(n, coarse_rows), 0, -1):
            if coarse_rows % k == 0:
                return k
        return 1

    stage_cache: dict = {}

    def _stages(padded_h: int):
        if padded_h in stage_cache:
            return stage_cache[padded_h]
        n_sp = _n_spatial(padded_h)
        mesh_sp = Mesh(dev[:n_sp], ("spatial",))
        rows = NamedSharding(mesh_sp, P(None, "spatial"))
        repl = NamedSharding(mesh_sp, P())

        if variant == "v3":
            # pyramid levels stay row-sharded except the coarsest (feeds the
            # replicated->disp-sharded coarse stage)
            pyr_shard = (repl,) + (rows,) * model.down_factor
            out_sh = (rows, rows, pyr_shard, pyr_shard)
        else:
            out_sh = (rows, rows, repl, repl)

        @partial(jax.jit, out_shardings=out_sh)
        def stage_encode(left, right):
            # inputs already normalized + padded (forward below)
            lf = encoder.apply(enc_vars, left, False)
            rf = encoder.apply(enc_vars, right, False)
            if variant == "v3":
                lf, rf = tuple(lf), tuple(rf)
            # coarse features leave replicated (cheap: 1/8 res); padded
            # images / finer pyramid levels stay row-sharded for the refines
            return left, right, lf, rf

        @partial(jax.jit, static_argnums=(4, 5))
        def stage_refine(disp, left, right, pyrs, orig_h, orig_w):
            x = disp[..., None].astype(left.dtype)
            out_hw = left.shape[1:3]
            multi_scale = []
            for i, (mod, mvars) in enumerate(refine_mods):
                if variant == "v3":
                    l_g, r_g = pyrs[0][i + 1], pyrs[1][i + 1]
                elif variant == "v2":
                    l_g, r_g = left, right
                else:
                    l_g, r_g = left, None
                if r_g is None:
                    x = mod.apply(mvars, x, l_g, train=False)
                else:
                    x = mod.apply(mvars, x, l_g, r_g, train=False)
                multi_scale.append(
                    _full_res_nearest(x, out_hw, (orig_h, orig_w)))
            return [-1.0 * m for m in multi_scale]

        stage_cache[padded_h] = (rows, repl, stage_encode, stage_refine)
        return stage_cache[padded_h]

    def forward(left_img, right_img):
        orig_h, orig_w = left_img.shape[1:3]
        # normalize BEFORE padding, like the model (pad value 0 = mid-gray
        # in normalized space, reference mobile_stereo_net.py:121-130)
        left_n = normalize_images(jnp.asarray(left_img), dtype)
        right_n = normalize_images(jnp.asarray(right_img), dtype)
        left_n, _ = pad_to_multiple(left_n, align)
        right_n, _ = pad_to_multiple(right_n, align)
        rows, repl, stage_encode, stage_refine = _stages(left_n.shape[1])

        left_n = jax.device_put(left_n, rows)
        right_n = jax.device_put(right_n, rows)
        left, right, lf, rf = stage_encode(left_n, right_n)
        pyrs = (lf, rf) if variant == "v3" else ()
        if variant == "v3":
            lf, rf = lf[0], rf[0]
        sub = NamedSharding(mesh_disp, P())
        lf = jax.device_put(lf, sub)
        rf = jax.device_put(rf, sub)
        disp = coarse_fn(lf, rf)          # shard_map over 'disp'
        disp = jax.device_put(disp, repl)
        return stage_refine(disp, left, right, pyrs, orig_h, orig_w)

    forward.coarse_fn = coarse_fn
    return forward


def make_sharded_infer_v4(model, variables, devices=None, dtype=None):
    """Multi-device MobileStereoNetV4 inference: shift-axis sharding for the
    interweave volume + row (spatial) sharding everywhere else.

    Stage map (model forward: models/stereo_net_v4.py:384-461; reference
    model/mobile_stereo_net_v4.py:432-524):

    * extract -- the pair-batched MobileV1/V2 extractor + 1x1 squeeze at 1/4
      res, jit row-sharded (XLA inserts the conv halo exchanges);
    * volume -- ``make_sharded_v4_volume_fn`` (disparity_sharding.py): each
      device builds the (B, S/n, h, w) slab for its shift range, features
      replicated (shifts are embarrassingly parallel; only the scalar slabs
      are all-gathered);
    * aggregate+head -- dres blocks, 3 hourglasses, classif and the fused
      trilinear soft-argmin head, jit row-sharded (rows chosen to divide the
      1/16-res hourglass floor, see the even-shard rule above).

    Output parity vs single-device ``model.apply`` is pinned by
    tests/test_sharded_infer.py on the 8-device CPU mesh.
    """
    import flax.linen as nn

    from realtime_stereo_matcher_tpu.models.layers import MobileV2Residual
    from realtime_stereo_matcher_tpu.models.stereo_net_v4 import (
        Classif,
        FeatureExtraction,
        Hourglass2D,
        InterweaveVolume,
        PreConv11,
    )
    from realtime_stereo_matcher_tpu.ops.cost_volume import (
        soft_argmin_trilinear,
    )
    from realtime_stereo_matcher_tpu.parallel.disparity_sharding import (
        make_sharded_v4_volume_fn,
    )

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dev = np.asarray(devices)
    params = variables["params"]
    stats = variables["batch_stats"]

    def sub(name):
        v = {"params": params[name]}
        if name in stats:
            v["batch_stats"] = stats[name]
        return v

    align = 16  # hourglass floor: volume at 1/4, two stride-2 levels inside
    n_disp = math.gcd(model.volume_size, n)
    mesh_disp = Mesh(dev[:n_disp], ("disp",))

    extractor = FeatureExtraction(bn_groups=2, dtype=dtype)
    preconv = PreConv11(bn_groups=2, dtype=dtype)
    vol_mod = InterweaveVolume(
        n_shifts=model.volume_size,
        chunk=min(model.volume_chunk, model.volume_size), dtype=dtype)
    vol_fn = make_sharded_v4_volume_fn(mesh_disp, vol_mod,
                                       sub("InterweaveVolume_0"))

    er = 3
    dres = [
        MobileV2Residual(model.volume_size, model.hg_size, 1, er, dtype=dtype),
        MobileV2Residual(model.hg_size, model.hg_size, 1, er, dtype=dtype),
        MobileV2Residual(model.hg_size, model.hg_size, 1, er, dtype=dtype),
        MobileV2Residual(model.hg_size, model.hg_size, 1, er, dtype=dtype),
    ]
    hourglasses = [Hourglass2D(model.hg_size, dtype=dtype) for _ in range(3)]
    classif3 = Classif(model.hg_size, dtype=dtype)

    def _n_spatial(padded_h: int) -> int:
        floor_rows = padded_h // align
        for k in range(min(n, floor_rows), 0, -1):
            if floor_rows % k == 0:
                return k
        return 1

    stage_cache: dict = {}

    def _stages(padded_h: int):
        if padded_h in stage_cache:
            return stage_cache[padded_h]
        n_sp = _n_spatial(padded_h)
        mesh_sp = Mesh(dev[:n_sp], ("spatial",))
        rows = NamedSharding(mesh_sp, P(None, "spatial"))
        rows_vol = NamedSharding(mesh_sp, P(None, None, "spatial"))

        @partial(jax.jit, out_shardings=(rows, rows))
        def stage_extract(left, right):
            b = left.shape[0]
            pair = jnp.concatenate([left, right], axis=0)
            feat = preconv.apply(sub("PreConv11_0"),
                                 extractor.apply(sub("FeatureExtraction_0"),
                                                 pair, False), False)
            return feat[:b], feat[b:]

        @partial(jax.jit, static_argnums=(1, 2, 3, 4))
        def stage_aggregate(volume, out_h, out_w, orig_h, orig_w):
            # model __call__ wiring, eval branch (stereo_net_v4.py:410-461)
            cost = jnp.transpose(volume, (0, 2, 3, 1))
            c0 = nn.relu(dres[0].apply(sub("MobileV2Residual_0"), cost, False))
            cost0 = nn.relu(dres[1].apply(sub("MobileV2Residual_1"), c0,
                                          False))
            d1 = nn.relu(dres[2].apply(sub("MobileV2Residual_2"), cost0,
                                       False))
            d1 = dres[3].apply(sub("MobileV2Residual_3"), d1, False)
            cost0 = d1 + cost0
            out = cost0
            for i, hg in enumerate(hourglasses):
                out = hg.apply(sub(f"Hourglass2D_{i}"), out, False)
            c = classif3.apply(sub("Classif_3"), out, False)
            c = jnp.transpose(c, (0, 3, 1, 2))
            pred = soft_argmin_trilinear(c, model.max_disp, (out_h, out_w))
            return -1.0 * pred[:, :orig_h, :orig_w, None]

        stage_cache[padded_h] = (rows, rows_vol, stage_extract,
                                 stage_aggregate)
        return stage_cache[padded_h]

    def forward(left_img, right_img):
        orig_h, orig_w = left_img.shape[1:3]
        left_n = normalize_images(jnp.asarray(left_img), dtype)
        right_n = normalize_images(jnp.asarray(right_img), dtype)
        left_n, _ = pad_to_multiple(left_n, align)
        right_n, _ = pad_to_multiple(right_n, align)
        out_h, out_w = left_n.shape[1:3]
        rows, rows_vol, stage_extract, stage_aggregate = _stages(out_h)

        left_n = jax.device_put(left_n, rows)
        right_n = jax.device_put(right_n, rows)
        featL, featR = stage_extract(left_n, right_n)
        repl_disp = NamedSharding(mesh_disp, P())
        featL = jax.device_put(featL, repl_disp)
        featR = jax.device_put(featR, repl_disp)
        volume = vol_fn(featL, featR)            # (B, S, h, w)
        volume = jax.device_put(volume, rows_vol)
        return [stage_aggregate(volume, out_h, out_w, orig_h, orig_w)]

    forward.volume_fn = vol_fn
    return forward
