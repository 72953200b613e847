"""Import reference PyTorch checkpoints into the Flax model zoo.

The reference framework ships torch ``state_dict`` checkpoints
(``<name>-epoch-<step>.pth.gz``, reference train_stereo.py:196-211).  This
module converts such a state_dict -- given as any mapping from the torch key
names to arrays -- into the exact ``{"params", "batch_stats"}`` variable
pytree of the corresponding Flax model, so reference-trained weights run
unchanged on TPU.  It is also the proof engine for architecture parity: the
weight-transplant tests (tests/test_torch_parity.py) transplant random torch
weights through this converter and assert output equality against the torch
reference models themselves.

Layout conventions handled here (all verified numerically in the tests):

* Conv2d OIHW -> HWIO; Conv3d OIDHW -> DHWIO; depthwise Conv2d (C,1,kh,kw)
  -> (kh,kw,1,C) with ``feature_group_count=C``.
* ConvTranspose2d (I,O,kh,kw) -> flax ``ConvTranspose`` kernel
  (kh,kw,I,O) with the spatial taps flipped (flax's ``transpose_kernel=False``
  convention computes a plain convolution over the stride-dilated input).
* BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var.
* V4's ``conv3d`` reducer biases (the reference leaves Conv3d bias on,
  mobile_stereo_net_v4.py:317-333) are folded into the following BatchNorm's
  running mean -- exact in eval mode and a no-op for train-mode normalization.
* V4's depth-strided Conv3d kernels are re-laid-out for the factorized
  InterweaveVolume (models/stereo_net_v4.py): depth window and input channels
  collapse into the lane axis, depth-block-major.

Entry point: :func:`import_torch_state_dict`.
"""

from __future__ import annotations

import gzip
import io
from typing import Mapping

import numpy as np


def _t_conv2d(w: np.ndarray) -> np.ndarray:
    """torch Conv2d OIHW -> flax HWIO (also correct for depthwise)."""
    return np.transpose(w, (2, 3, 1, 0))


def _t_conv3d(w: np.ndarray) -> np.ndarray:
    """torch Conv3d OIDHW -> flax DHWIO."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def _t_convt2d(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I,O,kh,kw) -> flax (kh,kw,I,O), taps flipped."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()


class _Importer:
    """Accumulates flax leaf assignments from torch state_dict keys with
    strict bookkeeping: every torch key must be consumed and every flax leaf
    of the template variables must be assigned exactly once."""

    def __init__(self, state_dict: Mapping[str, np.ndarray]):
        self.sd: dict[str, np.ndarray] = {}
        for k, v in state_dict.items():
            if k.endswith("num_batches_tracked"):
                continue
            if k.startswith("module."):  # nn.DataParallel prefix
                k = k[len("module."):]
            self.sd[k] = np.asarray(v, dtype=np.float32)
        self.params: dict = {}
        self.stats: dict = {}
        self.used: set[str] = set()

    # -- low-level ---------------------------------------------------------
    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"torch state_dict has no key '{key}'")
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    @staticmethod
    def _set(tree: dict, path: str, val: np.ndarray):
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if parts[-1] in node:
            raise ValueError(f"flax leaf '{path}' assigned twice")
        node[parts[-1]] = val

    def set_param(self, path: str, val: np.ndarray):
        self._set(self.params, path, val)

    def set_stat(self, path: str, val: np.ndarray):
        self._set(self.stats, path, val)

    # -- layer mappers -----------------------------------------------------
    def conv(self, tkey: str, fpath: str, transform=_t_conv2d):
        self.set_param(fpath + "/kernel", transform(self.take(tkey + ".weight")))
        if self.has(tkey + ".bias"):
            self.set_param(fpath + "/bias", self.take(tkey + ".bias"))

    def conv3d(self, tkey: str, fpath: str):
        self.conv(tkey, fpath, transform=_t_conv3d)

    def convt(self, tkey: str, fpath: str):
        self.conv(tkey, fpath, transform=_t_convt2d)

    def bn(self, tkey: str, fpath: str, fold_bias: np.ndarray | None = None):
        """BatchNorm; ``fold_bias`` subtracts a preceding conv's bias from the
        running mean (exact eval-mode equivalent of bias-then-BN)."""
        self.set_param(fpath + "/scale", self.take(tkey + ".weight"))
        self.set_param(fpath + "/bias", self.take(tkey + ".bias"))
        mean = self.take(tkey + ".running_mean")
        if fold_bias is not None:
            mean = mean - fold_bias
        self.set_stat(fpath + "/mean", mean)
        self.set_stat(fpath + "/var", self.take(tkey + ".running_var"))

    def convbn(self, tprefix: str, fprefix: str, conv_idx: int = 0,
               bn_idx: int = 1, conv3d: bool = False):
        """torch Sequential(Conv, BN, ...) -> flax ConvBN.

        ConvBN never carries a conv bias (redundant before BN); when the torch
        conv has one (e.g. the reference cost_filter's Conv3d layers,
        mobile_stereo_net.py:103-116), it is folded into the BN running mean
        -- exact in eval mode, no-op for train-mode normalization."""
        tf = _t_conv3d if conv3d else _t_conv2d
        tconv = f"{tprefix}.{conv_idx}"
        self.set_param(f"{fprefix}/Conv_0/kernel",
                       tf(self.take(tconv + ".weight")))
        fold = self.take(tconv + ".bias") if self.has(tconv + ".bias") else None
        self.bn(f"{tprefix}.{bn_idx}", f"{fprefix}/BatchNorm_0",
                fold_bias=fold)

    def resblock(self, tprefix: str, fprefix: str):
        """Reference ResBlock (mobile_stereo_net.py:46-56): two conv_3x3."""
        self.convbn(f"{tprefix}.conv.0", f"{fprefix}/ConvBN_0")
        self.convbn(f"{tprefix}.conv.1", f"{fprefix}/ConvBN_1")

    def mobilev2_(self, tprefix: str, fprefix: str):
        """MobileV2_Residual, expanse_ratio != 1
        (mobile_stereo_net_v4.py:91-148): pw / dw / pw-linear."""
        self.conv(f"{tprefix}.conv.0", f"{fprefix}/ConvBN_0/Conv_0")
        self.bn(f"{tprefix}.conv.1", f"{fprefix}/ConvBN_0/BatchNorm_0")
        self.conv(f"{tprefix}.conv.3", f"{fprefix}/ConvBN_1/Conv_0")
        self.bn(f"{tprefix}.conv.4", f"{fprefix}/ConvBN_1/BatchNorm_0")
        self.conv(f"{tprefix}.conv.6", f"{fprefix}/ConvBN_2/Conv_0")
        self.bn(f"{tprefix}.conv.7", f"{fprefix}/ConvBN_2/BatchNorm_0")

    def mobilev1_(self, tprefix: str, fprefix: str):
        """MobileV1_Residual (mobile_stereo_net_v4.py:68-88)."""
        for j, tp in enumerate(("conv1", "conv2")):
            self.conv(f"{tprefix}.{tp}.0", f"{fprefix}/ConvBNDws_{j}/ConvBN_0/Conv_0")
            self.bn(f"{tprefix}.{tp}.1", f"{fprefix}/ConvBNDws_{j}/ConvBN_0/BatchNorm_0")
            self.conv(f"{tprefix}.{tp}.3", f"{fprefix}/ConvBNDws_{j}/ConvBN_1/Conv_0")
            self.bn(f"{tprefix}.{tp}.4", f"{fprefix}/ConvBNDws_{j}/ConvBN_1/BatchNorm_0")
        if self.has(f"{tprefix}.downsample.0.weight"):
            self.conv(f"{tprefix}.downsample.0", f"{fprefix}/ConvBN_0/Conv_0")
            self.bn(f"{tprefix}.downsample.1", f"{fprefix}/ConvBN_0/BatchNorm_0")

    # -- finalize -----------------------------------------------------------
    def finish(self, variables) -> dict:
        """Validate against the template ``variables`` (shapes + completeness)
        and return the converted ``{"params", "batch_stats"}``."""
        unused = set(self.sd) - self.used
        if unused:
            raise ValueError(f"unconsumed torch keys: {sorted(unused)[:8]} "
                             f"({len(unused)} total)")

        import jax

        def align(template, built, col):
            t_flat = {"/".join(str(k.key) for k in path): leaf
                      for path, leaf in
                      jax.tree_util.tree_flatten_with_path(template)[0]}
            b_flat = {"/".join(str(k.key) for k in path): leaf
                      for path, leaf in
                      jax.tree_util.tree_flatten_with_path(built)[0]}
            missing = set(t_flat) - set(b_flat)
            extra = set(b_flat) - set(t_flat)
            if missing or extra:
                raise ValueError(
                    f"{col}: unassigned flax leaves {sorted(missing)[:8]} "
                    f"({len(missing)}); unknown leaves {sorted(extra)[:8]} "
                    f"({len(extra)})")
            out = {}
            for k, tv in t_flat.items():
                bv = b_flat[k]
                if tuple(tv.shape) != tuple(bv.shape):
                    raise ValueError(f"{col}/{k}: shape {bv.shape} != "
                                     f"template {tv.shape}")
                out[k] = np.asarray(bv, dtype=tv.dtype)
            # rebuild nested dict
            tree: dict = {}
            for k, v in out.items():
                _Importer._set(tree, k, v)
            return tree

        return {
            "params": align(variables["params"], self.params, "params"),
            "batch_stats": align(variables.get("batch_stats", {}), self.stats,
                                 "batch_stats"),
        }


# ---------------------------------------------------------------------------
# per-model mappings
# ---------------------------------------------------------------------------


def _count(sd_has, fmt: str) -> int:
    n = 0
    while sd_has(fmt.format(n)):
        n += 1
    return n


def _map_feature_encoder(m: _Importer, tp: str, fp: str):
    """v1/v2 strided encoder (mobile_stereo_net.py:97-101).

    Stages are (conv_3x3, ResBlock) pairs at even/odd Sequential indices;
    the final plain conv sits at index 2*k."""
    i = 0
    while m.has(f"{tp}.{2 * i}.0.weight"):
        m.convbn(f"{tp}.{2 * i}", f"{fp}/ConvBN_{i}")
        m.resblock(f"{tp}.{2 * i + 1}", f"{fp}/ResBlock_{i}")
        i += 1
    m.conv(f"{tp}.{2 * i}", f"{fp}/Conv_0")


def _map_cost_filter(m: _Importer, tp: str, fp: str):
    """5-layer Conv3d stack (mobile_stereo_net.py:103-117)."""
    for j in range(4):
        m.convbn(tp, f"{fp}/ConvBN_{j}", conv_idx=3 * j, bn_idx=3 * j + 1,
                 conv3d=True)
    m.conv3d(f"{tp}.12", f"{fp}/Conv_0")


def _map_refinenet(m: _Importer, tp: str, fp: str):
    """RefineNet conv0 Sequential (mobile_stereo_net.py:59-67)."""
    m.convbn(f"{tp}.conv0.0", f"{fp}/ConvBN_0")
    r = 0
    while m.has(f"{tp}.conv0.{1 + r}.conv.0.0.weight"):
        m.resblock(f"{tp}.conv0.{1 + r}", f"{fp}/ResBlock_{r}")
        r += 1
    m.conv(f"{tp}.conv0.{1 + r}", f"{fp}/Conv_0")


def _map_v1v2(m: _Importer):
    _map_feature_encoder(m, "feature_extractor", "FeatureEncoder_0")
    _map_cost_filter(m, "cost_filter", "CostFilter3D_0")
    r = 0
    while m.has(f"refine_layer.{r}.conv0.0.0.weight"):
        _map_refinenet(m, f"refine_layer.{r}", f"RefineNet_{r}")
        r += 1


def _map_v3(m: _Importer):
    tp = "feature_extractor"
    fp = "UNetFeatureExtractor_0"
    df = _count(m.has, tp + ".up_layers.{}.up_conv.0.weight")

    # down path (mobile_stereo_net_v3.py:202-226)
    m.conv(f"{tp}.down_layers.0.0", f"{fp}/Conv_0")
    c = 1
    for i in range(1, df + 1):
        n_convs = 3 if i == df else 1
        m.conv(f"{tp}.down_layers.{i}.0", f"{fp}/Conv_{c}")  # SameConv2d k4s2
        c += 1
        for j in range(n_convs):
            m.conv(f"{tp}.down_layers.{i}.{2 * (j + 1)}", f"{fp}/Conv_{c}")
            c += 1
    # up path (UpsampleBlock :170-190)
    for j in range(df):
        m.convt(f"{tp}.up_layers.{j}.up_conv.0", f"{fp}/ConvTranspose_{j}")
        for q in range(3):
            m.conv(f"{tp}.up_layers.{j}.merge_conv.{2 * q}", f"{fp}/Conv_{c}")
            c += 1

    _map_cost_filter(m, "cost_filter", "CostFilter3D_0")
    r = 0
    while m.has(f"refine_layers.{r}.conv0.0.0.weight"):
        _map_refinenet(m, f"refine_layers.{r}", f"RefineNet_{r}")
        r += 1


def _map_v4(m: _Importer):
    fe = "FeatureExtraction_0"
    for j, ti in enumerate((0, 2, 4)):  # firstconv with add_relus=True
        m.mobilev2_(f"feature_extraction.firstconv.{ti}", f"{fe}/MobileV2Residual_{j}")
    k = 0
    for layer, blocks in (("layer1", 3), ("layer2", 16), ("layer3", 3),
                          ("layer4", 3)):
        for b in range(blocks):
            m.mobilev1_(f"feature_extraction.{layer}.{b}",
                        f"{fe}/MobileV1Residual_{k}")
            k += 1

    # preconv11 (:307-315)
    pc = "PreConv11_0"
    for j, ti in enumerate((0, 2, 4)):
        m.conv(f"preconv11.{ti}.0", f"{pc}/ConvBN_{j}/Conv_0")
        m.bn(f"preconv11.{ti}.1", f"{pc}/ConvBN_{j}/BatchNorm_0")
    m.conv("preconv11.6", f"{pc}/Conv_0")

    # conv3d reducer (:317-335) -> InterweaveVolume factorized layout
    iv = "InterweaveVolume_0"
    w0 = m.take("conv3d.0.weight")  # (16, 1, 8, 3, 3)
    m.set_param(f"{iv}/conv3d0", np.transpose(w0[:, 0], (2, 3, 1, 0)))
    m.bn("conv3d.1", f"{iv}/bn0", fold_bias=m.take("conv3d.0.bias"))
    w1 = m.take("conv3d.3.weight")  # (32, 16, 4, 3, 3)
    m.set_param(f"{iv}/conv1",
                np.transpose(w1, (3, 4, 2, 1, 0)).reshape(3, 3, 64, 32))
    m.bn("conv3d.4", f"{iv}/bn1", fold_bias=m.take("conv3d.3.bias"))
    w2 = m.take("conv3d.6.weight")  # (16, 32, 2, 3, 3)
    m.set_param(f"{iv}/cb2/Conv_0/kernel",
                np.transpose(w2, (3, 4, 2, 1, 0)).reshape(3, 3, 64, 16))
    m.bn("conv3d.7", f"{iv}/cb2/BatchNorm_0", fold_bias=m.take("conv3d.6.bias"))
    m.conv("volume11.0.0", f"{iv}/cb3/Conv_0")
    m.bn("volume11.0.1", f"{iv}/cb3/BatchNorm_0")

    # dres0 / dres1 (:337-350)
    for j, tp in enumerate(("dres0.0", "dres0.2", "dres1.0", "dres1.2")):
        m.mobilev2_(tp, f"MobileV2Residual_{j}")

    # hourglasses (:223-288)
    for h in range(3):
        tp = f"encoder_decoder{h + 1}"
        fp = f"Hourglass2D_{h}"
        for j in range(4):
            m.mobilev2_(f"{tp}.conv{j + 1}", f"{fp}/MobileV2Residual_{j}")
        m.convt(f"{tp}.conv5.0", f"{fp}/ConvTransposeBN_0/ConvTranspose_0")
        m.bn(f"{tp}.conv5.1", f"{fp}/ConvTransposeBN_0/BatchNorm_0")
        m.mobilev2_(f"{tp}.redir2", f"{fp}/MobileV2Residual_4")
        m.convt(f"{tp}.conv6.0", f"{fp}/ConvTransposeBN_1/ConvTranspose_0")
        m.bn(f"{tp}.conv6.1", f"{fp}/ConvTransposeBN_1/BatchNorm_0")
        m.mobilev2_(f"{tp}.redir1", f"{fp}/MobileV2Residual_5")

    # classif heads (:358-409)
    for j in range(4):
        m.conv(f"classif{j}.0.0", f"Classif_{j}/ConvBN_0/Conv_0")
        m.bn(f"classif{j}.0.1", f"Classif_{j}/ConvBN_0/BatchNorm_0")
        m.conv(f"classif{j}.2", f"Classif_{j}/Conv_0")


def _map_dispnetc(m: _Importer):
    def c2b(tp, fp, with_bn=True):
        m.conv(f"{tp}.layer.0", f"{fp}/ConvBN_0/Conv_0")
        if with_bn:
            m.bn(f"{tp}.layer.1", f"{fp}/ConvBN_0/BatchNorm_0")

    c2b("conv1", "Conv2dBlock_0")
    c2b("conv2", "Conv2dBlock_1")
    c2b("conv_redir", "Conv2dBlock_2")
    c2b("conv3.0", "Conv2dBlock_3")
    c2b("conv3.1", "Conv2dBlock_4", with_bn=False)

    for j, tp in enumerate(("res4", "res5", "res6")):
        fp = f"ResBlockC_{j}"
        m.conv(f"{tp}.shortcut.0", f"{fp}/Conv_0")
        m.bn(f"{tp}.shortcut.1", f"{fp}/BatchNorm_0")
        m.conv(f"{tp}.conv1", f"{fp}/Conv_1")
        m.bn(f"{tp}.bn1", f"{fp}/BatchNorm_1")
        m.conv(f"{tp}.conv2", f"{fp}/Conv_2")
        m.bn(f"{tp}.bn2", f"{fp}/BatchNorm_2")

    for j, tp in enumerate(("up5", "up4", "up3", "up2", "up1")):
        fp = f"UpsampleBlock_{j}"
        m.convt(f"{tp}.deconv.layer.0", f"{fp}/ConvTranspose_0")
        m.bn(f"{tp}.deconv.layer.1", f"{fp}/BatchNorm_0")
        m.conv(f"{tp}.predict", f"{fp}/Conv_0")
        m.convt(f"{tp}.up_predict", f"{fp}/ConvTranspose_1")
        m.conv(f"{tp}.concat", f"{fp}/Conv_1")

    m.conv("predict", "Conv_0")


_MAPPERS = {
    "MobileStereoNet": _map_v1v2,
    "MobileStereoNetV2": _map_v1v2,
    "MobileStereoNetV3": _map_v3,
    "MobileStereoNetV4": _map_v4,
    "MobileDispNetC": _map_dispnetc,
}


def import_torch_state_dict(model_type: str,
                            state_dict: Mapping[str, np.ndarray],
                            variables) -> dict:
    """Convert a reference torch ``state_dict`` into this framework's Flax
    variables for ``model_type``.

    Args:
      model_type: reference config ``model.type`` string.
      state_dict: mapping of torch parameter names to arrays (tensors or
        numpy); ``module.``-prefixed (DataParallel) keys are accepted.
      variables: the target model's initialized variables (template for
        structure/shape/dtype validation), e.g. ``model.init(...)``.

    Returns ``{"params": ..., "batch_stats": ...}`` plain nested dicts.
    """
    if model_type not in _MAPPERS:
        raise NotImplementedError(f"no torch import mapping for {model_type}")
    m = _Importer(state_dict)
    _MAPPERS[model_type](m)
    return m.finish(variables)


def load_torch_checkpoint(path: str) -> dict:
    """Read a reference ``.pth`` / ``.pth.gz`` checkpoint into a numpy
    state_dict (requires torch, used host-side only)."""
    import torch

    if str(path).endswith(".gz"):
        with gzip.open(path, "rb") as f:
            buf = io.BytesIO(f.read())
        obj = torch.load(buf, map_location="cpu")
    else:
        obj = torch.load(path, map_location="cpu")
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}
