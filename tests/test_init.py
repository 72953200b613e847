"""Reference weight-init semantics (train/init.py) vs. the torch reference.

The torch oracle is the reference's own pipeline: construct the model, run
``train_stereo.initialize`` (Kaiming fan_out/relu on Conv2d + constant norms,
reference train_stereo.py:127-135), then compare per-layer weight statistics
(std / bounds) of the transplant-aligned flax leaves against the torch ones.
Statistical, not bitwise -- the RNGs differ by design.
"""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from realtime_stereo_matcher_tpu.models import build_model
from realtime_stereo_matcher_tpu.train.init import reference_initialize


def _torch_initialize(model):
    """Literal re-implementation of reference train_stereo.py:127-135."""
    for m in model.modules():
        if isinstance(m, nn.Conv2d):
            nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                    nonlinearity="relu")
        elif isinstance(m, (nn.BatchNorm2d, nn.InstanceNorm2d, nn.GroupNorm)):
            if m.weight is not None:
                nn.init.constant_(m.weight, 1)
            if m.bias is not None:
                nn.init.constant_(m.bias, 0)


def _load_ref(name):
    key = f"_ref_init_{name}"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(
        key, f"/root/reference/model/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod


def _flat(tree, prefix=""):
    out = {}
    for k in tree:
        v = tree[k]
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_flat(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(v)
    return out


def _init_flax(model_type, hw=(64, 96)):
    model = build_model({"type": model_type})
    z = jnp.zeros((1, *hw, 3))
    variables = model.init(jax.random.PRNGKey(0), z, z, train=True)
    variables = reference_initialize(dict(variables), jax.random.PRNGKey(1),
                                     model_type=model_type)
    return _flat(variables["params"]), _flat(variables["batch_stats"])


def test_v1_init_statistics():
    torch.manual_seed(0)
    ref = _load_ref("mobile_stereo_net")
    tmodel = ref.MobileStereoNet()
    _torch_initialize(tmodel)

    params, stats = _init_flax("MobileStereoNet")

    # Conv2d kernel: kaiming fan_out/relu -- compare std of the big encoder
    # conv (32x32x3x3 = 9216 samples; std of std ~ 1%)
    k = params["FeatureEncoder_0/ConvBN_1/Conv_0/kernel"]
    want = tmodel.feature_extractor[2][0].weight.detach().numpy()
    np.testing.assert_allclose(k.std(), want.std(), rtol=0.08)
    assert abs(k.mean()) < 3 * k.std() / np.sqrt(k.size)  # zero-mean

    # Conv3d (cost filter): torch default U(+-1/sqrt(fan_in)) -- bounded and
    # matching std
    k3 = params["CostFilter3D_0/ConvBN_0/Conv_0/kernel"]
    want3 = tmodel.cost_filter[0].weight.detach().numpy()
    bound = 1.0 / np.sqrt(32 * 27)
    assert np.abs(k3).max() <= bound + 1e-7
    np.testing.assert_allclose(k3.std(), want3.std(), rtol=0.1)

    # BN constants
    assert (params["FeatureEncoder_0/ConvBN_0/BatchNorm_0/scale"] == 1).all()
    assert (params["FeatureEncoder_0/ConvBN_0/BatchNorm_0/bias"] == 0).all()
    assert (stats["FeatureEncoder_0/ConvBN_0/BatchNorm_0/mean"] == 0).all()
    assert (stats["FeatureEncoder_0/ConvBN_0/BatchNorm_0/var"] == 1).all()

    # conv bias: torch default uniform bound of the owning conv
    b = params["FeatureEncoder_0/Conv_0/bias"]
    bb = 1.0 / np.sqrt(32 * 9)
    assert np.abs(b).max() <= bb + 1e-7 and b.std() > 0


@pytest.mark.slow
def test_dispnetc_init_statistics():
    torch.manual_seed(0)
    ref = _load_ref("mobile_disp_net_c")
    tmodel = ref.MobileDispNetC()
    _torch_initialize(tmodel)

    params, _ = _init_flax("MobileDispNetC", hw=(64, 128))

    # Conv2d: fan_out kaiming (overridden at train start)
    k = params["Conv2dBlock_1/ConvBN_0/Conv_0/kernel"]  # conv2: 5x5x32x64
    want = tmodel.conv2.layer[0].weight.detach().numpy()
    np.testing.assert_allclose(k.std(), want.std(), rtol=0.08)

    # ConvTranspose2d keeps the constructor kaiming_normal (torch fan_in =
    # out_ch * rf for transposed convs)
    kt = params["UpsampleBlock_0/ConvTranspose_0/kernel"]
    want_t = tmodel.up5.deconv.layer[0].weight.detach().numpy()
    np.testing.assert_allclose(kt.std(), want_t.std(), rtol=0.08)

    # constructor zeroes conv biases
    b = params["ResBlockC_0/Conv_1/bias"]
    assert (b == 0).all()


@pytest.mark.slow
def test_v4_init_statistics():
    torch.manual_seed(0)
    ref = _load_ref("mobile_stereo_net_v4")
    tmodel = ref.MobileStereoNetV4(max_disp=192)
    _torch_initialize(tmodel)

    params, _ = _init_flax("MobileStereoNetV4", hw=(64, 224))

    # Conv3d reducer kernels keep the constructor N(0, sqrt(2/n))
    k0 = params["InterweaveVolume_0/conv3d0"]
    want0 = tmodel.conv3d[0].weight.detach().numpy()
    np.testing.assert_allclose(k0.std(), want0.std(), rtol=0.12)
    k1 = params["InterweaveVolume_0/conv1"]
    want1 = tmodel.conv3d[3].weight.detach().numpy()
    np.testing.assert_allclose(k1.std(), want1.std(), rtol=0.1)
    k2 = params["InterweaveVolume_0/cb2/Conv_0/kernel"]
    want2 = tmodel.conv3d[6].weight.detach().numpy()
    np.testing.assert_allclose(k2.std(), want2.std(), rtol=0.1)

    # depthwise Conv2d: fan_out = out * rf with out == channels
    kd = params["FeatureExtraction_0/MobileV2Residual_0/ConvBN_1/Conv_0/kernel"]
    want_d = tmodel.feature_extraction.firstconv[0].conv[3].weight.detach().numpy()
    np.testing.assert_allclose(kd.std(), want_d.std(), rtol=0.12)
