"""Model zoo + string-typed factory (reference model/__init__.py:9-23).

Every neural model is a Flax module with signature
``model.apply(variables, left, right, train=...) -> [negative disparity maps]``
on NHWC uint8-range float images.  ``build_model`` dispatches on the same
config ``type`` strings as the reference so reference JSON configs run
unchanged.
"""

from __future__ import annotations

from realtime_stereo_matcher_tpu.models.disp_net_c import MobileDispNetC
from realtime_stereo_matcher_tpu.models.stereo_net import (
    MobileStereoNet,
    MobileStereoNetV2,
    MobileStereoNetV3,
)
from realtime_stereo_matcher_tpu.models.stereo_net_v4 import MobileStereoNetV4

_NEURAL = {
    "MobileStereoNet": MobileStereoNet,
    "MobileStereoNetV2": MobileStereoNetV2,
    "MobileStereoNetV3": MobileStereoNetV3,
    "MobileStereoNetV4": MobileStereoNetV4,
    "MobileDispNetC": MobileDispNetC,
}


def build_model(model_config: dict, *, dtype=None):
    """Instantiate a model from a reference-schema config dict.

    ``{"type": <name>, "parameters": {...}}``; OpenCVSGBMModule maps to this
    framework's native C++ SGBM baseline (classical/sgbm.py).
    """
    mtype = model_config["type"]
    params = dict(model_config.get("parameters", {}))
    if mtype in _NEURAL:
        cls = _NEURAL[mtype]
        if mtype == "MobileStereoNetV2":
            params.setdefault("refine_dim", 7)
        # tuples for hashability as Flax static fields
        for k, v in list(params.items()):
            if isinstance(v, list):
                params[k] = tuple(v)
        if dtype is not None:
            params["dtype"] = dtype
        return cls(**params)
    if mtype == "OpenCVSGBMModule":
        from realtime_stereo_matcher_tpu.classical.sgbm import SGBMModule

        return SGBMModule(**params)
    raise NotImplementedError(f"unsupport model: {mtype}")


def is_neural(model_config: dict) -> bool:
    return model_config["type"] in _NEURAL


__all__ = [
    "MobileStereoNet",
    "MobileStereoNetV2",
    "MobileStereoNetV3",
    "MobileStereoNetV4",
    "MobileDispNetC",
    "build_model",
    "is_neural",
]
