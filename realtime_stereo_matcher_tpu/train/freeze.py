"""BatchNorm freezing and parameter-group utilities.

TPU-native analogs of the reference's dormant training controls:

* ``freeze_bn`` (reference train_stereo.py:121-124): switch every BatchNorm
  to eval mode -- normalize with running statistics, update nothing -- while
  the rest of the network keeps training.  Here that is a Flax method
  interceptor injecting ``use_running_average=True`` into every
  ``nn.BatchNorm`` / ``GroupedBatchNorm`` call, so it works on every model
  in the zoo without touching module code.
* ``MobileDispNetC.freeze`` / ``weight_parameters`` / ``bias_parameters``
  (reference model/mobile_disp_net_c.py:414-423): requires_grad-style
  freezing and weight/bias parameter groups.  The functional analogs are
  optax label trees: torch ``weight`` == flax conv ``kernel`` + norm
  ``scale``, torch ``bias`` == flax ``bias``.

The reference defines but never invokes these (grep in train_stereo.py);
this framework wires ``freeze_bn`` through the config
(``train.freeze_bn: true``) so the capability is actually reachable.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from realtime_stereo_matcher_tpu.models.layers import GroupedBatchNorm


def _force_eval_bn(next_fun, args, kwargs, context):
    if isinstance(context.module, (nn.BatchNorm, GroupedBatchNorm)) \
            and context.method_name == "__call__":
        # flax's merge_param rejects a value passed BOTH at construction and
        # at call time, so override wherever the caller put it: the call
        # kwarg when present (e.g. InterweaveVolume's setup-built BNs),
        # otherwise the constructor attribute (ConvBN sets it from
        # ``train``; module instances are rebuilt per apply, so the
        # frozen-dataclass bypass is scoped to this trace).
        if "use_running_average" in kwargs:
            kwargs = dict(kwargs, use_running_average=True)
        elif len(args) > 1:
            args = (args[0], True) + tuple(args[2:])
        else:
            object.__setattr__(context.module, "use_running_average", True)
    return next_fun(*args, **kwargs)


def frozen_bn_apply(model):
    """``model.apply`` with every BatchNorm pinned to eval mode.

    Train-mode behavior elsewhere is unchanged (e.g. MobileStereoNetV4 still
    produces its 4 supervision heads under ``train=True``); batch statistics
    are normalized with the RUNNING stats and never updated, exactly like
    the reference's ``freeze_bn`` + ``model.train()`` combination.
    """

    def apply(variables, *args, **kwargs):
        with nn.intercept_methods(_force_eval_bn):
            return model.apply(variables, *args, **kwargs)

    return apply


def weight_bias_labels(params):
    """Label tree for optax.multi_transform: ``"weight"`` for conv kernels +
    norm scales (torch ``weight``), ``"bias"`` for biases (torch ``bias``)
    -- the reference DispNetC's parameter groups
    (model/mobile_disp_net_c.py:419-423)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "bias" if path[-1].key == "bias" else "weight",
        params)


def freeze_labels(params, frozen=("weight", "bias")):
    """Label tree marking every weight/bias leaf ``"frozen"`` (the reference
    ``MobileDispNetC.freeze``: requires_grad=False on all of them).  Use with
    ``optax.multi_transform({"frozen": optax.set_to_zero(), ...})``."""
    wb = weight_bias_labels(params)
    return jax.tree_util.tree_map(
        lambda lbl: "frozen" if lbl in frozen else lbl, wb)
