#!/usr/bin/env python
"""Evaluation entry point (reference evaluate_stereo.py).

    python evaluate_stereo.py --exp_config_json=configure/opencv_sgbm_config.json \
        [--model_chkpt_file=experiments/.../X-epoch-200000.ckpt] [--data_root=...]

Runs the validators listed in the config's ``test.datasets`` with
reference-exact metric math (EPE / D1 / bad-px / FPS).
"""

import argparse
import logging


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--exp_config_json",
                        default="configure/opencv_sgbm_config.json",
                        help="experiment configure json file")
    parser.add_argument("--model_chkpt_file", default="",
                        help="model checkpoint file")
    parser.add_argument("--data_root", default=None,
                        help="dataset root override (else RSM_DATA_ROOT)")
    parser.add_argument("--fast", choices=["auto", "on", "off"], default="auto",
                        help="Pallas kernel inference path (default: auto = "
                             "on when running on TPU and the model supports it)")
    parser.add_argument("--shape_bucket", type=int, default=0,
                        help="quantize padded eval shapes up to multiples of "
                             "this (>= 64) to bound recompiles on "
                             "shape-diverse sets; 0 = reference-exact /64")
    parser.add_argument("--allow_random_weights", action="store_true",
                        help="evaluate a trainable model without a checkpoint "
                             "(random init) -- off by default to match the "
                             "reference, which fails loudly in that case")
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)-8s [%(filename)s:%(lineno)d] %(message)s",
    )

    import jax
    import numpy as np

    from realtime_stereo_matcher_tpu.config import load_config
    from realtime_stereo_matcher_tpu.eval.validators import (
        ModelRunner,
        run_validation,
    )
    from realtime_stereo_matcher_tpu.models import build_model, is_neural
    from realtime_stereo_matcher_tpu.train.trainer import (
        count_parameters,
        create_train_state,
        restore_checkpoint,
    )

    exp_config = load_config(args.exp_config_json)

    if is_neural(exp_config.model.as_dict()):
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if exp_config.model.mixed_precision else None
        model, _, _, state = create_train_state(exp_config, dtype=dtype)
        if (exp_config.has_train and not args.model_chkpt_file
                and not args.allow_random_weights):
            # the reference fails loudly here too (torch.load on the empty
            # path, evaluate_stereo.py:307-311); a silent random-weight eval
            # reports garbage metrics
            raise SystemExit(
                "--model_chkpt_file is required for a trainable config "
                "(pass --allow_random_weights to evaluate random init).")
        if exp_config.has_train and args.model_chkpt_file:
            logging.info("Loading checkpoint: %s...", args.model_chkpt_file)
            if args.model_chkpt_file.endswith((".pth", ".pth.gz")):
                # reference torch checkpoint: convert layouts on the fly
                # (models/torch_import.py; parity-tested per model)
                from realtime_stereo_matcher_tpu.models.torch_import import (
                    import_torch_state_dict,
                    load_torch_checkpoint,
                )

                sd = load_torch_checkpoint(args.model_chkpt_file)
                v = import_torch_state_dict(
                    exp_config.model.type, sd,
                    {"params": state.params,
                     "batch_stats": state.batch_stats})
                state = state.replace(params=v["params"],
                                      batch_stats=v["batch_stats"])
            else:
                state = restore_checkpoint(args.model_chkpt_file, state)
            logging.info("Done loading checkpoint.")
            print(f"The model has "
                  f"{count_parameters(state.params) / 1e6:.4f}M learnable "
                  f"parameters.")
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fast = {"auto": "auto", "on": True, "off": False}[args.fast]
        runner = ModelRunner(model, variables, fast=fast)
    else:
        runner = ModelRunner(build_model(exp_config.model.as_dict()))

    data_root = args.data_root
    results = run_validation(runner, exp_config.test.datasets,
                             data_root=data_root, bucket=args.shape_bucket)
    for k, v in results.items():
        logging.info("%s: %.4f", k, v)


if __name__ == "__main__":
    main()
