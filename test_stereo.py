#!/usr/bin/env python
"""Batch-inference entry point (reference test_stereo.py).

Globs left images, pairs them with right images by filename substring
replacement, runs the configured model, and writes PFM disparity + jet-color
PNG artifacts:

    python test_stereo.py --exp_config_json=... [--model_chkpt_file=...] \
        --left='/data/*_left.png' --replace _left _right --output out/
"""

import argparse
import glob
import logging
import os
import time


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--exp_config_json",
                        default="configure/opencv_sgbm_config.json")
    parser.add_argument("--model_chkpt_file", default="")
    parser.add_argument("--left", required=True, help="left image glob")
    parser.add_argument("--replace", nargs=2, default=["_left_Img", "_right_Img"],
                        help="left->right filename substring replacement")
    parser.add_argument("--output", required=True, help="output path")
    parser.add_argument("--fast", choices=["auto", "on", "off"], default="auto",
                        help="Pallas kernel inference path (default: auto)")
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)-8s [%(filename)s:%(lineno)d] %(message)s",
    )

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from realtime_stereo_matcher_tpu.config import load_config
    from realtime_stereo_matcher_tpu.eval.validators import ModelRunner
    from realtime_stereo_matcher_tpu.models import build_model, is_neural
    from realtime_stereo_matcher_tpu.ops import InputPadder
    from realtime_stereo_matcher_tpu.train.trainer import (
        create_train_state,
        restore_checkpoint,
    )
    from realtime_stereo_matcher_tpu.utils.colorize import colorize_2d_matrix
    from realtime_stereo_matcher_tpu.utils.pfm import write_pfm

    exp_config = load_config(args.exp_config_json)

    if is_neural(exp_config.model.as_dict()):
        dtype = jnp.bfloat16 if exp_config.model.mixed_precision else None
        model, _, _, state = create_train_state(exp_config, dtype=dtype)
        if exp_config.has_train and args.model_chkpt_file:
            logging.info("Loading checkpoint: %s...", args.model_chkpt_file)
            state = restore_checkpoint(args.model_chkpt_file, state)
        fast = {"auto": "auto", "on": True, "off": False}[args.fast]
        runner = ModelRunner(
            model, {"params": state.params, "batch_stats": state.batch_stats},
            fast=fast)
    else:
        runner = ModelRunner(build_model(exp_config.model.as_dict()))

    save_path = os.path.join(args.output, exp_config.name)
    os.makedirs(save_path, exist_ok=True)

    l_suffix, r_suffix = args.replace
    divis_by = 2 ** exp_config.model.downsample_factor
    for l_img_file in sorted(glob.glob(args.left)):
        r_img_file = l_img_file.replace(l_suffix, r_suffix)
        if not os.path.exists(r_img_file) or r_img_file == l_img_file:
            continue
        l_img_name = os.path.splitext(os.path.basename(l_img_file))[0].replace(
            l_suffix, "")

        l_img = np.array(Image.open(l_img_file))[..., :3].astype(np.float32)
        r_img = np.array(Image.open(r_img_file))[..., :3].astype(np.float32)
        h, w = l_img.shape[:2]

        padder = InputPadder((1, h, w, 3), divis_by=divis_by)
        li, ri = padder.pad(jnp.asarray(l_img[None]), jnp.asarray(r_img[None]))

        start = time.time()
        flow_pr = runner(li, ri)[-1]
        jax.block_until_ready(flow_pr) if runner.is_neural else None
        end = time.time()
        print(f"The model inference on {l_img_file} FPS: "
              f"{1.0 / max(end - start, 1e-9):.4f}.")

        flow_pr = np.asarray(padder.unpad(jnp.asarray(flow_pr, jnp.float32)))
        disp = -1.0 * flow_pr[0, :, :, 0].astype(np.float32)
        color = colorize_2d_matrix(disp, min_val=1.0, max_val=64.0)

        pfm_file = os.path.join(save_path, f"{l_img_name}_{w}x{h}_disparity.pfm")
        write_pfm(pfm_file, disp, 1.0)
        png_file = os.path.join(save_path, f"{l_img_name}_{w}x{h}_disparity.png")
        Image.fromarray(color[:, :, ::-1]).save(png_file)  # color is BGR


if __name__ == "__main__":
    main()
