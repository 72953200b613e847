#!/usr/bin/env python
"""Training entry point (reference train_stereo.py).

Same flag surface as the reference:

    python train_stereo.py --exp_config_json=configure/stereo_net_config.json

plus TPU-native extras: --max_steps (cap for smoke runs), --bf16/--no-bf16.
"""

import argparse
import logging

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--exp_config_json",
                        default="configure/stereo_net_config_v4.json",
                        help="experiment configure json file")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="optional cap on training steps")
    parser.add_argument("--bf16", dest="bf16", action="store_true",
                        default=None, help="force bf16 compute")
    parser.add_argument("--no-bf16", dest="bf16", action="store_false")
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)-8s [%(filename)s:%(lineno)d] %(message)s",
    )
    np.random.seed(1234)

    # multi-host runtime (RSM_COORDINATOR / RSM_NUM_PROCESSES /
    # RSM_PROCESS_ID env vars; no-op single-process) -- must run before any
    # backend use
    from realtime_stereo_matcher_tpu.parallel.distributed import initialize

    initialize()

    from realtime_stereo_matcher_tpu.config import load_config
    from realtime_stereo_matcher_tpu.train.trainer import train

    exp_config = load_config(args.exp_config_json)
    final_ckpt = train(exp_config, max_steps=args.max_steps,
                       use_bf16=args.bf16)
    logging.info("Final checkpoint: %s", final_ckpt)


if __name__ == "__main__":
    main()
