#!/usr/bin/env python
"""Synthetic-holdout accuracy anchors: native SGBM vs trained checkpoints.

Scores runners on the same 40-scene held-out set ``validate_synthetic`` uses
for convergence evidence, so trained-model rows in BASELINE.md have a
classical baseline to beat (reference model/opencv_sgbm_module.py plays the
same anchor role in the reference's eval harness).

Usage::

    python benchmarks/synthetic_anchor.py sgbm
    python benchmarks/synthetic_anchor.py <config.json> <checkpoint>  # model
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from realtime_stereo_matcher_tpu.eval.validators import (
        ModelRunner,
        validate_synthetic,
    )

    what = sys.argv[1] if len(sys.argv) > 1 else "sgbm"
    if what == "sgbm":
        from realtime_stereo_matcher_tpu.classical.sgbm import SGBMModule

        # reference opencv_sgbm_config.json parameter surface; num_of_disps
        # covers the synthetic max_disp=64 range
        runner = ModelRunner(SGBMModule(num_of_disps=80, block_size=5))
        name = "native-SGBM"
    else:
        import jax
        import jax.numpy as jnp

        from realtime_stereo_matcher_tpu.config import load_config
        from realtime_stereo_matcher_tpu.train.trainer import (
            create_train_state,
            restore_checkpoint,
        )

        cfg = load_config(json.loads(Path(what).read_text())
                          if what.endswith(".json") else what)
        model, _, _, state = create_train_state(cfg, dtype=jnp.bfloat16)
        state = restore_checkpoint(sys.argv[2], state)
        runner = ModelRunner(model, {"params": state.params,
                                     "batch_stats": state.batch_stats})
        name = f"{cfg.model.type}@{sys.argv[2]}"

    res = validate_synthetic(runner)
    print(json.dumps({"runner": name, **res}))


if __name__ == "__main__":
    main()
