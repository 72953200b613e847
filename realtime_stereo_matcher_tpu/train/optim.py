"""Optimizer + LR schedule (reference train_stereo.py:30-48).

AdamW(lr, wd, eps=1e-8) with OneCycleLR(total_steps + 100, pct_start=0.01,
linear anneal) and gradient clipping at global-norm 1.0 (reference :182) --
expressed as one optax chain.  torch's OneCycle linear defaults map to
optax.linear_onecycle_schedule: initial = peak/25, final = initial/1e4.
"""

from __future__ import annotations

import optax


def onecycle_schedule(learn_rate: float, num_steps: int):
    return optax.linear_onecycle_schedule(
        transition_steps=num_steps + 100,
        peak_value=learn_rate,
        pct_start=0.01,
        pct_final=1.0,
        div_factor=25.0,
        # torch's final lr = (peak/div_factor)/final_div_factor; optax divides
        # the peak, so fold div_factor in to match torch's endpoint exactly
        final_div_factor=25.0 * 1e4,
    )


def make_optimizer(learn_rate: float, num_steps: int, weight_decay: float,
                   *, clip_norm: float = 1.0):
    """Returns (optax optimizer, schedule fn)."""
    schedule = onecycle_schedule(learn_rate, num_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay),
    )
    return tx, schedule
