"""LR/WD schedules as closed-form functions of step.

Port of the reference's precomputed schedule arrays
(`imagenet_classification/utils.py:142-184` cosine_scheduler and the
deit/linear/sqrt LR scaling rules at :105-114; the MAE inline warmup+cosine
`mae/mae_imagenet.py:68-88`; the WD cosine schedule
`cell_imaging/utils.py:137`). Here they are pure functions of the step —
jit-friendly, no host-side arrays to index.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def scale_lr(lr: float, batch_size: int, world_size: int,
             rule: str = "deit") -> float:
    """World-size-aware LR scaling (imagenet_classification/utils.py:105-114;
    MAE uses rule="linear" — blr·eff_batch/256, mae_imagenet.py:106-107)."""
    eff = batch_size * world_size
    if rule == "linear":
        return lr * eff / 256.0
    if rule == "deit":
        return lr * eff / 512.0
    if rule == "sqrt":
        return lr * math.sqrt(eff / 1024.0)
    if rule == "none":
        return lr
    raise ValueError(f"unknown scaling rule {rule!r}")


def cosine_with_warmup(
    base_value: float,
    final_value: float,
    total_steps: int,
    warmup_steps: int = 0,
    warmup_initial_value: float = 0.0,
) -> Callable:
    """value(step): linear warmup then cosine decay, matching
    cosine_scheduler (utils.py:142-184; np.linspace warmup endpoint
    semantics included)."""
    decay_steps = max(total_steps - warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 1:
            frac = step / (warmup_steps - 1)
        else:
            frac = jnp.ones_like(step)
        warm = (warmup_initial_value
                + (base_value - warmup_initial_value) * jnp.minimum(frac, 1.0))
        t = jnp.clip(step - warmup_steps, 0, decay_steps) / decay_steps
        cos = final_value + 0.5 * (base_value - final_value) * (
            1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def warmup_multistep(base_value: float, warmup_steps: int,
                     milestones, gamma: float = 0.1,
                     warmup_start_factor: float = 0.001) -> Callable:
    """LinearLR warmup + MultiStepLR decay — the detection recipe
    (lsj-100e_coco-instance.py:101-113: 250-iter linear warmup from
    0.001·lr, ×0.1 at the milestone iterations)."""
    milestones = tuple(sorted(milestones))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            frac = jnp.clip(step / warmup_steps, 0.0, 1.0)
        else:
            frac = jnp.ones_like(step)
        warm = warmup_start_factor + (1.0 - warmup_start_factor) * frac
        decay = jnp.ones_like(step)
        for m in milestones:
            decay = decay * jnp.where(step >= m, gamma, 1.0)
        return base_value * warm * decay

    return schedule


def constant(value: float) -> Callable:
    def schedule(step):
        return jnp.full_like(jnp.asarray(step, jnp.float32), value)

    return schedule
