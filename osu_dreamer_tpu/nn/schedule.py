"""Learning-rate schedule: exponential warmup + inverse-sqrt decay.

Parity with reference common/lr_schedule.py:10-21, expressed as an optax
schedule (a step -> multiplier function composed with the base LR).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(kw_only=True)
class LRScheduleArgs:
    warmup_steps: int = 0
    warmup_init: float = 1.0
    decay_start: float = float("inf")


def make_lr_schedule(base_lr: float, args: LRScheduleArgs):
    """returns an optax-compatible schedule: step -> learning rate"""
    assert args.warmup_steps <= args.decay_start

    warmup_steps = jnp.asarray(max(args.warmup_steps, 1), jnp.float32)
    warmup_init = jnp.asarray(args.warmup_init, jnp.float32)
    decay_start = jnp.asarray(args.decay_start, jnp.float32)

    def schedule(step) -> jnp.ndarray:
        step = jnp.asarray(step, jnp.float32)
        # exponential ramp warmup_init -> 1 over warmup_steps
        warm = warmup_init ** jnp.maximum(0.0, 1.0 - step / warmup_steps)
        # inverse-sqrt decay after decay_start
        decay = jnp.where(
            step > decay_start, jnp.sqrt(decay_start / jnp.maximum(step, 1.0)), 1.0
        )
        mult = jnp.where(step < warmup_steps, warm, decay)
        return base_lr * mult

    return schedule


def lr_at(step: int, base_lr: float, args: LRScheduleArgs) -> float:
    """host-side mirror of ``make_lr_schedule`` for logging: same math in
    plain floats, so the LR track costs no device dispatch"""
    import math

    warmup = max(args.warmup_steps, 1)
    if step < warmup:
        mult = args.warmup_init ** max(0.0, 1.0 - step / warmup)
    elif step > args.decay_start:
        mult = math.sqrt(args.decay_start / max(step, 1))
    else:
        mult = 1.0
    return base_lr * mult
