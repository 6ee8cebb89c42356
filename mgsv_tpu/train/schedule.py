"""Learning-rate schedules (optax-compatible callables).

Re-derivation of utils/scheduler.py: warmup-constant/linear/cosine and
constant.  Semantics match torch LambdaLR as driven by the reference train
loop (scheduler.step() after every optimizer step, lr_update_rate forced to
1 for warmup schedules — train-MaDe.py:274-275): update count k uses
multiplier lambda(k), starting from lambda(0)=0 on the very first step.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  cycles: float = 0.5) -> Callable:
    """utils/scheduler.py:43-60."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = count / max(1.0, warmup_steps)
        progress = (count - warmup_steps) / max(1.0, total_steps - warmup_steps)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * cycles * 2.0 * progress)))
        return base_lr * jnp.where(count < warmup_steps, warm, cos)

    return schedule


def warmup_linear(base_lr: float, warmup_steps: int, total_steps: int) -> Callable:
    """utils/scheduler.py:27-40."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = count / max(1.0, warmup_steps)
        lin = jnp.maximum(
            0.0, (total_steps - count) / max(1.0, total_steps - warmup_steps))
        return base_lr * jnp.where(count < warmup_steps, warm, lin)

    return schedule


def warmup_constant(base_lr: float, warmup_steps: int) -> Callable:
    """utils/scheduler.py:12-24."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        return base_lr * jnp.minimum(1.0, count / max(1.0, warmup_steps))

    return schedule


def constant(base_lr: float) -> Callable:
    return lambda count: jnp.asarray(base_lr, jnp.float32)


def exponential(base_lr: float, gamma: float, update_every: int) -> Callable:
    """The reference's `--scheduler exponential` branch: torch
    ExponentialLR(gamma=decay_rate) stepped every `lr_update_rate`
    optimizer steps (train-MaDe.py:285; the only scheduler for which
    lr_update_rate is not forced to 1, :274-275).

    The gating uses total_step BEFORE increment and fires AFTER
    optimizer.step() (train-MaDe.py:378-384, SURVEY §5 quirk #4), so the
    fire pattern over 0-based optimizer steps t is t ∈ {0, r, 2r, ...}
    applied from the NEXT step: step t runs at base * gamma^ceil(t/r)
    (step 0 at base, steps 1..r at base*gamma, ...).  Reproduced exactly,
    pinned vs torch in tests/test_schedule_parity.py."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        fires = jnp.ceil(count / max(1, update_every))
        return base_lr * jnp.power(gamma, fires)

    return schedule


def make_schedule(name: str, base_lr: float, warmup_steps: int,
                  total_steps: int, decay_rate: float = 0.9,
                  lr_update_rate: int = 50) -> Callable:
    if name == "warmupcosine":
        return warmup_cosine(base_lr, warmup_steps, total_steps)
    if name == "warmuplinear":
        return warmup_linear(base_lr, warmup_steps, total_steps)
    if name == "warmupconstant":
        return warmup_constant(base_lr, warmup_steps)
    if name == "constant":
        return constant(base_lr)
    if name == "exponential":
        return exponential(base_lr, decay_rate, lr_update_rate)
    raise ValueError(f"unknown scheduler: {name}")
