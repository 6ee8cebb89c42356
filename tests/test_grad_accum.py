"""Gradient accumulation (optax.MultiSteps) semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mgsv_tpu.config import Config, TrainConfig
from mgsv_tpu.train.optimizer import make_optimizer
import pytest


def _tiny_params():
    return {"params": {
        "video_tower": {"proj": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}},
        "detr": {"w": jnp.ones((4,))},
        "logit_scale": jnp.zeros(()),
        "query_embed": jnp.ones((1, 4)),
    }}


def test_multisteps_updates_every_k():
    cfg = dataclasses.replace(
        Config(), train=TrainConfig(gradient_accumulation_steps=3))
    tx = make_optimizer(cfg, total_steps=100)
    params = _tiny_params()
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    changed = []
    for step in range(6):
        updates, state = tx.update(grads, state, params)
        delta = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(updates))
        changed.append(delta > 0)
    # updates fire only on every 3rd micro-step (k=3); note the very first
    # real update still uses warmup lr(0)=0, so look at the second cycle
    assert changed == [False, False, changed[2], False, False, True]


@pytest.mark.slow
def test_schedule_horizon_divided_by_accumulation():
    """With k micro-batches per update, warmup/cosine advance in UPDATE
    units: the schedule horizon must be total_micro_steps / k."""
    from mgsv_tpu.train.schedule import make_schedule

    cfg2 = dataclasses.replace(
        Config(), train=TrainConfig(gradient_accumulation_steps=2))
    cfg1 = dataclasses.replace(
        Config(), train=TrainConfig(gradient_accumulation_steps=1))
    params = _tiny_params()
    grads = jax.tree.map(jnp.ones_like, params)
    total_micro = 40

    def updates_after(tx, n_micro):
        state = tx.init(params)
        last = None
        for _ in range(n_micro):
            last, state = tx.update(grads, state, params)
        return last

    # After ALL micro-steps both runs must sit at the end of their cosine:
    # the k=2 run has done 20 updates over a 20-step schedule, matching the
    # k=1 run's 40 updates over a 40-step schedule.
    u2 = updates_after(make_optimizer(cfg2, total_steps=total_micro), total_micro)
    u1 = updates_after(make_optimizer(cfg1, total_steps=total_micro), total_micro)
    # both final updates were produced at schedule-progress ~1.0 -> lr ~0
    # (last update runs at count = total-1, so lr is near- but not exactly 0)
    for u in (u1, u2):
        assert float(jnp.abs(u["params"]["detr"]["w"]).max()) < 5e-5


def test_query_embed_stays_frozen_under_accumulation():
    cfg = dataclasses.replace(
        Config(), train=TrainConfig(gradient_accumulation_steps=2))
    tx = make_optimizer(cfg, total_steps=100)
    params = _tiny_params()
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    for _ in range(4):
        updates, state = tx.update(grads, state, params)
        assert float(jnp.abs(updates["params"]["query_embed"]).max()) == 0.0
