"""Size the non-gradient residual of the train step on the real chip:

  full      — the production train step (grad + 3-group clip + Adam +
              span decode + train IoU + grad_norm logging)
  grad_only — value_and_grad(total_loss) alone
  fwd_only  — total_loss forward alone

full - grad_only = optimizer update + decode/logging overhead.
Timing discipline: chained dispatch, one scalar fetch (bench.py note).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mgsv_tpu.config import Config
    from mgsv_tpu.core.cache import enable as enable_cache
    from mgsv_tpu.models.made import MaDe
    from mgsv_tpu.train.objective import total_loss
    from mgsv_tpu.train.optimizer import make_optimizer
    from mgsv_tpu.train.step import create_state, make_train_step
    from __graft_entry__ import _example_batch

    enable_cache()
    bs = 512
    cfg = Config()
    model = MaDe(cfg)
    rng = np.random.RandomState(0)
    batch = {k: jax.device_put(v)
             for k, v in _example_batch(rng, cfg, bs=bs).items()}
    tx = make_optimizer(cfg, total_steps=10_000)
    state = create_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(model, cfg)
    key = jax.random.PRNGKey(1)
    results = {}

    for _ in range(2):
        state, log = train_step(state, batch, key)
        float(log["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, log = train_step(state, batch, key)
    float(log["loss"])
    results["full_ms"] = (time.perf_counter() - t0) / 20 * 1e3

    step_rng = jax.random.wrap_key_data(
        jnp.tile(jax.random.key_data(jax.random.fold_in(key, 0)), 2),
        impl="rbg")

    def loss_fn(params):
        out = model.apply(
            params, batch["frame_feats"], batch["frame_mask"],
            batch["segment_feats"], batch["segment_mask"],
            v_duration=batch.get("v_duration"), deterministic=False,
            rngs={"dropout": step_rng})
        loss, _ = total_loss(out, batch["spans_target"], cfg,
                             music_codes=batch.get("music_codes"))
        return loss

    def timed(fn, *args, steps=20, warmup=2, fetch=None):
        fetch = fetch or (lambda o: float(jnp.sum(jax.tree.leaves(o)[0])))
        for _ in range(warmup):
            fetch(fn(*args))
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        fetch(out)
        return (time.perf_counter() - t0) / steps * 1e3

    g = jax.jit(jax.value_and_grad(loss_fn))
    results["grad_only_ms"] = round(
        timed(g, state.params, fetch=lambda o: float(o[0])), 2)
    f = jax.jit(loss_fn)
    results["fwd_only_ms"] = round(timed(f, state.params, fetch=float), 2)
    results["full_ms"] = round(results["full_ms"], 2)
    results["residual_ms"] = round(
        results["full_ms"] - results["grad_only_ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
