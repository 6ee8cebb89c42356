"""Per-component step attribution on the real TPU chip.

The remote tunnel cannot capture XProf device traces, so attribution is done
by separately-compiled sub-programs with chained-dispatch timing (the same
discipline as bench.py: one scalar fetch at the end of a chain; never
block_until_ready, which returns early on this platform).

Measures at the paper config (bs=512, 50x512 frames, 96x768 snippets, D=256):
  full        — the real train step (current defaults)
  ret_grad    — grad of the retrieval loss only (towers + X-Pool + sims)
  loc_grad    — grad of the localization loss only (towers + DETR + matcher)
  xpool_grad  — grad of the isolated X-Pool chain
                (XPoolTransformer + pooled sim + clip loss) at [512] x [512,96,256]
  xpool_fwd   — same chain forward-only
"""

from __future__ import annotations

import functools
import json
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, steps=20, warmup=2, fetch=None):
    fetch = fetch or (lambda out: float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out)))
    out = None
    for _ in range(warmup):
        out = fn(*args)
        fetch(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / steps


def main():
    from mgsv_tpu.config import Config
    from mgsv_tpu.core.cache import enable as enable_cache
    from mgsv_tpu.models.made import MaDe
    from mgsv_tpu.train.objective import total_loss, retrieval_loss
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

    # train_step donates the state buffer: thread the new state through
    # (reusing the donated input is an InvalidArgument on the backend).
    for _ in range(2):
        state, log = train_step(state, batch, key)
        float(log["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, log = train_step(state, batch, key)
    float(log["loss"])
    t = (time.perf_counter() - t0) / 20
    results["full_ms"] = t * 1e3; print("full", results["full_ms"], flush=True)
    results["clips_per_sec"] = bs / t

    def fwd(params, det):
        return model.apply(params, batch["frame_feats"], batch["frame_mask"],
                           batch["segment_feats"], batch["segment_mask"],
                           deterministic=det,
                           rngs=None if det else {"dropout": key})

    @jax.jit
    def ret_grad(params):
        def f(p):
            out = fwd(p, False)
            loss, _ = retrieval_loss(out, cfg)
            return loss
        return jax.grad(f)(params)

    @jax.jit
    def loc_grad(params):
        def f(p):
            out = fwd(p, False)
            loss, log = total_loss(out, batch["spans_target"], cfg)
            return log["localization_loss"]
        return jax.grad(f)(params)

    fetchg = lambda g: float(jnp.sum(jax.tree.leaves(g)[0]))
    results["ret_grad_ms"] = timed(ret_grad, (state.params,), fetch=fetchg) * 1e3; print("ret", results["ret_grad_ms"], flush=True)
    results["loc_grad_ms"] = timed(loc_grad, (state.params,), fetch=fetchg) * 1e3; print("loc", results["loc_grad_ms"], flush=True)

    # isolated X-Pool chain at post-tower shapes
    from mgsv_tpu.models.xpool import XPoolTransformer, sim_matrix_music_pooling
    from mgsv_tpu.ops.losses import clip_loss

    d = cfg.model.dim_input
    video = jnp.asarray(rng.randn(bs, d), jnp.float32)
    segs = jnp.asarray(rng.randn(bs, 96, d), jnp.float32)
    smask = jnp.asarray((rng.rand(bs, 96) < 0.8), jnp.float32)
    xpool = XPoolTransformer(d, dropout=cfg.model.xpool_dropout)
    xp = xpool.init(jax.random.PRNGKey(0), video, segs, smask,
                    deterministic=True)

    def chain(p, v, s):
        pooled = xpool.apply(p, v, s, smask, deterministic=False,
                             rngs={"dropout": key})
        sim = sim_matrix_music_pooling(v, pooled)
        return clip_loss(sim, jnp.float32(np.log(1 / 0.03)))

    xf = jax.jit(chain)
    results["xpool_fwd_ms"] = timed(xf, (xp, video, segs), fetch=float) * 1e3
    xg = jax.jit(jax.grad(chain, argnums=(0, 1, 2)))
    results["xpool_grad_ms"] = timed(
        xg, (xp, video, segs),
        fetch=lambda g: float(jnp.sum(g[1]))) * 1e3

    # remat variant of the same chain
    xg_remat = jax.jit(jax.grad(
        jax.checkpoint(chain, policy=jax.checkpoint_policies.nothing_saveable),
        argnums=(0, 1, 2)))
    results["xpool_grad_remat_ms"] = timed(
        xg_remat, (xp, video, segs),
        fetch=lambda g: float(jnp.sum(g[1]))) * 1e3

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
