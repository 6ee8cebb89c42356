"""On-chip attribution of the two hot fused kernels (round 3).

Both kernels sit far from roofline (encoder ~31 TF/s, X-Pool chain
~15 TF/s fwd+bwd vs 197 bf16 peak) yet HBM traffic accounts for <5% of
their runtime — so the limiter is kernel *structure*: in-kernel PRNG
draws, softmax VPU passes, per-head relayouts.  This script isolates each
suspect by timing the kernels with individual features toggled:

  encoder: rate=0 vs paper 0.1   -> PRNG + mask-multiply cost
  xpool:   rate=0 vs paper 0.3   -> PRNG cost at 512^2 pair granularity
  both:    fwd vs fwd+bwd        -> backward recompute structure

Timing discipline: chained dispatch, one scalar fetch (bench.py note —
block_until_ready returns early on this remote platform).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, steps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    from mgsv_tpu.core.cache import enable as enable_cache
    from mgsv_tpu.models.detr import DetrEncoderLayer
    from mgsv_tpu.ops.pallas.fused_encoder_layer import fused_encoder_layer
    from mgsv_tpu.ops.pallas.fused_encoder_layer_vjp import (
        fused_encoder_layer_train)
    from mgsv_tpu.ops.pallas.xpool_sim_vjp import _xpool_core

    enable_cache()
    results = {}
    B, L, D, S = 512, 146, 256, 96
    rng = np.random.RandomState(0)
    f32 = lambda *shape: jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)

    # ---------------- fused encoder layer ----------------
    layer = DetrEncoderLayer(D, 8, 1024, dropout=0.0, pre_norm=False)
    x, pos = f32(B, L, D), f32(B, L, D)
    mask = jnp.asarray((rng.rand(B, L) < 0.9).astype(np.float32))
    p = layer.init(jax.random.PRNGKey(0), x, mask, pos, deterministic=True)
    seed = jnp.ones((1,), jnp.int32)

    for rate in (0.0, 0.1):
        fwd = jax.jit(functools.partial(
            fused_encoder_layer, params=p, heads=8, block_b=1, rate=rate,
            seed=seed, interpret=False))
        results[f"enc_fwd_rate{rate}"] = timed(fwd, x, mask, pos)

        def loss(xx):
            return fused_encoder_layer_train(
                p, xx, mask, pos, seed, 8, 1, False, rate).sum()
        g = jax.jit(jax.grad(loss))
        results[f"enc_fwdbwd_rate{rate}"] = timed(g, x)

    # ---------------- fused X-Pool similarity ----------------
    q, vhat = f32(B, D), f32(B, D)
    k, v = f32(B, S, D), f32(B, S, D)
    smask = jnp.asarray((rng.rand(B, S) < 0.8).astype(np.float32))
    wout, wlin = f32(D, D), f32(D, D)
    bout, blin = f32(D), f32(D)
    g2 = jnp.ones((D,)); b2 = jnp.zeros((D,))
    g3 = jnp.ones((D,)); b3 = jnp.zeros((D,))

    for rate in (0.0, 0.3):
        core = functools.partial(_xpool_core, rate=rate, block_v=512,
                                 block_m=8, interpret=False)
        fwd = jax.jit(lambda *a: core(*a))
        args = (q, k, v, smask, vhat, wout, bout, g2, b2, wlin, blin, g3, b3,
                seed)
        results[f"xpool_fwd_rate{rate}"] = timed(fwd, *args)

        def loss(qq, kk, vv, vh, *w):
            return core(qq, kk, vv, smask, vh, *w, seed).sum()
        g = jax.jit(jax.grad(loss, argnums=tuple(range(4 + 8))))
        results[f"xpool_fwdbwd_rate{rate}"] = timed(
            g, q, k, v, vhat, wout, bout, g2, b2, wlin, blin, g3, b3)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
