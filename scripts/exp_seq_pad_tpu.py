"""Measure whether padding the fused DETR-encoder sequence L=146 to a
rounder sublane multiple (152/160/256) makes the fused kernel FASTER in
absolute time (VERDICT r2 lever (b): "L=146 lane misalignment").

The model's useful work is fixed at 146 tokens (50 frames + 96
snippets); padding adds masked tokens.  A padded L wins only if the
kernel's wall time at L_pad is LOWER than at 146 — relayout/tiling
effects would have to outweigh the extra FLOPs.

Timing discipline: chained dispatch, one scalar fetch (bench.py note).
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
        float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    from mgsv_tpu.core.cache import enable as enable_cache
    from mgsv_tpu.models.detr import DetrEncoderLayer
    from mgsv_tpu.ops.pallas.fused_encoder_layer_vjp import (
        fused_encoder_layer_train)

    enable_cache()
    B, D, H, F = 512, 256, 8, 1024
    rng = np.random.RandomState(0)
    layer = DetrEncoderLayer(D, H, F, dropout=0.1, pre_norm=False)
    x0 = jnp.asarray(rng.randn(B, 146, D), jnp.float32)
    m0 = jnp.ones((B, 146), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x0, m0, x0,
                        deterministic=True)
    seed = jnp.zeros((1,), jnp.int32)
    results = {}
    for L in (146, 152, 160, 192, 256):
        pad = L - 146
        x = jnp.pad(x0, ((0, 0), (0, pad), (0, 0)))
        pos = x
        mask = jnp.pad(m0, ((0, 0), (0, pad)))   # pad tokens invalid

        def step(params, x, mask, pos, seed):
            out = fused_encoder_layer_train(params, x, mask, pos, seed,
                                            heads=H, block_b=1, rate=0.1)
            return jnp.sum(out)

        fwd = jax.jit(step)
        g = jax.jit(jax.grad(step, argnums=(0, 1)))
        results[f"L{L}_fwd_ms"] = round(timed(fwd, params, x, mask, pos,
                                              seed), 2)
        results[f"L{L}_fwdbwd_ms"] = round(timed(g, params, x, mask, pos,
                                                 seed), 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
