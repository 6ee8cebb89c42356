"""Does padding the video tower's L=50 (not a sublane multiple) to 56/64
make the XLA tower faster in absolute time, the way padding the fused
DETR sequence 146->152 did?  Audio is already L=96 (aligned) — measured
as a control at 96 vs 104 (a pad should only ever hurt there).

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
    from mgsv_tpu.config import Config
    from mgsv_tpu.core.cache import enable as enable_cache
    from mgsv_tpu.models.made import Tower

    enable_cache()
    cfg = Config()
    m = cfg.model
    B, D = 512, m.dim_input
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)
    rbg_key = jax.random.wrap_key_data(
        jnp.tile(jax.random.key_data(key), 2), impl="rbg")
    results = {}

    for tag, L0, raw_dim, pe_len, pads in (
            ("video", 50, 512, m.video_pe_len, (0, 6, 14)),
            ("audio", 96, 768, m.audio_pe_len, (0, 8))):
        f0 = rng.randn(B, L0, raw_dim).astype(np.float32)
        m0 = (rng.rand(B, L0) < 0.8).astype(np.float32)
        tower = Tower(D, pe_len, m.temporal_depth, m.temporal_heads,
                      m.temporal_mlp_dim, m.temporal_dropout,
                      dtype=jnp.bfloat16)
        params = tower.init(jax.random.PRNGKey(0), jnp.asarray(f0),
                            jnp.asarray(m0), deterministic=True)
        for pad in pads:
            ff = jnp.asarray(np.pad(f0, ((0, 0), (0, pad), (0, 0))))
            fm = jnp.asarray(np.pad(m0, ((0, 0), (0, pad))))

            def loss(p, ff=ff, fm=fm):
                tok, emb, _ = tower.apply(
                    p, ff, fm, deterministic=False,
                    rngs={"dropout": rbg_key})
                return jnp.sum(emb) + jnp.sum(tok)

            g = jax.jit(jax.grad(loss))
            results[f"{tag}_L{L0 + pad}_fwdbwd_ms"] = round(
                timed(g, params), 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
