"""Isolated tower cost at paper shapes (round-3 attribution follow-up).

ret_grad (26.4 ms) minus the fused X-Pool kernel (~4-5 ms) leaves ~20 ms
unattributed — the two temporal towers are the suspect.  Times the towers'
fwd+bwd alone (paper dropout 0.8 vs deterministic), plus the DETR decoder
stack and the criterion, to complete the step budget.
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
    from mgsv_tpu.config import Config
    from mgsv_tpu.core.cache import enable as enable_cache
    from mgsv_tpu.models.made import MaDe, Tower

    enable_cache()
    cfg = Config()
    m = cfg.model
    B, D = 512, m.dim_input
    rng = np.random.RandomState(0)
    results = {}

    ff = jnp.asarray(rng.randn(B, 50, 512).astype(np.float32))
    fm = jnp.asarray((rng.rand(B, 50) < 0.8).astype(np.float32))
    sf = jnp.asarray(rng.randn(B, 96, 768).astype(np.float32))
    sm = jnp.asarray((rng.rand(B, 96) < 0.8).astype(np.float32))
    key = jax.random.PRNGKey(1)

    def make_tower(pe_len):
        return Tower(D, pe_len, m.temporal_depth, m.temporal_heads,
                     m.temporal_mlp_dim, m.temporal_dropout,
                     dtype=jnp.bfloat16)

    vt, at = make_tower(m.video_pe_len), make_tower(m.audio_pe_len)
    vp = vt.init(jax.random.PRNGKey(0), ff, fm, deterministic=True)
    ap = at.init(jax.random.PRNGKey(0), sf, sm, deterministic=True)

    rbg_key = jax.random.wrap_key_data(
        jnp.tile(jax.random.key_data(key), 2), impl="rbg")
    for det, k, tag in ((True, None, "det"), (False, key, "drop0.8"),
                        (False, rbg_key, "drop0.8_rbg")):
        def loss(vparams, aparams):
            kw = dict(deterministic=det,
                      rngs=None if det else {"dropout": k})
            ftok, vemb, _ = vt.apply(vparams, ff, fm, **kw)
            stok, memb, _ = at.apply(aparams, sf, sm, **kw)
            return (jnp.sum(ftok) + jnp.sum(vemb)
                    + jnp.sum(stok) + jnp.sum(memb))

        results[f"towers_fwd_{tag}"] = timed(jax.jit(loss), vp, ap)
        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        results[f"towers_fwdbwd_{tag}"] = timed(g, vp, ap)

    # DETR decoder stack + criterion, isolated
    from mgsv_tpu.models.detr import DetrTransformer
    from mgsv_tpu.ops.losses import set_criterion
    from mgsv_tpu.models import layers as L

    fused = jnp.asarray(rng.randn(B, 146, D).astype(np.float32) * 0.05)
    fmask = jnp.asarray((rng.rand(B, 146) < 0.9).astype(np.float32))
    pos = L.position_embedding_sine(fmask, D)
    qe = jnp.asarray(rng.randn(1, D).astype(np.float32))
    tgt = jnp.asarray(rng.randn(B, 1, D).astype(np.float32) * 0.05)

    detr = DetrTransformer(D, m.detr_heads, m.detr_ffn_dim, 0,
                           m.detr_dec_layers, dropout=m.detr_dropout,
                           pre_norm=m.detr_pre_norm,
                           decoder_self_attn=m.decoder_self_attn,
                           dtype=jnp.bfloat16, fused_encoder=False)
    dp = detr.init(jax.random.PRNGKey(0), fused, fmask, pos, qe, tgt,
                   deterministic=True)

    def dec_loss(params):
        hidden, memory = detr.apply(params, fused, fmask, pos, qe, tgt,
                                    deterministic=False,
                                    rngs={"dropout": key})
        return jnp.sum(hidden) + jnp.sum(memory) * 0.0

    results["decoder6_fwdbwd"] = timed(jax.jit(jax.grad(dec_loss)), dp)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
