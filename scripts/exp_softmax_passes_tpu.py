"""Experiment: fewer softmax/VPU passes in the fused encoder layer (fwd).

ROADMAP remaining-idea #2 (the only untried structural lever): the fused
encoder kernel runs ~6 elementwise VPU passes over each [L, L] score tile
per head (scale-mul, mask-where, max-sub, exp, sum-div, dropout-mul)
between the two MXU ops.  This script measures three forward variants
in isolation against the production kernel at the paper shape
(bs=512, L=146, D=256, heads=8, rate=0.1):

  A baseline    production kernel (ops/pallas/fused_encoder_layer.py)
  B fma+fold    scale*s+bias additive mask in one fma pass (no where);
                1/sum folded into the [L, 32] ctx columns instead of a
                [L, L] divide; dropout folded into the un-normalized exp
  C nomax       B + skip the max-subtraction entirely (numerically unsafe
                in general — measured only to price the max pass)

Decision rule: port B into the production fwd+bwd kernels only if it wins
>= ~5% on the forward; otherwise log a null in ROADMAP.md.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _layer_norm(x, gamma, beta, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def _keep_mask(seed, row_tag, site, shape, rate):
    pltpu.prng_seed(seed, row_tag * 32 + site)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = np.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return (bits >= thresh).astype(jnp.float32) * (1.0 / (1.0 - rate))


def _variant_kernel(x_ref, pos_ref, mask_ref, seed_ref,
                    wqk_ref, bqk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                    g1_ref, b1_ref, w1_ref, bb1_ref, w2_ref, bb2_ref,
                    g2_ref, b2_ref, out_ref, *, heads, rate, use_max):
    bb, L, d = x_ref.shape
    head_dim = d // heads
    for r in range(bb):
        row_tag = pl.program_id(0) * bb + r
        x = x_ref[r]
        qk_in = x + pos_ref[r]
        qk = jnp.dot(qk_in, wqk_ref[:],
                     preferred_element_type=jnp.float32) + bqk_ref[:]
        q, k = qk[:, :d], qk[:, d:]
        v = jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32) + bv_ref[:]

        mask_row = mask_ref[r, 0]
        scale = 1.0 / (head_dim ** 0.5)
        # additive mask bias: one [1, L] vector, folded into the scale fma
        bias = (mask_row - 1.0) * 1e9                       # 0 valid, -1e9 pad
        ctx_parts = []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + bias[None, :]                   # one fma pass
            if use_max:
                s = s - s.max(axis=-1, keepdims=True)
            e = jnp.exp(s)                                  # un-normalized
            recip = 1.0 / e.sum(axis=-1, keepdims=True)     # [L, 1]
            if rate > 0.0:
                m = _keep_mask(seed_ref[0], row_tag, h, (L, L), rate)
                e = e * m
            # 1/sum folded into the narrow ctx columns, not the [L, L] tile
            ctx_parts.append(
                jnp.dot(e, v[:, sl], preferred_element_type=jnp.float32)
                * recip)
        ctx = jnp.concatenate(ctx_parts, axis=-1)

        attn_out = jnp.dot(ctx, wo_ref[:],
                           preferred_element_type=jnp.float32) + bo_ref[:]
        if rate > 0.0:
            m2 = _keep_mask(seed_ref[0], row_tag, heads, (L, d), rate)
            attn_out = attn_out * m2
        x = _layer_norm(x + attn_out, g1_ref[:], b1_ref[:])
        h1 = jnp.maximum(
            jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
            + bb1_ref[:], 0.0)
        if rate > 0.0:
            m3 = _keep_mask(seed_ref[0], row_tag, heads + 1, h1.shape, rate)
            h1 = h1 * m3
        h2 = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32) + bb2_ref[:]
        if rate > 0.0:
            m4 = _keep_mask(seed_ref[0], row_tag, heads + 2, (L, d), rate)
            h2 = h2 * m4
        out_ref[r] = _layer_norm(x + h2, g2_ref[:], b2_ref[:])


def variant_layer(x, mask, pos, params, heads=8, block_b=1, rate=0.0,
                  seed=None, use_max=True):
    p = params["params"] if "params" in params else params
    b, L, d = x.shape
    sa = p["self_attn"]
    wqk = jnp.concatenate([sa["q_proj"]["kernel"], sa["k_proj"]["kernel"]], axis=1)
    bqk = jnp.concatenate([sa["q_proj"]["bias"], sa["k_proj"]["bias"]], axis=0)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)

    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple([0] * len(shape)), memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((block_b, L, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_variant_kernel, heads=heads, rate=rate,
                          use_max=use_max),
        grid=(b // block_b,),
        in_specs=[
            blk3, blk3,
            pl.BlockSpec((block_b, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            rep(wqk.shape), rep(bqk.shape),
            rep(sa["v_proj"]["kernel"].shape), rep(sa["v_proj"]["bias"].shape),
            rep(sa["out_proj"]["kernel"].shape), rep(sa["out_proj"]["bias"].shape),
            rep(p["norm1"]["scale"].shape), rep(p["norm1"]["bias"].shape),
            rep(p["linear1"]["kernel"].shape), rep(p["linear1"]["bias"].shape),
            rep(p["linear2"]["kernel"].shape), rep(p["linear2"]["bias"].shape),
            rep(p["norm2"]["scale"].shape), rep(p["norm2"]["bias"].shape),
        ],
        out_specs=blk3,
        out_shape=jax.ShapeDtypeStruct((b, L, d), jnp.float32),
        interpret=False,
    )(x.astype(jnp.float32), pos.astype(jnp.float32),
      mask.astype(jnp.float32)[:, None, :],
      seed.astype(jnp.int32).reshape((1,)),
      wqk, bqk, sa["v_proj"]["kernel"], sa["v_proj"]["bias"],
      sa["out_proj"]["kernel"], sa["out_proj"]["bias"],
      p["norm1"]["scale"], p["norm1"]["bias"],
      p["linear1"]["kernel"], p["linear1"]["bias"],
      p["linear2"]["kernel"], p["linear2"]["bias"],
      p["norm2"]["scale"], p["norm2"]["bias"])


def timed(fn, *args, steps=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    from mgsv_tpu.core.cache import enable as enable_cache
    from mgsv_tpu.models.detr import DetrEncoderLayer
    from mgsv_tpu.ops.pallas.fused_encoder_layer import fused_encoder_layer

    enable_cache()
    B, L, D = 512, 146, 256
    rng = np.random.RandomState(0)
    f32 = lambda *shape: jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)
    layer = DetrEncoderLayer(D, 8, 1024, dropout=0.0, pre_norm=False)
    x, pos = f32(B, L, D), f32(B, L, D)
    mask = jnp.asarray((rng.rand(B, L) < 0.9).astype(np.float32))
    p = layer.init(jax.random.PRNGKey(0), x, mask, pos, deterministic=True)
    seed = jnp.ones((1,), jnp.int32)
    results = {}

    # correctness of variant B vs production at rate=0 (same math)
    base = jax.jit(functools.partial(fused_encoder_layer, params=p, heads=8,
                                     block_b=1, rate=0.0, interpret=False))
    varB = jax.jit(functools.partial(variant_layer, params=p, heads=8,
                                     block_b=1, rate=0.0, use_max=True))
    err = float(jnp.max(jnp.abs(base(x, mask, pos) - varB(x, mask, pos))))
    results["variantB_max_abs_err_rate0"] = err

    for rate in (0.0, 0.1):
        base = jax.jit(functools.partial(
            fused_encoder_layer, params=p, heads=8, block_b=1, rate=rate,
            seed=seed, interpret=False))
        results[f"A_prod_fwd_rate{rate}"] = timed(base, x, mask, pos)
        for tag, use_max in (("B_fold", True), ("C_nomax", False)):
            v = jax.jit(functools.partial(
                variant_layer, params=p, heads=8, block_b=1, rate=rate,
                seed=seed, use_max=use_max))
            results[f"{tag}_fwd_rate{rate}"] = timed(v, x, mask, pos)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
