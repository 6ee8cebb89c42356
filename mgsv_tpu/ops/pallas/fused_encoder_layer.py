"""Fused post-norm transformer encoder layer (forward), Pallas TPU.

Motivation (BASELINE.md round-1 attribution): one DETR encoder layer at
bs=512, L=146, D=256 runs at ~25% of roofline under XLA — the [B, H, L, L]
attention matrices and layer intermediates bounce through HBM with
unaligned-146 layouts.  This kernel computes the ENTIRE post-norm layer
(packed q/k GEMM on pos-embedded tokens, per-head attention, out-proj,
residual, LN1, FFN, residual, LN2) for a block of batch rows with every
intermediate resident in VMEM — one HBM read of the inputs, one write of
the output.

Eval/serving path (deterministic; dropout is a no-op there).  Training
keeps the XLA layer until the custom-VJP twin lands (ROADMAP #1/#2).
Matches mgsv_tpu.models.detr.DetrEncoderLayer(pre_norm=False) numerics.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _layer_norm(x, gamma, beta, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def _fused_layer_kernel(x_ref, pos_ref, mask_ref,
                        wqk_ref, bqk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                        g1_ref, b1_ref, w1_ref, bb1_ref, w2_ref, bb2_ref,
                        g2_ref, b2_ref, out_ref, *, heads):
    bb, L, d = x_ref.shape
    head_dim = d // heads

    for r in range(bb):
        x = x_ref[r]                                         # [L, D]
        qk_in = x + pos_ref[r]
        qk = jnp.dot(qk_in, wqk_ref[:],
                     preferred_element_type=jnp.float32) + bqk_ref[:]
        q, k = qk[:, :d], qk[:, d:]
        v = jnp.dot(x, wv_ref[:],
                    preferred_element_type=jnp.float32) + bv_ref[:]

        mask_row = mask_ref[r, 0]                            # [L]
        scale = 1.0 / (head_dim ** 0.5)
        ctx_parts = []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # [L, L]
            s = jnp.where(mask_row[None, :] != 0, s, NEG_INF)
            s = s - s.max(axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / p.sum(axis=-1, keepdims=True)
            ctx_parts.append(jnp.dot(p, v[:, sl],
                                     preferred_element_type=jnp.float32))
        ctx = jnp.concatenate(ctx_parts, axis=-1)            # [L, D]

        attn_out = jnp.dot(ctx, wo_ref[:],
                           preferred_element_type=jnp.float32) + bo_ref[:]
        x = _layer_norm(x + attn_out, g1_ref[:], b1_ref[:])
        h1 = jnp.maximum(
            jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
            + bb1_ref[:], 0.0)
        h2 = jnp.dot(h1, w2_ref[:],
                     preferred_element_type=jnp.float32) + bb2_ref[:]
        out_ref[r] = _layer_norm(x + h2, g2_ref[:], b2_ref[:])


def fused_encoder_layer(
    x: jnp.ndarray,        # [B, L, D]
    mask: jnp.ndarray,     # [B, L] 1 = valid
    pos: jnp.ndarray,      # [B, L, D]
    params: Dict,          # DetrEncoderLayer param subtree
    heads: int = 8,
    block_b: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Forward of DetrEncoderLayer(pre_norm=False), deterministic."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p = params["params"] if "params" in params else params
    b, L, d = x.shape

    sa = p["self_attn"]
    wqk = jnp.concatenate([sa["q_proj"]["kernel"], sa["k_proj"]["kernel"]], axis=1)
    bqk = jnp.concatenate([sa["q_proj"]["bias"], sa["k_proj"]["bias"]], axis=0)

    pad_b = (-b) % block_b
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        pos = jnp.pad(pos, ((0, pad_b), (0, 0), (0, 0)))
        mask = jnp.concatenate(
            [mask, jnp.zeros((pad_b, L), mask.dtype).at[:, 0].set(1)], axis=0)
    bp = x.shape[0]

    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple([0] * len(shape)), memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((block_b, L, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_fused_layer_kernel, heads=heads),
        grid=(bp // block_b,),
        in_specs=[
            blk3,                                             # x
            blk3,                                             # pos
            pl.BlockSpec((block_b, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # mask [B,1,L]
            rep(wqk.shape), rep(bqk.shape),
            rep(sa["v_proj"]["kernel"].shape), rep(sa["v_proj"]["bias"].shape),
            rep(sa["out_proj"]["kernel"].shape), rep(sa["out_proj"]["bias"].shape),
            rep(p["norm1"]["scale"].shape), rep(p["norm1"]["bias"].shape),
            rep(p["linear1"]["kernel"].shape), rep(p["linear1"]["bias"].shape),
            rep(p["linear2"]["kernel"].shape), rep(p["linear2"]["bias"].shape),
            rep(p["norm2"]["scale"].shape), rep(p["norm2"]["bias"].shape),
        ],
        out_specs=blk3,
        out_shape=jax.ShapeDtypeStruct((bp, L, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=bp * L * (2 * d * 2 * d + 2 * d * d * 2 + 4 * L * d
                            + 4 * d * 1024),
            bytes_accessed=2 * x.size * 4,
            transcendentals=bp * heads * L * L,
        ),
    )(x.astype(jnp.float32), pos.astype(jnp.float32),
      mask.astype(jnp.float32)[:, None, :],
      wqk, bqk, sa["v_proj"]["kernel"], sa["v_proj"]["bias"],
      sa["out_proj"]["kernel"], sa["out_proj"]["bias"],
      p["norm1"]["scale"], p["norm1"]["bias"],
      p["linear1"]["kernel"], p["linear1"]["bias"],
      p["linear2"]["kernel"], p["linear2"]["bias"],
      p["norm2"]["scale"], p["norm2"]["bias"])

    return out[:b]
