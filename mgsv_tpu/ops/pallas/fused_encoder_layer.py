"""Fused post-norm transformer encoder layer (forward), Pallas TPU.

Motivation (BASELINE.md round-1 attribution): one DETR encoder layer at
bs=512, L=146, D=256 runs at ~25% of roofline under XLA — the [B, H, L, L]
attention matrices and layer intermediates bounce through HBM with
unaligned-146 layouts.  This kernel computes the ENTIRE post-norm layer
(packed q/k GEMM on pos-embedded tokens, per-head attention, out-proj,
residual, LN1, FFN, residual, LN2) for a block of batch rows with every
intermediate resident in VMEM — one HBM read of the inputs, one write of
the output.

Dropout (training): the reference layer applies dropout at four sites
(torch nn.MultiheadAttention's attention-weight dropout plus the three
explicit sites in music_detr/transformer.py:163-168 — after attention,
inside the FFN after ReLU, after the FFN output).  Materializing those
masks in HBM would cost ~350 MB/step at bs=512, so they are generated
*inside* the kernel with the TPU hardware PRNG (pltpu.prng_seed /
prng_random_bits) and regenerated bit-identically in the backward kernel's
recompute (same seed, same draw order) — flash-attention-style, nothing
random ever leaves VMEM.  On CPU (interpret mode) the hardware PRNG is
unavailable; there the rate>0 path falls back to a pure-JAX mask-fixed
implementation whose masks are drawn from jax.random(seed) identically in
forward and backward.

Matches mgsv_tpu.models.detr.DetrEncoderLayer(pre_norm=False) numerics.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

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
    """Inverted-dropout keep mask from the in-kernel TPU PRNG.

    P(keep) = 1 - rate; kept values scaled by 1/(1-rate) (torch semantics).
    The PRNG is re-seeded with (seed, global_row, site) before every draw,
    so any mask is regenerable on demand — at its use sites in the backward
    kernel's recompute AND backward halves — without draw-order coupling or
    VMEM storage.  Sites: 0..heads-1 attention weights per head, heads
    attn-out, heads+1 post-ReLU FFN, heads+2 FFN-out.
    """
    # Mosaic supports at most 2 seed operands: fold (row, site) into one.
    pltpu.prng_seed(seed, row_tag * 32 + site)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = np.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return (bits >= thresh).astype(jnp.float32) * (1.0 / (1.0 - rate))


def _fused_layer_kernel(x_ref, pos_ref, mask_ref, seed_ref,
                        wqk_ref, bqk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                        g1_ref, b1_ref, w1_ref, bb1_ref, w2_ref, bb2_ref,
                        g2_ref, b2_ref, out_ref, *mask_refs,
                        heads, rate, emit_masks, mxu_dtype=None):
    bb, L, d = x_ref.shape
    head_dim = d // heads
    # bf16 MXU tiles: cast matmul operands, accumulate f32 (LN/softmax/
    # dropout stay f32) — matches the model's compute_dtype story.
    cast = (lambda t: t) if mxu_dtype is None else (lambda t: t.astype(mxu_dtype))

    for r in range(bb):
        row_tag = pl.program_id(0) * bb + r
        # Operands may arrive bf16 (operand_dtype="bf16": halves the HBM
        # read of x/pos when the caller computes in bf16 anyway); all
        # in-kernel math stays f32 regardless.
        x = x_ref[r].astype(jnp.float32)                     # [L, D]
        qk_in = x + pos_ref[r].astype(jnp.float32)
        qk = jnp.dot(cast(qk_in), cast(wqk_ref[:]),
                     preferred_element_type=jnp.float32) + bqk_ref[:]
        q, k = qk[:, :d], qk[:, d:]
        v = jnp.dot(cast(x), cast(wv_ref[:]),
                    preferred_element_type=jnp.float32) + bv_ref[:]

        mask_row = mask_ref[r, 0]                            # [L]
        scale = 1.0 / (head_dim ** 0.5)
        ctx_parts = []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = jax.lax.dot_general(
                cast(q[:, sl]), cast(k[:, sl]), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # [L, L]
            s = jnp.where(mask_row[None, :] != 0, s, NEG_INF)
            s = s - s.max(axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / p.sum(axis=-1, keepdims=True)
            if rate > 0.0:
                m = _keep_mask(seed_ref[0], row_tag, h, (L, L), rate)
                if emit_masks:
                    mask_refs[0][r, h] = m
                p = p * m
            ctx_parts.append(jnp.dot(cast(p), cast(v[:, sl]),
                                     preferred_element_type=jnp.float32))
        ctx = jnp.concatenate(ctx_parts, axis=-1)            # [L, D]

        attn_out = jnp.dot(cast(ctx), cast(wo_ref[:]),
                           preferred_element_type=jnp.float32) + bo_ref[:]
        if rate > 0.0:
            m2 = _keep_mask(seed_ref[0], row_tag, heads, (L, d), rate)
            if emit_masks:
                mask_refs[1][r] = m2
            attn_out = attn_out * m2
        x = _layer_norm(x + attn_out, g1_ref[:], b1_ref[:])
        h1 = jnp.maximum(
            jnp.dot(cast(x), cast(w1_ref[:]),
                    preferred_element_type=jnp.float32)
            + bb1_ref[:], 0.0)
        if rate > 0.0:
            m3 = _keep_mask(seed_ref[0], row_tag, heads + 1, h1.shape, rate)
            if emit_masks:
                mask_refs[2][r] = m3
            h1 = h1 * m3
        h2 = jnp.dot(cast(h1), cast(w2_ref[:]),
                     preferred_element_type=jnp.float32) + bb2_ref[:]
        if rate > 0.0:
            m4 = _keep_mask(seed_ref[0], row_tag, heads + 2, (L, d), rate)
            if emit_masks:
                mask_refs[3][r] = m4
            h2 = h2 * m4
        out_ref[r] = _layer_norm(x + h2, g2_ref[:], b2_ref[:])


def jax_dropout_masks(seed, b, L, d, f, heads, rate):
    """CPU-fallback masks: the same four dropout sites, from jax.random.

    Deterministic in `seed`, so the backward pass regenerates identical
    masks — mirroring the TPU kernel's PRNG-recompute contract.
    """
    key = jax.random.PRNGKey(seed.reshape(())[()] if hasattr(seed, "reshape")
                             else seed)
    ks = jax.random.split(key, 4)
    inv = 1.0 / (1.0 - rate)
    draw = lambda k, shp: (
        (jax.random.uniform(k, shp) >= rate).astype(jnp.float32) * inv)
    return {
        "attn": draw(ks[0], (b, heads, L, L)),
        "attn_out": draw(ks[1], (b, L, d)),
        "ffn1": draw(ks[2], (b, L, f)),
        "ffn2": draw(ks[3], (b, L, d)),
    }


def layer_fwd_with_masks(p, x, mask, pos, masks, heads):
    """Pure-JAX post-norm encoder layer with explicit dropout masks.

    Differentiable reference for the fused kernels: CPU fallback when the
    hardware PRNG is unavailable, and the oracle the TPU kernels are tested
    against (feed it the kernel's emitted masks; outputs and grads must
    match).  masks=None disables dropout.
    """
    b, L, d = x.shape
    head_dim = d // heads
    sa = p["self_attn"]
    a = x + pos
    q = a @ sa["q_proj"]["kernel"] + sa["q_proj"]["bias"]
    k = a @ sa["k_proj"]["kernel"] + sa["k_proj"]["bias"]
    v = x @ sa["v_proj"]["kernel"] + sa["v_proj"]["bias"]
    split = lambda t: t.reshape(b, L, heads, head_dim)
    s = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)) / (head_dim ** 0.5)
    s = jnp.where(mask[:, None, None, :] != 0, s, NEG_INF)
    attn = jax.nn.softmax(s, axis=-1)
    if masks is not None:
        attn = attn * masks["attn"]
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, split(v)).reshape(b, L, d)
    o = ctx @ sa["out_proj"]["kernel"] + sa["out_proj"]["bias"]
    if masks is not None:
        o = o * masks["attn_out"]
    y1 = _layer_norm(x + o, p["norm1"]["scale"], p["norm1"]["bias"])
    h1 = jnp.maximum(y1 @ p["linear1"]["kernel"] + p["linear1"]["bias"], 0.0)
    if masks is not None:
        h1 = h1 * masks["ffn1"]
    h2 = h1 @ p["linear2"]["kernel"] + p["linear2"]["bias"]
    if masks is not None:
        h2 = h2 * masks["ffn2"]
    return _layer_norm(y1 + h2, p["norm2"]["scale"], p["norm2"]["bias"])


def fused_encoder_layer(
    x: jnp.ndarray,        # [B, L, D]
    mask: jnp.ndarray,     # [B, L] 1 = valid
    pos: jnp.ndarray,      # [B, L, D]
    params: Dict,          # DetrEncoderLayer param subtree
    heads: int = 8,
    block_b: int = 8,
    interpret: bool | None = None,
    rate: float = 0.0,
    seed: Optional[jnp.ndarray] = None,   # int32 [1]; required when rate > 0
    return_masks: bool = False,
    precision: str = "f32",               # "f32" | "bf16" MXU tiles
    operand_dtype: str = "f32",           # "f32" | "bf16" x/pos HBM I/O
) -> jnp.ndarray:
    """Forward of DetrEncoderLayer(pre_norm=False); in-kernel dropout when
    rate > 0 (training)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p = params["params"] if "params" in params else params
    b, L, d = x.shape
    f = p["linear1"]["kernel"].shape[1]

    if rate > 0.0 and seed is None:
        raise ValueError(
            "fused_encoder_layer: rate > 0 requires an explicit int32 seed "
            "(a silent default would draw identical dropout masks every step)")
    if rate > 0.0 and interpret:
        # Hardware PRNG is TPU-only; mask-fixed JAX fallback on CPU.
        masks = jax_dropout_masks(seed, b, L, d, f, heads, rate)
        out = layer_fwd_with_masks(p, x.astype(jnp.float32), mask,
                                   pos.astype(jnp.float32), masks, heads)
        return (out, masks) if return_masks else out

    sa = p["self_attn"]
    wqk = jnp.concatenate([sa["q_proj"]["kernel"], sa["k_proj"]["kernel"]], axis=1)
    bqk = jnp.concatenate([sa["q_proj"]["bias"], sa["k_proj"]["bias"]], axis=0)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)

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

    out_shapes = [jax.ShapeDtypeStruct((bp, L, d), jnp.float32)]
    out_specs = [blk3]
    emit_masks = return_masks and rate > 0.0
    if emit_masks:
        out_shapes += [
            jax.ShapeDtypeStruct((bp, heads, L, L), jnp.float32),
            jax.ShapeDtypeStruct((bp, L, d), jnp.float32),
            jax.ShapeDtypeStruct((bp, L, f), jnp.float32),
            jax.ShapeDtypeStruct((bp, L, d), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((block_b, heads, L, L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            blk3,
            pl.BlockSpec((block_b, L, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            blk3,
        ]

    mxu_dtype = jnp.bfloat16 if precision == "bf16" else None
    op_dt = jnp.bfloat16 if operand_dtype == "bf16" else jnp.float32
    outs = pl.pallas_call(
        functools.partial(_fused_layer_kernel, heads=heads, rate=rate,
                          emit_masks=emit_masks, mxu_dtype=mxu_dtype),
        grid=(bp // block_b,),
        in_specs=[
            blk3,                                             # x
            blk3,                                             # pos
            pl.BlockSpec((block_b, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # mask [B,1,L]
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            rep(wqk.shape), rep(bqk.shape),
            rep(sa["v_proj"]["kernel"].shape), rep(sa["v_proj"]["bias"].shape),
            rep(sa["out_proj"]["kernel"].shape), rep(sa["out_proj"]["bias"].shape),
            rep(p["norm1"]["scale"].shape), rep(p["norm1"]["bias"].shape),
            rep(p["linear1"]["kernel"].shape), rep(p["linear1"]["bias"].shape),
            rep(p["linear2"]["kernel"].shape), rep(p["linear2"]["bias"].shape),
            rep(p["norm2"]["scale"].shape), rep(p["norm2"]["bias"].shape),
        ],
        out_specs=out_specs if emit_masks else out_specs[0],
        out_shape=out_shapes if emit_masks else out_shapes[0],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=bp * L * (2 * d * 2 * d + 2 * d * d * 2 + 4 * L * d
                            + 4 * d * f),
            bytes_accessed=2 * x.size * 4,
            transcendentals=bp * heads * L * L,
        ),
    )(x.astype(op_dt), pos.astype(op_dt),
      mask.astype(jnp.float32)[:, None, :],
      seed.astype(jnp.int32).reshape((1,)),
      wqk, bqk, sa["v_proj"]["kernel"], sa["v_proj"]["bias"],
      sa["out_proj"]["kernel"], sa["out_proj"]["bias"],
      p["norm1"]["scale"], p["norm1"]["bias"],
      p["linear1"]["kernel"], p["linear1"]["bias"],
      p["linear2"]["kernel"], p["linear2"]["bias"],
      p["norm2"]["scale"], p["norm2"]["bias"])

    if emit_masks:
        out, ma, m2, m3, m4 = outs
        masks = {"attn": ma[:b], "attn_out": m2[:b],
                 "ffn1": m3[:b], "ffn2": m4[:b]}
        return out[:b], masks
    return outs[:b]
