"""Custom-VJP fused post-norm encoder layer: forward AND backward in Pallas.

Completes ops/pallas/fused_encoder_layer.py for training: the backward
kernel recomputes the layer's intermediates in VMEM (flash-style — the only
residuals saved are the layer inputs) and produces input + weight gradients
in one pass, so neither the [B, H, L, L] attention matrices nor the layer
intermediates ever reach HBM in either direction.

Dropout: the four per-layer dropout masks (attention weights, attention
output, post-ReLU FFN, FFN output — music_detr/transformer.py:163-168 plus
torch MHA's weight dropout) are regenerated inside the backward kernel by
re-seeding the TPU PRNG with the SAME (seed, global_row, site) tuple as the
forward kernel before each draw, so the masks match bit-for-bit without
ever being stored — not even across the recompute and backward halves.  On CPU (interpret) the rate>0 path falls back to
jax.vjp over the mask-fixed pure-JAX layer with jax.random(seed) masks —
the same masks the CPU forward used.

Matches DetrEncoderLayer(pre_norm=False) numerics and its VJP.

Weight-gradient accumulation uses the sequential-TPU-grid revisit pattern:
every program maps the same output block for the dW outputs, zeroing on the
first program and read-modify-writing afterwards.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgsv_tpu.ops.pallas.fused_encoder_layer import (
    _keep_mask, fused_encoder_layer, jax_dropout_masks, layer_fwd_with_masks)

NEG_INF = -1e9
_EPS = 1e-5


def _ln_fwd(x, gamma, beta):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    xhat = (x - mean) * inv
    return xhat * gamma + beta, xhat, inv


def _ln_bwd(dy, xhat, inv, gamma):
    """Returns (dx, dgamma_contrib, dbeta_contrib)."""
    dg = (dy * xhat).sum(axis=0)
    db = dy.sum(axis=0)
    dyg = dy * gamma
    dx = (dyg - dyg.mean(axis=-1, keepdims=True)
          - xhat * (dyg * xhat).mean(axis=-1, keepdims=True)) * inv
    return dx, dg, db


def _bwd_kernel(x_ref, pos_ref, mask_ref, seed_ref, g_ref,
                wqk_ref, bqk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                g1_ref, b1_ref, w1_ref, c1_ref, w2_ref, c2_ref,
                g2_ref, b2_ref,
                dx_ref, dpos_ref,
                dwqk_ref, dbqk_ref, dwv_ref, dbv_ref, dwo_ref, dbo_ref,
                dg1_ref, db1_ref, dw1_ref, dc1_ref, dw2_ref, dc2_ref,
                dg2_ref, db2_ref,
                *, heads, rate, mxu_dtype=None):
    bb, L, d = x_ref.shape
    head_dim = d // heads
    scale = 1.0 / (head_dim ** 0.5)
    cast = (lambda t: t) if mxu_dtype is None else (lambda t: t.astype(mxu_dtype))

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _zero():
        for ref in (dwqk_ref, dbqk_ref, dwv_ref, dbv_ref, dwo_ref, dbo_ref,
                    dg1_ref, db1_ref, dw1_ref, dc1_ref, dw2_ref, dc2_ref,
                    dg2_ref, db2_ref):
            ref[...] = jnp.zeros_like(ref)

    wqk, bqk = wqk_ref[:], bqk_ref[:]
    wv, bv = wv_ref[:], bv_ref[:]
    wo, bo = wo_ref[:], bo_ref[:]
    g1, b1 = g1_ref[:], b1_ref[:]
    w1, c1 = w1_ref[:], c1_ref[:]
    w2, c2 = w2_ref[:], c2_ref[:]
    g2, b2 = g2_ref[:], b2_ref[:]

    dwqk = jnp.zeros_like(wqk)
    dbqk = jnp.zeros_like(bqk)
    dwv = jnp.zeros_like(wv)
    dbv = jnp.zeros_like(bv)
    dwo = jnp.zeros_like(wo)
    dbo = jnp.zeros_like(bo)
    dg1 = jnp.zeros_like(g1)
    db1 = jnp.zeros_like(b1)
    dw1 = jnp.zeros_like(w1)
    dc1 = jnp.zeros_like(c1)
    dw2 = jnp.zeros_like(w2)
    dc2 = jnp.zeros_like(c2)
    dg2 = jnp.zeros_like(g2)
    db2 = jnp.zeros_like(b2)

    dot = lambda a_, b_: jnp.dot(cast(a_), cast(b_),
                                 preferred_element_type=jnp.float32)
    dot_t = lambda a_, b_: jax.lax.dot_general(
        cast(a_), cast(b_), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dot_bt = lambda a_, b_: jax.lax.dot_general(
        cast(a_), cast(b_), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    for r in range(bb):
        row_tag = pl.program_id(0) * bb + r
        x = x_ref[r]
        pos = pos_ref[r]
        mask_row = mask_ref[r, 0]
        g_out = g_ref[r]
        seed = seed_ref[0]
        # Masks are NOT stored: each is regenerated at every use site from
        # the per-(row, site) PRNG seeding — bit-identical to the forward
        # kernel's draws, and the VMEM live set stays mask-free.
        keep = lambda site, shp: _keep_mask(seed, row_tag, site, shp, rate)

        # ---------- recompute forward ----------
        a = x + pos
        qk = dot(a, wqk) + bqk
        q, k = qk[:, :d], qk[:, d:]
        v = dot(x, wv) + bv
        ps = []
        ctx_parts = []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = dot_bt(q[:, sl], k[:, sl]) * scale
            s = jnp.where(mask_row[None, :] != 0, s, NEG_INF)
            s = s - s.max(axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / p.sum(axis=-1, keepdims=True)
            ps.append(p)
            if rate > 0.0:
                p = p * keep(h, (L, L))
            ctx_parts.append(dot(p, v[:, sl]))
        ctx = jnp.concatenate(ctx_parts, axis=-1)
        o = dot(ctx, wo) + bo
        if rate > 0.0:
            o = o * keep(heads, (L, d))
        r1 = x + o
        y1, xhat1, inv1 = _ln_fwd(r1, g1, b1)
        h1 = jnp.maximum(dot(y1, w1) + c1, 0.0)
        if rate > 0.0:
            # post-dropout; dropped positions also zero in backward (the
            # regenerated m3 multiplies dh1), so gating ReLU on h1>0 is exact
            h1 = h1 * keep(heads + 1, h1.shape)
        h2 = dot(h1, w2) + c2
        if rate > 0.0:
            h2 = h2 * keep(heads + 2, (L, d))
        r2 = y1 + h2
        _, xhat2, inv2 = _ln_fwd(r2, g2, b2)

        # ---------- backward ----------
        dr2, dg2_c, db2_c = _ln_bwd(g_out, xhat2, inv2, g2)
        dg2 += dg2_c
        db2 += db2_c
        dy1 = dr2
        dh2 = dr2
        if rate > 0.0:
            dh2 = dh2 * keep(heads + 2, (L, d))
        dw2 += dot_t(h1, dh2)     # h1 here is post-dropout (= what fed w2)
        dc2 += dh2.sum(axis=0)
        dh1 = dot(dh2, w2.T)
        if rate > 0.0:
            dh1 = dh1 * keep(heads + 1, dh1.shape)
        dz1 = jnp.where(h1 > 0, dh1, 0.0)
        dw1 += dot_t(y1, dz1)
        dc1 += dz1.sum(axis=0)
        dy1 = dy1 + dot(dz1, w1.T)
        dr1, dg1_c, db1_c = _ln_bwd(dy1, xhat1, inv1, g1)
        dg1 += dg1_c
        db1 += db1_c
        dx_row = dr1
        do = dr1
        if rate > 0.0:
            do = do * keep(heads, (L, d))
        dwo += dot_t(ctx, do)
        dbo += do.sum(axis=0)
        dctx = dot(do, wo.T)

        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            p = ps[h]             # pre-dropout softmax probabilities
            m_h = keep(h, (L, L)) if rate > 0.0 else None
            pd = p * m_h if rate > 0.0 else p
            dctx_h = dctx[:, sl]
            dp = jax.lax.dot_general(
                cast(dctx_h), cast(v[:, sl]), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [L, L]
            dv_parts.append(dot_t(pd, dctx_h))            # [L, hd]
            if rate > 0.0:
                dp = dp * m_h
            ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
            dq_parts.append(dot(ds, k[:, sl]) * scale)
            dk_parts.append(dot_t(ds, q[:, sl]) * scale)
        dq = jnp.concatenate(dq_parts, axis=-1)
        dk = jnp.concatenate(dk_parts, axis=-1)
        dv = jnp.concatenate(dv_parts, axis=-1)

        dqk = jnp.concatenate([dq, dk], axis=-1)          # [L, 2D]
        dwqk += dot_t(a, dqk)
        dbqk += dqk.sum(axis=0)
        da = dot(dqk, wqk.T)
        dwv += dot_t(x, dv)
        dbv += dv.sum(axis=0)
        dx_row = dx_row + da + dot(dv, wv.T)
        dx_ref[r] = dx_row
        dpos_ref[r] = da

    dwqk_ref[...] += dwqk
    dbqk_ref[...] += dbqk
    dwv_ref[...] += dwv
    dbv_ref[...] += dbv
    dwo_ref[...] += dwo
    dbo_ref[...] += dbo
    dg1_ref[...] += dg1
    db1_ref[...] += db1
    dw1_ref[...] += dw1
    dc1_ref[...] += dc1
    dw2_ref[...] += dw2
    dc2_ref[...] += dc2
    dg2_ref[...] += dg2
    db2_ref[...] += db2


def _unflatten_dparams(outs, d):
    (dx, dpos, dwqk, dbqk, dwv, dbv, dwo, dbo,
     dg1, db1, dw1, dc1, dw2, dc2, dg2, db2) = outs
    dparams = {
        "self_attn": {
            "q_proj": {"kernel": dwqk[:, :d], "bias": dbqk[:d]},
            "k_proj": {"kernel": dwqk[:, d:], "bias": dbqk[d:]},
            "v_proj": {"kernel": dwv, "bias": dbv},
            "out_proj": {"kernel": dwo, "bias": dbo},
        },
        "norm1": {"scale": dg1, "bias": db1},
        "linear1": {"kernel": dw1, "bias": dc1},
        "linear2": {"kernel": dw2, "bias": dc2},
        "norm2": {"scale": dg2, "bias": db2},
    }
    return dx, dpos, dparams


def _bwd_pallas(x, pos, mask, seed, g, p, heads, block_b, interpret, rate,
                precision="f32"):
    b, L, d = x.shape
    f = p["linear1"]["kernel"].shape[1]
    sa = p["self_attn"]
    wqk = jnp.concatenate([sa["q_proj"]["kernel"], sa["k_proj"]["kernel"]], axis=1)
    bqk = jnp.concatenate([sa["q_proj"]["bias"], sa["k_proj"]["bias"]], axis=0)

    pad_b = (-b) % block_b
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        pos = jnp.pad(pos, ((0, pad_b), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad_b), (0, 0), (0, 0)))
        mask = jnp.concatenate(
            [mask, jnp.zeros((pad_b, L), mask.dtype).at[:, 0].set(1)], axis=0)
    bp = x.shape[0]

    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple([0] * len(shape)), memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((block_b, L, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((bp, L, d), jnp.float32),   # dx
        jax.ShapeDtypeStruct((bp, L, d), jnp.float32),   # dpos
        jax.ShapeDtypeStruct((d, 2 * d), jnp.float32),   # dwqk
        jax.ShapeDtypeStruct((2 * d,), jnp.float32),
        jax.ShapeDtypeStruct((d, d), jnp.float32),       # dwv
        jax.ShapeDtypeStruct((d,), jnp.float32),
        jax.ShapeDtypeStruct((d, d), jnp.float32),       # dwo
        jax.ShapeDtypeStruct((d,), jnp.float32),
        jax.ShapeDtypeStruct((d,), jnp.float32),         # dg1
        jax.ShapeDtypeStruct((d,), jnp.float32),
        jax.ShapeDtypeStruct((d, f), jnp.float32),       # dw1
        jax.ShapeDtypeStruct((f,), jnp.float32),
        jax.ShapeDtypeStruct((f, d), jnp.float32),       # dw2
        jax.ShapeDtypeStruct((d,), jnp.float32),
        jax.ShapeDtypeStruct((d,), jnp.float32),         # dg2
        jax.ShapeDtypeStruct((d,), jnp.float32),
    ]
    out_specs = [blk3, blk3] + [rep(s.shape) for s in out_shapes[2:]]

    mxu_dtype = jnp.bfloat16 if precision == "bf16" else None
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, rate=rate,
                          mxu_dtype=mxu_dtype),
        grid=(bp // block_b,),
        in_specs=[
            blk3, blk3,
            pl.BlockSpec((block_b, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),       # seed
            blk3,
            rep(wqk.shape), rep(bqk.shape),
            rep(sa["v_proj"]["kernel"].shape), rep(sa["v_proj"]["bias"].shape),
            rep(sa["out_proj"]["kernel"].shape), rep(sa["out_proj"]["bias"].shape),
            rep(p["norm1"]["scale"].shape), rep(p["norm1"]["bias"].shape),
            rep(p["linear1"]["kernel"].shape), rep(p["linear1"]["bias"].shape),
            rep(p["linear2"]["kernel"].shape), rep(p["linear2"]["bias"].shape),
            rep(p["norm2"]["scale"].shape), rep(p["norm2"]["bias"].shape),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        # The rate>0 recompute+backward needs ~37 MB of scoped VMEM at the
        # paper shape (L=146, F=1024, block_b=2): the PRNG mask temporaries
        # break Mosaic's default 16 MB stack budget.  v5e has 128 MB VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if rate > 0.0 else None,
    )(x.astype(jnp.float32), pos.astype(jnp.float32),
      mask.astype(jnp.float32)[:, None, :],
      seed.astype(jnp.int32).reshape((1,)),
      g.astype(jnp.float32),
      wqk, bqk, sa["v_proj"]["kernel"], sa["v_proj"]["bias"],
      sa["out_proj"]["kernel"], sa["out_proj"]["bias"],
      p["norm1"]["scale"], p["norm1"]["bias"],
      p["linear1"]["kernel"], p["linear1"]["bias"],
      p["linear2"]["kernel"], p["linear2"]["bias"],
      p["norm2"]["scale"], p["norm2"]["bias"])

    dx, dpos, dparams = _unflatten_dparams(outs, d)
    return dx[:b], dpos[:b], dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_encoder_layer_train(params, x, mask, pos, seed, heads=8, block_b=8,
                              interpret=None, rate=0.0, precision="f32"):
    """Differentiable fused layer; in-kernel PRNG dropout when rate > 0.
    precision="bf16" runs every MXU matmul (fwd and bwd) on bf16 tiles with
    f32 accumulation."""
    return fused_encoder_layer(x, mask, pos, params, heads=heads,
                               block_b=block_b, interpret=interpret,
                               rate=rate, seed=seed, precision=precision)


def _train_fwd(params, x, mask, pos, seed, heads, block_b, interpret, rate,
               precision):
    out = fused_encoder_layer(x, mask, pos, params, heads=heads,
                              block_b=block_b, interpret=interpret,
                              rate=rate, seed=seed, precision=precision)
    return out, (params, x, mask, pos, seed)


def _train_bwd(heads, block_b, interpret, rate, precision, res, g):
    params, x, mask, pos, seed = res
    p = params["params"] if "params" in params else params
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if rate > 0.0 and interpret:
        # CPU fallback: same jax.random(seed) masks as the CPU forward.
        b, L, d = x.shape
        f = p["linear1"]["kernel"].shape[1]
        masks = jax_dropout_masks(seed, b, L, d, f, heads, rate)
        _, vjp = jax.vjp(
            lambda p_, x_, pos_: layer_fwd_with_masks(
                p_, x_.astype(jnp.float32), mask, pos_.astype(jnp.float32),
                masks, heads),
            p, x, pos)
        dp, dx, dpos = vjp(g)
    else:
        dx, dpos, dp = _bwd_pallas(x, pos, mask, seed, g, p, heads, block_b,
                                   interpret, rate, precision)
    dparams = {"params": dp} if "params" in params else dp
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dparams, dx, jnp.zeros_like(mask), dpos, dseed


fused_encoder_layer_train.defvjp(_train_fwd, _train_bwd)
