"""Custom-VJP fused temporal-tower layer (fwd AND bwd), Pallas TPU.

Round-3 attribution (scripts/bench_towers_tpu.py, BASELINE.md): the two
temporal towers cost 20.5 ms of the 55 ms train step at the paper dropout
0.8 — XLA bounces the [B, H, L, L] attention tensors and three dropout
masks per tower through HBM.  This kernel computes the ENTIRE temporal
layer per batch row with every intermediate in VMEM, with the same
regenerate-don't-store in-kernel PRNG dropout as the DETR encoder twins
(ops/pallas/fused_encoder_layer*.py, whose structure this mirrors).

The layer is the reference's Transformer_enhancement block
(model_Base.py:64-91) with its unusual residual placement — the residual
is taken AFTER norm1/norm2 are applied (mgsv_tpu/models/temporal.py):

    y  = LN1(x)
    u  = y + MHA(y, y, y, key_mask)        # torch MHA: weight dropout only
    z  = LN2(u)
    out = z + fc2(drop(gelu_exact(fc1(z)))) * drop

The final Linear of the tower stays outside (one big XLA GEMM).  Dropout
sites: heads attention-weight masks [L, L] (sites 0..heads-1), post-GELU
[L, F] (site heads), FFN output [L, D] (site heads+1).  On CPU
(interpret) the rate>0 path falls back to the mask-fixed pure-JAX layer
with jax.random(seed) masks, identical in fwd and bwd.
"""

from __future__ import annotations

import functools
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgsv_tpu.ops.pallas.fused_encoder_layer import _keep_mask
from mgsv_tpu.ops.pallas.fused_encoder_layer_vjp import _ln_bwd, _ln_fwd

NEG_INF = -1e9
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """erf from exp only — Mosaic has no `erf` lowering (KernelType.TC).

    Numerical Recipes' rational erfc (max abs error ~1.2e-7): well inside
    every parity tolerance used here, and identical in the fwd and bwd
    kernels so the recompute is self-consistent.  The pure-JAX oracle
    keeps jax.lax.erf (faithful to flax's exact gelu); the ~1e-7 gap is
    absorbed by test tolerances.
    """
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.5 * z)
    poly = -1.26551223 + t * (1.00002368 + t * (0.37409196 + t * (
        0.09678418 + t * (-0.18628806 + t * (0.27886807 + t * (
            -1.13520398 + t * (1.48851587 + t * (
                -0.82215223 + t * 0.17087277))))))))
    erfc = t * jnp.exp(-z * z + poly)
    return jnp.where(x >= 0, 1.0 - erfc, erfc - 1.0)


def _gelu(a, erf_fn=_erf):
    """Exact gelu (flax approximate=False): a * Phi(a)."""
    return a * 0.5 * (1.0 + erf_fn(a * _INV_SQRT2))


def _gelu_grad(a):
    """d/da gelu(a) = Phi(a) + a * phi(a)."""
    phi = jnp.exp(-0.5 * a * a) * _INV_SQRT_2PI
    return 0.5 * (1.0 + _erf(a * _INV_SQRT2)) + a * phi


def _fwd_kernel(x_ref, mask_ref, seed_ref,
                wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                g1_ref, b1_ref, w1_ref, c1_ref, w2_ref, c2_ref,
                g2_ref, b2_ref, out_ref, *, heads, rate):
    bb, L, d = x_ref.shape
    head_dim = d // heads
    scale = 1.0 / (head_dim ** 0.5)

    wqkv, bqkv = wqkv_ref[:], bqkv_ref[:]
    wo, bo = wo_ref[:], bo_ref[:]
    g1, b1 = g1_ref[:], b1_ref[:]
    w1, c1 = w1_ref[:], c1_ref[:]
    w2, c2 = w2_ref[:], c2_ref[:]
    g2, b2 = g2_ref[:], b2_ref[:]

    dot = lambda a_, b_: jnp.dot(a_, b_, preferred_element_type=jnp.float32)
    dot_bt = lambda a_, b_: jax.lax.dot_general(
        a_, b_, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    for r in range(bb):
        row_tag = pl.program_id(0) * bb + r
        seed = seed_ref[0]
        keep = lambda site, shp: _keep_mask(seed, row_tag, site, shp, rate)
        x = x_ref[r]                                       # [L, D]
        mask_row = mask_ref[r, 0]                          # [L]

        y, _, _ = _ln_fwd(x, g1, b1)
        qkv = dot(y, wqkv) + bqkv
        q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
        ctx_parts = []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = dot_bt(q[:, sl], k[:, sl]) * scale         # [L, L]
            s = jnp.where(mask_row[None, :] != 0, s, NEG_INF)
            s = s - s.max(axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / e.sum(axis=-1, keepdims=True)
            if rate > 0.0:
                p = p * keep(h, (L, L))
            ctx_parts.append(dot(p, v[:, sl]))
        ctx = jnp.concatenate(ctx_parts, axis=-1)
        u = y + dot(ctx, wo) + bo
        z, _, _ = _ln_fwd(u, g2, b2)
        a1 = dot(z, w1) + c1
        h1 = _gelu(a1)
        if rate > 0.0:
            h1 = h1 * keep(heads, h1.shape)
        h2 = dot(h1, w2) + c2
        if rate > 0.0:
            h2 = h2 * keep(heads + 1, (L, d))
        out_ref[r] = z + h2


def _bwd_kernel(x_ref, mask_ref, seed_ref, g_ref,
                wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                g1_ref, b1_ref, w1_ref, c1_ref, w2_ref, c2_ref,
                g2_ref, b2_ref,
                dx_ref,
                dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                dg1_ref, db1_ref, dw1_ref, dc1_ref, dw2_ref, dc2_ref,
                dg2_ref, db2_ref, *, heads, rate):
    bb, L, d = x_ref.shape
    head_dim = d // heads
    scale = 1.0 / (head_dim ** 0.5)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for ref in (dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dg1_ref, db1_ref,
                    dw1_ref, dc1_ref, dw2_ref, dc2_ref, dg2_ref, db2_ref):
            ref[...] = jnp.zeros_like(ref)

    wqkv, bqkv = wqkv_ref[:], bqkv_ref[:]
    wo, bo = wo_ref[:], bo_ref[:]
    g1, b1 = g1_ref[:], b1_ref[:]
    w1, c1 = w1_ref[:], c1_ref[:]
    w2, c2 = w2_ref[:], c2_ref[:]
    g2, b2 = g2_ref[:], b2_ref[:]

    dwqkv = jnp.zeros_like(wqkv)
    dbqkv = jnp.zeros_like(bqkv)
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

    dot = lambda a_, b_: jnp.dot(a_, b_, preferred_element_type=jnp.float32)
    dot_t = lambda a_, b_: jax.lax.dot_general(
        a_, b_, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dot_bt = lambda a_, b_: jax.lax.dot_general(
        a_, b_, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    for r in range(bb):
        row_tag = pl.program_id(0) * bb + r
        seed = seed_ref[0]
        keep = lambda site, shp: _keep_mask(seed, row_tag, site, shp, rate)
        x = x_ref[r]
        mask_row = mask_ref[r, 0]
        g_out = g_ref[r]

        # ---------- recompute forward ----------
        y, xhat1, inv1 = _ln_fwd(x, g1, b1)
        qkv = dot(y, wqkv) + bqkv
        q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
        ps, ctx_parts = [], []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = dot_bt(q[:, sl], k[:, sl]) * scale
            s = jnp.where(mask_row[None, :] != 0, s, NEG_INF)
            s = s - s.max(axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / e.sum(axis=-1, keepdims=True)
            ps.append(p)
            if rate > 0.0:
                p = p * keep(h, (L, L))
            ctx_parts.append(dot(p, v[:, sl]))
        ctx = jnp.concatenate(ctx_parts, axis=-1)
        u = y + dot(ctx, wo) + bo
        z, xhat2, inv2 = _ln_fwd(u, g2, b2)
        a1 = dot(z, w1) + c1
        h1 = _gelu(a1)
        if rate > 0.0:
            h1 = h1 * keep(heads, h1.shape)        # post-dropout (fed w2)

        # ---------- backward ----------
        dh2 = g_out
        if rate > 0.0:
            dh2 = dh2 * keep(heads + 1, (L, d))
        dw2 += dot_t(h1, dh2)
        dc2 += dh2.sum(axis=0)
        dh1 = dot(dh2, w2.T)
        if rate > 0.0:
            dh1 = dh1 * keep(heads, dh1.shape)
        da1 = dh1 * _gelu_grad(a1)
        dw1 += dot_t(z, da1)
        dc1 += da1.sum(axis=0)
        dz = g_out + dot(da1, w1.T)                # out = z + h2
        du, dg2_c, db2_c = _ln_bwd(dz, xhat2, inv2, g2)
        dg2 += dg2_c
        db2 += db2_c
        do = du                                    # u = y + o
        dwo += dot_t(ctx, do)
        dbo += do.sum(axis=0)
        dctx = dot(do, wo.T)

        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            p = ps[h]
            m_h = keep(h, (L, L)) if rate > 0.0 else None
            pd = p * m_h if rate > 0.0 else p
            dctx_h = dctx[:, sl]
            dp = dot_bt(dctx_h, v[:, sl])          # [L, L]
            dv_parts.append(dot_t(pd, dctx_h))
            if rate > 0.0:
                dp = dp * m_h
            ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
            dq_parts.append(dot(ds, k[:, sl]) * scale)
            dk_parts.append(dot_t(ds, q[:, sl]) * scale)
        dqkv = jnp.concatenate(
            dq_parts + dk_parts + dv_parts, axis=-1)       # [L, 3D]
        dwqkv += dot_t(y, dqkv)
        dbqkv += dqkv.sum(axis=0)
        dy = du + dot(dqkv, wqkv.T)                # u = y + ... residual
        dx_row, dg1_c, db1_c = _ln_bwd(dy, xhat1, inv1, g1)
        dg1 += dg1_c
        db1 += db1_c
        dx_ref[r] = dx_row

    dwqkv_ref[...] += dwqkv
    dbqkv_ref[...] += dbqkv
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


# ---------------------------------------------------------------------------
# Pure-JAX oracle / CPU fallback
# ---------------------------------------------------------------------------

def jax_temporal_dropout_masks(seed, b, L, d, f, heads, rate):
    """CPU-fallback masks for the three temporal dropout sites."""
    key = jax.random.PRNGKey(seed.reshape(())[()] if hasattr(seed, "reshape")
                             else seed)
    ks = jax.random.split(key, 3)
    inv = 1.0 / (1.0 - rate)
    draw = lambda k_, shp: (
        (jax.random.uniform(k_, shp) >= rate).astype(jnp.float32) * inv)
    return {
        "attn": draw(ks[0], (b, heads, L, L)),
        "ffn1": draw(ks[1], (b, L, f)),
        "ffn2": draw(ks[2], (b, L, d)),
    }


def temporal_layer_fwd_with_masks(p, x, mask, masks, heads):
    """Differentiable pure-JAX temporal layer with explicit dropout masks —
    the CPU fallback and the oracle the TPU kernels are validated against
    (mgsv_tpu/models/temporal.py numerics, final_linear excluded)."""
    b, L, d = x.shape
    head_dim = d // heads

    def ln(t, sub):
        mean = t.mean(-1, keepdims=True)
        var = ((t - mean) ** 2).mean(-1, keepdims=True)
        return (t - mean) * jax.lax.rsqrt(var + 1e-5) * sub["scale"] + sub["bias"]

    y = ln(x, p["norm1"])
    sa = p["self_attn"]
    q = y @ sa["q_proj"]["kernel"] + sa["q_proj"]["bias"]
    k = y @ sa["k_proj"]["kernel"] + sa["k_proj"]["bias"]
    v = y @ sa["v_proj"]["kernel"] + sa["v_proj"]["bias"]
    split = lambda t: t.reshape(b, L, heads, head_dim)
    s = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)) / (head_dim ** 0.5)
    s = jnp.where(mask[:, None, None, :] != 0, s, NEG_INF)
    attn = jax.nn.softmax(s, axis=-1)
    if masks is not None:
        attn = attn * masks["attn"]
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, split(v)).reshape(b, L, d)
    u = y + ctx @ sa["out_proj"]["kernel"] + sa["out_proj"]["bias"]
    z = ln(u, p["norm2"])
    h1 = _gelu(z @ p["linear1"]["kernel"] + p["linear1"]["bias"],
               erf_fn=jax.lax.erf)     # exact erf: faithful to flax gelu
    if masks is not None:
        h1 = h1 * masks["ffn1"]
    h2 = h1 @ p["linear2"]["kernel"] + p["linear2"]["bias"]
    if masks is not None:
        h2 = h2 * masks["ffn2"]
    return z + h2


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom_vjp
# ---------------------------------------------------------------------------

def _flatten_w(p):
    sa = p["self_attn"]
    wqkv = jnp.concatenate([sa["q_proj"]["kernel"], sa["k_proj"]["kernel"],
                            sa["v_proj"]["kernel"]], axis=1)     # [D, 3D]
    bqkv = jnp.concatenate([sa["q_proj"]["bias"], sa["k_proj"]["bias"],
                            sa["v_proj"]["bias"]], axis=0)
    return [wqkv, bqkv, sa["out_proj"]["kernel"], sa["out_proj"]["bias"],
            p["norm1"]["scale"], p["norm1"]["bias"],
            p["linear1"]["kernel"], p["linear1"]["bias"],
            p["linear2"]["kernel"], p["linear2"]["bias"],
            p["norm2"]["scale"], p["norm2"]["bias"]]


def _pad_rows(x, mask, block_b, extras=()):
    b, L, _ = x.shape
    pad_b = (-b) % block_b
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        mask = jnp.concatenate(
            [mask, jnp.zeros((pad_b, L), mask.dtype).at[:, 0].set(1)], axis=0)
        extras = tuple(jnp.pad(e, ((0, pad_b), (0, 0), (0, 0)))
                       for e in extras)
    return (x, mask) + extras


def _fwd_pallas(p, x, mask, seed, heads, block_b, interpret, rate):
    b, L, d = x.shape
    x, mask = _pad_rows(x, mask, block_b)
    bp = x.shape[0]
    ws = _flatten_w(p)

    rep = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                   memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((block_b, L, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, rate=rate),
        grid=(bp // block_b,),
        in_specs=[
            blk3,
            pl.BlockSpec((block_b, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [rep(w) for w in ws],
        out_specs=blk3,
        out_shape=jax.ShapeDtypeStruct((bp, L, d), jnp.float32),
        interpret=interpret,
        # 64 MB scoped VMEM unconditionally: the rate=0 backward recompute
        # already needs ~17.4 MB at L=96/F=1024 under f32 MXU precision
        # (the default 16 MB budget fails AOT compile); v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x.astype(jnp.float32), mask.astype(jnp.float32)[:, None, :],
      seed.astype(jnp.int32).reshape((1,)), *ws)
    return out[:b]


def _bwd_pallas(p, x, mask, seed, g, heads, block_b, interpret, rate):
    b, L, d = x.shape
    f = p["linear1"]["kernel"].shape[1]
    x, mask, g = _pad_rows(x, mask, block_b, (g,))
    bp = x.shape[0]
    ws = _flatten_w(p)

    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((block_b, L, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((bp, L, d), jnp.float32),    # dx
        jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),    # dwqkv
        jax.ShapeDtypeStruct((3 * d,), jnp.float32),
        jax.ShapeDtypeStruct((d, d), jnp.float32),        # dwo
        jax.ShapeDtypeStruct((d,), jnp.float32),
        jax.ShapeDtypeStruct((d,), jnp.float32),          # dg1
        jax.ShapeDtypeStruct((d,), jnp.float32),
        jax.ShapeDtypeStruct((d, f), jnp.float32),        # dw1
        jax.ShapeDtypeStruct((f,), jnp.float32),
        jax.ShapeDtypeStruct((f, d), jnp.float32),        # dw2
        jax.ShapeDtypeStruct((d,), jnp.float32),
        jax.ShapeDtypeStruct((d,), jnp.float32),          # dg2
        jax.ShapeDtypeStruct((d,), jnp.float32),
    ]
    out_specs = [blk3] + [rep(s.shape) for s in out_shapes[1:]]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, rate=rate),
        grid=(bp // block_b,),
        in_specs=[
            blk3,
            pl.BlockSpec((block_b, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk3,
        ] + [rep(w.shape) for w in ws],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        # 64 MB scoped VMEM unconditionally: the rate=0 backward recompute
        # already needs ~17.4 MB at L=96/F=1024 under f32 MXU precision
        # (the default 16 MB budget fails AOT compile); v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x.astype(jnp.float32), mask.astype(jnp.float32)[:, None, :],
      seed.astype(jnp.int32).reshape((1,)), g.astype(jnp.float32), *ws)

    (dx, dwqkv, dbqkv, dwo, dbo, dg1, db1,
     dw1, dc1, dw2, dc2, dg2, db2) = outs
    dp = {
        "self_attn": {
            "q_proj": {"kernel": dwqkv[:, :d], "bias": dbqkv[:d]},
            "k_proj": {"kernel": dwqkv[:, d:2 * d], "bias": dbqkv[d:2 * d]},
            "v_proj": {"kernel": dwqkv[:, 2 * d:], "bias": dbqkv[2 * d:]},
            "out_proj": {"kernel": dwo, "bias": dbo},
        },
        "norm1": {"scale": dg1, "bias": db1},
        "linear1": {"kernel": dw1, "bias": dc1},
        "linear2": {"kernel": dw2, "bias": dc2},
        "norm2": {"scale": dg2, "bias": db2},
    }
    return dx[:b], dp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_temporal_layer_train(params, x, mask, seed, heads=8, block_b=1,
                               interpret=None, rate=0.0):
    """Differentiable fused temporal layer; in-kernel PRNG dropout when
    rate > 0.  params: {self_attn{q,k,v,out_proj}, norm1, linear1, linear2,
    norm2} (canonical flax subtrees)."""
    out, _ = _train_fwd(params, x, mask, seed, heads, block_b, interpret,
                        rate)
    return out


def _train_fwd(params, x, mask, seed, heads, block_b, interpret, rate):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p = params["params"] if "params" in params else params
    res = (params, x, mask, seed)
    if rate > 0.0 and interpret:
        b, L, d = x.shape
        f = p["linear1"]["kernel"].shape[1]
        masks = jax_temporal_dropout_masks(seed, b, L, d, f, heads, rate)
        return temporal_layer_fwd_with_masks(
            p, x.astype(jnp.float32), mask, masks, heads), res
    return _fwd_pallas(p, x, mask, seed, heads, block_b, interpret, rate), res


def _train_bwd(heads, block_b, interpret, rate, res, g):
    params, x, mask, seed = res
    p = params["params"] if "params" in params else params
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if rate > 0.0 and interpret:
        b, L, d = x.shape
        f = p["linear1"]["kernel"].shape[1]
        masks = jax_temporal_dropout_masks(seed, b, L, d, f, heads, rate)
        _, vjp = jax.vjp(
            lambda p_, x_: temporal_layer_fwd_with_masks(
                p_, x_.astype(jnp.float32), mask, masks, heads), p, x)
        dp, dx = vjp(g)
    else:
        dx, dp = _bwd_pallas(p, x, mask, seed, g, heads, block_b, interpret,
                             rate)
    dparams = {"params": dp} if "params" in params else dp
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dparams, dx, jnp.zeros_like(mask), dseed


fused_temporal_layer_train.defvjp(_train_fwd, _train_bwd)
