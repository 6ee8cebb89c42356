"""Custom-VJP fused post-norm DETR decoder layer (Pallas, fwd + bwd).

The decoder twin of fused_encoder_layer_vjp: at #queries=1 (the shipped
config) the per-layer cost is dominated by the cross-attention K/V
projections of the [B, L, D] memory and their backward — fused here with
the whole layer (self-attn over queries, cross-attn, FFN, three LNs) so the
per-layer intermediates never reach HBM.

Deterministic math (dropout-free); post-norm with decoder self-attention
(the reference's actual behavior — SURVEY quirk #8).  Gradients flow to
tgt, memory, query_pos, pos, and all weights.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
# one LN fwd/bwd implementation for every fused kernel — a numerics fix
# applied there applies everywhere (eps 1e-5)
from mgsv_tpu.ops.pallas.fused_encoder_layer_vjp import _ln_bwd, _ln_fwd  # noqa: E402,F401


def _mha_fwd(q_in, k_in, v_in, wq, bq, wk, bk, wv, bv, wo, bo, heads, mask):
    """Full attention fwd; returns (out, saved) with per-head probs."""
    Lq, d = q_in.shape
    hd = d // heads
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    q = dot(q_in, wq) + bq
    k = dot(k_in, wk) + bk
    v = dot(v_in, wv) + bv
    scale = 1.0 / (hd ** 0.5)
    ps, ctx_parts = [], []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if mask is not None:
            s = jnp.where(mask[None, :] != 0, s, NEG_INF)
        s = s - s.max(axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / p.sum(axis=-1, keepdims=True)
        ps.append(p)
        ctx_parts.append(dot(p, v[:, sl]))
    ctx = jnp.concatenate(ctx_parts, axis=-1)
    out = dot(ctx, wo) + bo
    return out, (q, k, v, ps, ctx)


def _mha_bwd(dout, saved, q_in, k_in, v_in, wq, wk, wv, wo, heads):
    """Returns (dq_in, dk_in, dv_in, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo)."""
    q, k, v, ps, ctx = saved
    d = q.shape[1]
    hd = d // heads
    scale = 1.0 / (hd ** 0.5)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    dot_t = lambda a_, b_: jax.lax.dot_general(
        a_, b_, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    dwo = dot_t(ctx, dout)
    dbo = dout.sum(axis=0)
    dctx = dot(dout, wo.T)
    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        p = ps[h]
        dctx_h = dctx[:, sl]
        dp = jax.lax.dot_general(dctx_h, v[:, sl], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv_parts.append(dot_t(p, dctx_h))
        ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
        dq_parts.append(dot(ds, k[:, sl]) * scale)
        dk_parts.append(dot_t(ds, q[:, sl]) * scale)
    dq = jnp.concatenate(dq_parts, axis=-1)
    dk = jnp.concatenate(dk_parts, axis=-1)
    dv = jnp.concatenate(dv_parts, axis=-1)
    return (dot(dq, wq.T), dot(dk, wk.T), dot(dv, wv.T),
            dot_t(q_in, dq), dq.sum(axis=0),
            dot_t(k_in, dk), dk.sum(axis=0),
            dot_t(v_in, dv), dv.sum(axis=0),
            dwo, dbo)


_W_NAMES = [
    "sa_q_w", "sa_q_b", "sa_k_w", "sa_k_b", "sa_v_w", "sa_v_b",
    "sa_o_w", "sa_o_b",
    "ca_q_w", "ca_q_b", "ca_k_w", "ca_k_b", "ca_v_w", "ca_v_b",
    "ca_o_w", "ca_o_b",
    "n1_g", "n1_b", "n2_g", "n2_b", "n3_g", "n3_b",
    "l1_w", "l1_b", "l2_w", "l2_b",
]


def _layer_fwd_math(tgt, memory, mask_row, pos, qpos, w, heads, self_attn,
                    save=False):
    saved = {}
    if self_attn:
        qk_in = tgt + qpos
        sa_out, sa_saved = _mha_fwd(qk_in, qk_in, tgt,
                                    w["sa_q_w"], w["sa_q_b"], w["sa_k_w"],
                                    w["sa_k_b"], w["sa_v_w"], w["sa_v_b"],
                                    w["sa_o_w"], w["sa_o_b"], heads, None)
        t1_in = tgt + sa_out
        t1, xh1, inv1 = _ln_fwd(t1_in, w["n1_g"], w["n1_b"])
        if save:
            saved.update(sa_saved=sa_saved, xh1=xh1, inv1=inv1, tgt0=tgt)
    else:
        t1 = tgt
    ca_out, ca_saved = _mha_fwd(t1 + qpos, memory + pos, memory,
                                w["ca_q_w"], w["ca_q_b"], w["ca_k_w"],
                                w["ca_k_b"], w["ca_v_w"], w["ca_v_b"],
                                w["ca_o_w"], w["ca_o_b"], heads, mask_row)
    t2_in = t1 + ca_out
    t2, xh2, inv2 = _ln_fwd(t2_in, w["n2_g"], w["n2_b"])
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    h1 = jnp.maximum(dot(t2, w["l1_w"]) + w["l1_b"], 0.0)
    h2 = dot(h1, w["l2_w"]) + w["l2_b"]
    t3, xh3, inv3 = _ln_fwd(t2 + h2, w["n3_g"], w["n3_b"])
    if save:
        saved.update(ca_saved=ca_saved, t1=t1, xh2=xh2, inv2=inv2, t2=t2,
                     h1=h1, xh3=xh3, inv3=inv3)
        return t3, saved
    return t3


def _fwd_kernel(tgt_ref, mem_ref, mask_ref, pos_ref, qpos_ref, *rest,
                heads, self_attn):
    w_refs = rest[:len(_W_NAMES)]
    out_ref = rest[len(_W_NAMES)]
    w = {name: ref[:] for name, ref in zip(_W_NAMES, w_refs)}
    bb = tgt_ref.shape[0]
    for r in range(bb):
        out_ref[r] = _layer_fwd_math(
            tgt_ref[r], mem_ref[r], mask_ref[r, 0], pos_ref[r], qpos_ref[r],
            w, heads, self_attn)


def _bwd_kernel(tgt_ref, mem_ref, mask_ref, pos_ref, qpos_ref, g_ref, *rest,
                heads, self_attn):
    w_refs = rest[:len(_W_NAMES)]
    (dtgt_ref, dmem_ref, dpos_ref, dqpos_ref) = rest[len(_W_NAMES):len(_W_NAMES) + 4]
    dw_refs = rest[len(_W_NAMES) + 4:]
    w = {name: ref[:] for name, ref in zip(_W_NAMES, w_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for ref in dw_refs:
            ref[...] = jnp.zeros_like(ref)

    dw = {name: jnp.zeros_like(w[name]) for name in _W_NAMES}
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    dot_t = lambda a_, b_: jax.lax.dot_general(
        a_, b_, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    bb = tgt_ref.shape[0]
    for r in range(bb):
        tgt = tgt_ref[r]
        memory = mem_ref[r]
        mask_row = mask_ref[r, 0]
        pos = pos_ref[r]
        qpos = qpos_ref[r]
        g = g_ref[r]

        _, s = _layer_fwd_math(tgt, memory, mask_row, pos, qpos, w, heads,
                               self_attn, save=True)

        # LN3 <- FFN <- LN2
        dt3in, dg3, db3 = _ln_bwd(g, s["xh3"], s["inv3"], w["n3_g"])
        dw["n3_g"] += dg3; dw["n3_b"] += db3
        dt2 = dt3in
        dh2 = dt3in
        dw["l2_w"] += dot_t(s["h1"], dh2)
        dw["l2_b"] += dh2.sum(axis=0)
        dh1 = dot(dh2, w["l2_w"].T)
        dz1 = jnp.where(s["h1"] > 0, dh1, 0.0)
        dw["l1_w"] += dot_t(s["t2"], dz1)
        dw["l1_b"] += dz1.sum(axis=0)
        dt2 = dt2 + dot(dz1, w["l1_w"].T)
        dt2in, dg2, db2 = _ln_bwd(dt2, s["xh2"], s["inv2"], w["n2_g"])
        dw["n2_g"] += dg2; dw["n2_b"] += db2

        # cross-attention backward
        dt1 = dt2in
        dca = dt2in
        (dq_in, dk_in, dv_in, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo) = _mha_bwd(
            dca, s["ca_saved"], s["t1"] + qpos, memory + pos, memory,
            w["ca_q_w"], w["ca_k_w"], w["ca_v_w"], w["ca_o_w"], heads)
        dw["ca_q_w"] += dwq; dw["ca_q_b"] += dbq
        dw["ca_k_w"] += dwk; dw["ca_k_b"] += dbk
        dw["ca_v_w"] += dwv; dw["ca_v_b"] += dbv
        dw["ca_o_w"] += dwo; dw["ca_o_b"] += dbo
        dt1 = dt1 + dq_in
        dqpos_row = dq_in
        dmem_row = dk_in + dv_in
        dpos_row = dk_in

        if self_attn:
            dt1in, dg1, db1 = _ln_bwd(dt1, s["xh1"], s["inv1"], w["n1_g"])
            dw["n1_g"] += dg1; dw["n1_b"] += db1
            dtgt_row = dt1in
            dsa = dt1in
            (dq2, dk2, dv2, dwq2, dbq2, dwk2, dbk2, dwv2, dbv2, dwo2, dbo2) = _mha_bwd(
                dsa, s["sa_saved"], s["tgt0"] + qpos, s["tgt0"] + qpos,
                s["tgt0"], w["sa_q_w"], w["sa_k_w"], w["sa_v_w"],
                w["sa_o_w"], heads)
            dw["sa_q_w"] += dwq2; dw["sa_q_b"] += dbq2
            dw["sa_k_w"] += dwk2; dw["sa_k_b"] += dbk2
            dw["sa_v_w"] += dwv2; dw["sa_v_b"] += dbv2
            dw["sa_o_w"] += dwo2; dw["sa_o_b"] += dbo2
            dtgt_row = dtgt_row + dq2 + dk2 + dv2
            dqpos_row = dqpos_row + dq2 + dk2
        else:
            dtgt_row = dt1

        dtgt_ref[r] = dtgt_row
        dmem_ref[r] = dmem_row
        dpos_ref[r] = dpos_row
        dqpos_ref[r] = dqpos_row

    for name, ref in zip(_W_NAMES, dw_refs):
        ref[...] += dw[name]


def _weights_from_params(p, self_attn):
    sa = p.get("self_attn")
    ca = p["multihead_attn"]
    d = ca["q_proj"]["kernel"].shape[0]
    zero_w = jnp.zeros((d, d), jnp.float32)
    zero_b = jnp.zeros((d,), jnp.float32)
    ones = jnp.ones((d,), jnp.float32)

    def attn_w(a, key, which):
        if a is None:
            return {"kernel": zero_w, "bias": zero_b}[which]
        return a[key][which]

    w = {
        "sa_q_w": attn_w(sa, "q_proj", "kernel"), "sa_q_b": attn_w(sa, "q_proj", "bias"),
        "sa_k_w": attn_w(sa, "k_proj", "kernel"), "sa_k_b": attn_w(sa, "k_proj", "bias"),
        "sa_v_w": attn_w(sa, "v_proj", "kernel"), "sa_v_b": attn_w(sa, "v_proj", "bias"),
        "sa_o_w": attn_w(sa, "out_proj", "kernel"), "sa_o_b": attn_w(sa, "out_proj", "bias"),
        "ca_q_w": ca["q_proj"]["kernel"], "ca_q_b": ca["q_proj"]["bias"],
        "ca_k_w": ca["k_proj"]["kernel"], "ca_k_b": ca["k_proj"]["bias"],
        "ca_v_w": ca["v_proj"]["kernel"], "ca_v_b": ca["v_proj"]["bias"],
        "ca_o_w": ca["out_proj"]["kernel"], "ca_o_b": ca["out_proj"]["bias"],
        "n1_g": p["norm1"]["scale"] if self_attn else ones,
        "n1_b": p["norm1"]["bias"] if self_attn else zero_b,
        "n2_g": p["norm2"]["scale"], "n2_b": p["norm2"]["bias"],
        "n3_g": p["norm3"]["scale"], "n3_b": p["norm3"]["bias"],
        "l1_w": p["linear1"]["kernel"], "l1_b": p["linear1"]["bias"],
        "l2_w": p["linear2"]["kernel"], "l2_b": p["linear2"]["bias"],
    }
    return w


def _common_specs(block_b, q, L, d, w_vals):
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple([0] * len(shape)), memory_space=pltpu.VMEM)
    blk_t = pl.BlockSpec((block_b, q, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_m = pl.BlockSpec((block_b, L, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_mask = pl.BlockSpec((block_b, 1, L), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    w_specs = [rep(v.shape) for v in w_vals]
    return rep, blk_t, blk_m, blk_mask, w_specs


def _pad_batch(arrs, mask, block_b, L):
    b = arrs[0].shape[0]
    pad = (-b) % block_b
    if pad:
        arrs = [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) for a in arrs]
        mask = jnp.concatenate(
            [mask, jnp.zeros((pad, L), mask.dtype).at[:, 0].set(1)], axis=0)
    return arrs, mask, b


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_decoder_layer_train(params, tgt, memory, mask, pos, query_pos,
                              heads=8, self_attn=True, block_b=4,
                              interpret=None):
    """Differentiable fused decoder layer (post-norm, deterministic)."""
    return _fwd_call(params, tgt, memory, mask, pos, query_pos, heads,
                     self_attn, block_b, interpret)


def _fwd_call(params, tgt, memory, mask, pos, query_pos, heads, self_attn,
              block_b, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p = params["params"] if "params" in params else params
    w = _weights_from_params(p, self_attn)
    w_vals = [w[name] for name in _W_NAMES]
    b, q, d = tgt.shape
    L = memory.shape[1]
    (arrs, mask_p, b0) = _pad_batch(
        [tgt, memory, pos, query_pos], mask, block_b, L)
    tgt_p, mem_p, pos_p, qpos_p = arrs
    bp = tgt_p.shape[0]
    rep, blk_t, blk_m, blk_mask, w_specs = _common_specs(block_b, q, L, d, w_vals)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, self_attn=self_attn),
        grid=(bp // block_b,),
        in_specs=[blk_t, blk_m, blk_mask, blk_m, blk_t] + w_specs,
        out_specs=blk_t,
        out_shape=jax.ShapeDtypeStruct((bp, q, d), jnp.float32),
        interpret=interpret,
    )(tgt_p.astype(jnp.float32), mem_p.astype(jnp.float32),
      mask_p.astype(jnp.float32)[:, None, :], pos_p.astype(jnp.float32),
      qpos_p.astype(jnp.float32), *w_vals)
    return out[:b0]


def _train_fwd(params, tgt, memory, mask, pos, query_pos, heads, self_attn,
               block_b, interpret):
    out = _fwd_call(params, tgt, memory, mask, pos, query_pos, heads,
                    self_attn, block_b, interpret)
    return out, (params, tgt, memory, mask, pos, query_pos)


def _train_bwd(heads, self_attn, block_b, interpret, res, g):
    params, tgt, memory, mask, pos, query_pos = res
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p = params["params"] if "params" in params else params
    w = _weights_from_params(p, self_attn)
    w_vals = [w[name] for name in _W_NAMES]
    b, q, d = tgt.shape
    L = memory.shape[1]
    (arrs, mask_p, b0) = _pad_batch(
        [tgt, memory, pos, query_pos, g], mask, block_b, L)
    tgt_p, mem_p, pos_p, qpos_p, g_p = arrs
    bp = tgt_p.shape[0]
    rep, blk_t, blk_m, blk_mask, w_specs = _common_specs(block_b, q, L, d, w_vals)

    out_shapes = ([jax.ShapeDtypeStruct((bp, q, d), jnp.float32),
                   jax.ShapeDtypeStruct((bp, L, d), jnp.float32),
                   jax.ShapeDtypeStruct((bp, L, d), jnp.float32),
                   jax.ShapeDtypeStruct((bp, q, d), jnp.float32)]
                  + [jax.ShapeDtypeStruct(v.shape, jnp.float32) for v in w_vals])
    out_specs = [blk_t, blk_m, blk_m, blk_t] + w_specs

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, self_attn=self_attn),
        grid=(bp // block_b,),
        in_specs=[blk_t, blk_m, blk_mask, blk_m, blk_t, blk_t] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(tgt_p.astype(jnp.float32), mem_p.astype(jnp.float32),
      mask_p.astype(jnp.float32)[:, None, :], pos_p.astype(jnp.float32),
      qpos_p.astype(jnp.float32), g_p.astype(jnp.float32), *w_vals)

    dtgt, dmem, dpos, dqpos = outs[:4]
    dw = dict(zip(_W_NAMES, outs[4:]))

    dp: Dict = {
        "multihead_attn": {
            "q_proj": {"kernel": dw["ca_q_w"], "bias": dw["ca_q_b"]},
            "k_proj": {"kernel": dw["ca_k_w"], "bias": dw["ca_k_b"]},
            "v_proj": {"kernel": dw["ca_v_w"], "bias": dw["ca_v_b"]},
            "out_proj": {"kernel": dw["ca_o_w"], "bias": dw["ca_o_b"]},
        },
        "norm2": {"scale": dw["n2_g"], "bias": dw["n2_b"]},
        "norm3": {"scale": dw["n3_g"], "bias": dw["n3_b"]},
        "linear1": {"kernel": dw["l1_w"], "bias": dw["l1_b"]},
        "linear2": {"kernel": dw["l2_w"], "bias": dw["l2_b"]},
    }
    if self_attn:
        dp["self_attn"] = {
            "q_proj": {"kernel": dw["sa_q_w"], "bias": dw["sa_q_b"]},
            "k_proj": {"kernel": dw["sa_k_w"], "bias": dw["sa_k_b"]},
            "v_proj": {"kernel": dw["sa_v_w"], "bias": dw["sa_v_b"]},
            "out_proj": {"kernel": dw["sa_o_w"], "bias": dw["sa_o_b"]},
        }
        dp["norm1"] = {"scale": dw["n1_g"], "bias": dw["n1_b"]}
    dparams = {"params": dp} if "params" in params else dp
    return (dparams, dtgt[:len(tgt)], dmem[:len(memory)],
            jnp.zeros_like(mask), dpos[:len(pos)], dqpos[:len(query_pos)])


fused_decoder_layer_train.defvjp(_train_fwd, _train_bwd)
