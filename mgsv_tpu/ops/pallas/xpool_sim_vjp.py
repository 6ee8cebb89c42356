"""Custom-VJP fused X-Pool pooled similarity for TRAINING.

The retrieval half of the train step is dominated by the X-Pool chain
(SURVEY.md §3 hot loop #1): XPoolTransformer materializes the pooled tensor
[M, V, D] plus five same-sized intermediates (ctx, LN2, linear, residual,
LN3) in HBM — at bs=512, D=256 that is ~0.3 GB per intermediate per
direction.  This module computes the [V, M] pooled-cosine-similarity matrix
directly — per-tile in VMEM, forward AND backward — so nothing O(M*V*D)
ever reaches HBM:

    forward   sim[v, m] = <normalize(LN3(h + drop(h @ Wlin))), vhat[v]>,
              h = LN2((softmax_s(q_v . k_m / sqrt(D)) @ val_m) @ Wout)
    backward  flash-style: residuals are only the kernel INPUTS
              (q, k, val, vhat + the pair-stage weights); every per-pair
              intermediate is recomputed in VMEM and the chain is
              differentiated by hand in the same pass.

The shared-LN1 + q/k/v projections + video normalization stay in XLA
*outside* the custom_vjp boundary (they are O(V*D)/O(M*S*D) once, not per
pair), so autodiff handles their gradients and the hand-written backward
scope is exactly the per-pair stage.

Dropout (xpool_dropout=0.3 upstream, modules/transformer.py:133,176) runs
on the in-kernel TPU PRNG with the same regenerate-don't-store discipline
as ops/pallas/fused_encoder_layer_vjp.py: the [bv, D] keep-mask of a
(music, v-tile) pair is redrawn from (seed, pair_tag) at every use site.
On CPU (interpret) the rate>0 path falls back to the pure-JAX chain with
jax.random masks (pltpu PRNG semantics are TPU-only).

Weight-gradient accumulation uses the sequential-grid revisit pattern:
dk/dval accumulate over the inner v-tile dimension into the same output
block; pair-stage weight grads accumulate across the whole grid; dq/dvhat
are written as per-m-tile partials and reduced with one XLA sum.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgsv_tpu.ops.pallas.fused_encoder_layer import _keep_mask
from mgsv_tpu.ops.pallas.fused_encoder_layer_vjp import _ln_bwd, _ln_fwd

NEG_INF = -1e9


_dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
# a^T b over the row axis: [R, X]^T @ [R, Y] -> [X, Y]
_dot_t = lambda a, b: jax.lax.dot_general(
    a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
# a b^T over the feature axis: [R, X] @ [S, X]^T -> [R, S]
_dot_bt = lambda a, b: jax.lax.dot_general(
    a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _pair_stage_fwd(q, k_m, v_m, mask_m, wout, bout, g2, b2, wlin, blin,
                    g3, b3, scale, dmask):
    """The per-(music, video-tile) stage, shared by fwd/bwd recompute.

    q: [bv, D]; k_m/v_m: [S, D]; mask_m: [S]; dmask: [bv, D] keep mask
    (already 1/keep-scaled) or None.  Returns every intermediate the
    backward needs.
    """
    scores = _dot_bt(q, k_m) * scale                       # [bv, S]
    scores = jnp.where(mask_m[None, :] != 0, scores, NEG_INF)
    scores = scores - scores.max(axis=-1, keepdims=True)
    e = jnp.exp(scores)
    p = e / e.sum(axis=-1, keepdims=True)                  # [bv, S]
    ctx = _dot(p, v_m)                                     # [bv, D]
    c1 = _dot(ctx, wout) + bout
    h, xh2, inv2 = _ln_fwd(c1, g2, b2)                     # LN2
    lin = _dot(h, wlin) + blin
    if dmask is not None:
        lin = lin * dmask
    u = h + lin
    o, xh3, inv3 = _ln_fwd(u, g3, b3)                      # LN3
    n2 = jnp.maximum((o * o).sum(axis=-1, keepdims=True), 1e-24)
    inv_n = jax.lax.rsqrt(n2)
    ohat = o * inv_n
    return p, ctx, h, xh2, inv2, xh3, inv3, ohat, inv_n


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, vhat_ref,
                wout_ref, bout_ref, g2_ref, b2_ref,
                wlin_ref, blin_ref, g3_ref, b3_ref, seed_ref,
                out_ref, *, scale, rate, n_vj):
    bv, d = q_ref.shape
    bm = k_ref.shape[0]
    i, j = pl.program_id(0), pl.program_id(1)
    q, vhat = q_ref[:], vhat_ref[:]
    wout, bout = wout_ref[:], bout_ref[:]
    wlin, blin = wlin_ref[:], blin_ref[:]
    g2, b2, g3, b3 = g2_ref[:], b2_ref[:], g3_ref[:], b3_ref[:]

    for mi in range(bm):
        dmask = None
        if rate > 0.0:
            tag = (i * bm + mi) * n_vj + j
            dmask = _keep_mask(seed_ref[0], tag, 0, (bv, d), rate)
        *_, ohat, _ = _pair_stage_fwd(
            q, k_ref[mi], v_ref[mi], mask_ref[mi], wout, bout, g2, b2,
            wlin, blin, g3, b3, scale, dmask)
        out_ref[mi, :] = (ohat * vhat).sum(-1)             # [bv]


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, vhat_ref,
                wout_ref, bout_ref, g2_ref, b2_ref,
                wlin_ref, blin_ref, g3_ref, b3_ref, seed_ref, g_ref,
                dq_ref, dvhat_ref, dk_ref, dv_ref,
                dwout_ref, dbout_ref, dg2_ref, db2_ref,
                dwlin_ref, dblin_ref, dg3_ref, db3_ref,
                *, scale, rate, n_vj):
    bv, d = q_ref.shape
    bm = k_ref.shape[0]
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero_params():
        for ref in (dwout_ref, dbout_ref, dg2_ref, db2_ref,
                    dwlin_ref, dblin_ref, dg3_ref, db3_ref):
            ref[...] = jnp.zeros_like(ref)

    @pl.when(j == 0)
    def _zero_kv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q, vhat = q_ref[:], vhat_ref[:]
    wout, bout = wout_ref[:], bout_ref[:]
    wlin, blin = wlin_ref[:], blin_ref[:]
    g2, b2, g3, b3 = g2_ref[:], b2_ref[:], g3_ref[:], b3_ref[:]

    dq = jnp.zeros((bv, d), jnp.float32)
    dvhat = jnp.zeros((bv, d), jnp.float32)
    dwout = jnp.zeros_like(wout)
    dbout = jnp.zeros_like(bout)
    dg2 = jnp.zeros_like(g2)
    db2 = jnp.zeros_like(b2)
    dwlin = jnp.zeros_like(wlin)
    dblin = jnp.zeros_like(blin)
    dg3 = jnp.zeros_like(g3)
    db3 = jnp.zeros_like(b3)

    for mi in range(bm):
        k_m, v_m, mask_m = k_ref[mi], v_ref[mi], mask_ref[mi]
        dmask = None
        if rate > 0.0:
            tag = (i * bm + mi) * n_vj + j
            dmask = _keep_mask(seed_ref[0], tag, 0, (bv, d), rate)
        # ---------- recompute ----------
        p, ctx, h, xh2, inv2, xh3, inv3, ohat, inv_n = _pair_stage_fwd(
            q, k_m, v_m, mask_m, wout, bout, g2, b2, wlin, blin, g3, b3,
            scale, dmask)
        sim = (ohat * vhat).sum(-1, keepdims=True)         # [bv, 1]
        gm = g_ref[mi][:, None]                            # [bv, 1]

        # ---------- backward ----------
        dvhat = dvhat + gm * ohat
        do = gm * (vhat - sim * ohat) * inv_n              # d/d o of cosine
        du, dg3_c, db3_c = _ln_bwd(do, xh3, inv3, g3)
        dg3 += dg3_c
        db3 += db3_c
        dlin = du if dmask is None else du * dmask
        dwlin += _dot_t(h, dlin)
        dblin += dlin.sum(axis=0)
        dh = du + _dot(dlin, wlin.T)
        dc1, dg2_c, db2_c = _ln_bwd(dh, xh2, inv2, g2)
        dg2 += dg2_c
        db2 += db2_c
        dwout += _dot_t(ctx, dc1)
        dbout += dc1.sum(axis=0)
        dctx = _dot(dc1, wout.T)
        dp = _dot_bt(dctx, v_m)                            # [bv, S]
        dv_ref[mi] += _dot_t(p, dctx)                      # [S, D]
        ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
        dq = dq + _dot(ds, k_m) * scale
        dk_ref[mi] += _dot_t(ds, q) * scale                # [S, D]

    dq_ref[...] = dq
    dvhat_ref[...] = dvhat
    dwout_ref[...] += dwout
    dbout_ref[...] += dbout
    dg2_ref[...] += dg2
    db2_ref[...] += db2
    dwlin_ref[...] += dwlin
    dblin_ref[...] += dblin
    dg3_ref[...] += dg3
    db3_ref[...] += db3


def _pad_inputs(q, k, v, mask, vhat, block_v, block_m):
    vcount, d = q.shape
    m, s, _ = k.shape
    vp = -(-vcount // block_v) * block_v
    mp = -(-m // block_m) * block_m
    if vp - vcount:
        q = jnp.pad(q, ((0, vp - vcount), (0, 0)))
        vhat = jnp.pad(vhat, ((0, vp - vcount), (0, 0)))
    if mp - m:
        k = jnp.pad(k, ((0, mp - m), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, mp - m), (0, 0), (0, 0)))
        mask = jnp.concatenate(
            [mask, jnp.zeros((mp - m, s), mask.dtype).at[:, 0].set(1.0)],
            axis=0)
    return q, k, v, mask, vhat, vp, mp


def _core_jax(q, k, v, mask, vhat, wout, bout, g2, b2, wlin, blin, g3, b3,
              dmask):
    """Pure-JAX oracle of the per-pair stage (materializes [M, V, D]) —
    CPU fallback for rate>0 and the on-chip validation oracle."""
    d = q.shape[-1]
    scores = jnp.einsum("vd,msd->mvs", q, k) / jnp.sqrt(jnp.float32(d))
    scores = jnp.where(mask[:, None, :] != 0, scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("mvs,msd->mvd", p, v)
    c1 = ctx @ wout + bout
    h, _, _ = _ln_fwd(c1, g2, b2)
    lin = h @ wlin + blin
    if dmask is not None:
        lin = lin * dmask
    o, _, _ = _ln_fwd(h + lin, g3, b3)
    ohat = o * jax.lax.rsqrt(
        jnp.maximum((o * o).sum(-1, keepdims=True), 1e-24))
    return jnp.einsum("mvd,vd->mv", ohat, vhat)            # [M, V]


def _jax_dropout_mask(seed, m, vcount, d, rate):
    key = jax.random.PRNGKey(seed.astype(jnp.uint32)[0])
    keep = jax.random.bernoulli(key, 1.0 - rate, (m, vcount, d))
    return keep.astype(jnp.float32) / (1.0 - rate)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17))
def _xpool_core(q, k, v, mask, vhat, wout, bout, g2, b2, wlin, blin, g3, b3,
                seed, rate=0.0, block_v=128, block_m=8, interpret=None):
    """[M, V] pooled cosine similarity (transpose for the [V, M] convention)."""
    out, _ = _core_fwd(q, k, v, mask, vhat, wout, bout, g2, b2, wlin, blin,
                       g3, b3, seed, rate, block_v, block_m, interpret)
    return out


def _core_fwd(q, k, v, mask, vhat, wout, bout, g2, b2, wlin, blin, g3, b3,
              seed, rate, block_v, block_m, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    res = (q, k, v, mask, vhat, wout, bout, g2, b2, wlin, blin, g3, b3, seed)
    m, s, d = k.shape
    vcount = q.shape[0]
    if rate > 0.0 and interpret:
        dmask = _jax_dropout_mask(seed, m, vcount, d, rate)
        return _core_jax(q, k, v, mask, vhat, wout, bout, g2, b2, wlin, blin,
                         g3, b3, dmask), res

    qp, kp, vp_, maskp, vhatp, vp, mp = _pad_inputs(
        q, k, v, mask, vhat, block_v, block_m)
    n_vj = vp // block_v
    grid = (mp // block_m, n_vj)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple([0] * len(shape)), memory_space=pltpu.VMEM)

    sims = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=1.0 / (d ** 0.5), rate=rate,
                          n_vj=n_vj),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_v, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),          # q
            pl.BlockSpec((block_m, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # k
            pl.BlockSpec((block_m, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # v
            pl.BlockSpec((block_m, s), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),          # mask
            pl.BlockSpec((block_v, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),          # vhat
            rep((d, d)), rep((d,)), rep((d,)), rep((d,)),
            rep((d, d)), rep((d,)), rep((d,)), rep((d,)),
            pl.BlockSpec(memory_space=pltpu.SMEM),          # seed
        ],
        out_specs=pl.BlockSpec((block_m, block_v), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, vp), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if rate > 0.0 else None,
    )(qp.astype(jnp.float32), kp.astype(jnp.float32), vp_.astype(jnp.float32),
      maskp.astype(jnp.float32), vhatp.astype(jnp.float32),
      wout, bout, g2, b2, wlin, blin, g3, b3,
      seed.astype(jnp.int32).reshape((1,)))
    return sims[:m, :vcount], res


def _core_bwd(rate, block_v, block_m, interpret, res, g):
    (q, k, v, mask, vhat, wout, bout, g2, b2, wlin, blin, g3, b3, seed) = res
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, s, d = k.shape
    vcount = q.shape[0]

    if rate > 0.0 and interpret:
        dmask = _jax_dropout_mask(seed, m, vcount, d, rate)
        _, vjp = jax.vjp(
            lambda q_, k_, v_, vh_, a, b, c, e, f, h_, i_, j_: _core_jax(
                q_, k_, v_, mask, vh_, a, b, c, e, f, h_, i_, j_, dmask),
            q, k, v, vhat, wout, bout, g2, b2, wlin, blin, g3, b3)
        (dq, dk, dv, dvhat, dwout, dbout, dg2, db2,
         dwlin, dblin, dg3, db3) = vjp(g)
    else:
        qp, kp, vp_, maskp, vhatp, vp, mp = _pad_inputs(
            q, k, v, mask, vhat, block_v, block_m)
        n_vj = vp // block_v
        n_mi = mp // block_m
        gp = jnp.zeros((mp, vp), jnp.float32).at[:m, :vcount].set(
            g.astype(jnp.float32))

        rep = lambda shape: pl.BlockSpec(
            shape, lambda i, j: tuple([0] * len(shape)),
            memory_space=pltpu.VMEM)
        out_shapes = [
            jax.ShapeDtypeStruct((n_mi, vp, d), jnp.float32),   # dq partials
            jax.ShapeDtypeStruct((n_mi, vp, d), jnp.float32),   # dvhat partials
            jax.ShapeDtypeStruct((mp, s, d), jnp.float32),      # dk
            jax.ShapeDtypeStruct((mp, s, d), jnp.float32),      # dv
            jax.ShapeDtypeStruct((d, d), jnp.float32),          # dwout
            jax.ShapeDtypeStruct((d,), jnp.float32),
            jax.ShapeDtypeStruct((d,), jnp.float32),            # dg2
            jax.ShapeDtypeStruct((d,), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),          # dwlin
            jax.ShapeDtypeStruct((d,), jnp.float32),
            jax.ShapeDtypeStruct((d,), jnp.float32),            # dg3
            jax.ShapeDtypeStruct((d,), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((None, block_v, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_v, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [rep(sh.shape) for sh in out_shapes[4:]]

        outs = pl.pallas_call(
            functools.partial(_bwd_kernel, scale=1.0 / (d ** 0.5), rate=rate,
                              n_vj=n_vj),
            grid=(n_mi, n_vj),
            in_specs=[
                pl.BlockSpec((block_v, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m, s, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m, s, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m, s), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_v, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                rep((d, d)), rep((d,)), rep((d,)), rep((d,)),
                rep((d, d)), rep((d,)), rep((d,)), rep((d,)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((block_m, block_v), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),          # g
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qp.astype(jnp.float32), kp.astype(jnp.float32),
          vp_.astype(jnp.float32), maskp.astype(jnp.float32),
          vhatp.astype(jnp.float32),
          wout, bout, g2, b2, wlin, blin, g3, b3,
          seed.astype(jnp.int32).reshape((1,)), gp)
        (dq_p, dvhat_p, dk_p, dv_p, dwout, dbout, dg2, db2,
         dwlin, dblin, dg3, db3) = outs
        dq = dq_p.sum(axis=0)[:vcount]
        dvhat = dvhat_p.sum(axis=0)[:vcount]
        dk = dk_p[:m]
        dv = dv_p[:m]

    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return (dq, dk, dv, jnp.zeros_like(mask), dvhat,
            dwout, dbout, dg2, db2, dwlin, dblin, dg3, db3, dseed)


_xpool_core.defvjp(
    lambda *a: _core_fwd(*a),
    _core_bwd,
)
