"""Fused X-Pool pooled-similarity Pallas kernel.

The eval/retrieval hot spot (SURVEY.md §3 "hot loops ranked" #1): for every
(music m, video v) pair, X-Pool attends video v's query over music m's
snippet tokens, post-processes the pooled vector (out-proj, LN, linear
residual, LN), normalizes, and dots it with the video embedding
(modules/transformer.py:87-180 + modules/metrics.py:10-24).

The XLA blocked implementation (eval/similarity.py) already avoids the
[M, V, D] materialization across blocks, but still writes each intermediate
([block, V, D] for ctx, LN, linear, residual, LN) to HBM between ops.  This
kernel computes a whole [block_v, block_m] similarity tile in VMEM —
attention scores, context, out-proj, LN2, linear+residual, LN3, cosine —
with one HBM write of the tile.  Eval-only (no dropout, no grad): training
uses the XLA path where autodiff and dropout live.

Projections of the *inputs* (shared LN1 + q/k/v projections) are
precomputed with XLA outside the kernel: they are O(V*D) / O(M*S*D) once,
not per pair.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


from mgsv_tpu.ops.pallas.fused_encoder_layer import _layer_norm  # noqa: E402


def _xpool_sim_kernel(q_ref, k_ref, v_ref, mask_ref, vhat_ref,
                      wout_ref, bout_ref, g2_ref, b2_ref,
                      wlin_ref, blin_ref, g3_ref, b3_ref,
                      out_ref, *, scale):
    """One [block_v, block_m] similarity tile.

    q_ref: [bv, D] projected video queries; k/v_ref: [bm, S, D];
    mask_ref: [bm, S]; vhat_ref: [bv, D] normalized video embeddings;
    weights replicated; out_ref: [bv, bm].
    """
    bv, d = q_ref.shape
    bm, s, _ = k_ref.shape
    q = q_ref[:]                                            # [bv, D]
    vhat = vhat_ref[:]                                      # [bv, D]
    wout, bout = wout_ref[:], bout_ref[:]
    wlin, blin = wlin_ref[:], blin_ref[:]
    g2, b2, g3, b3 = g2_ref[:], b2_ref[:], g3_ref[:], b3_ref[:]

    # Static unrolled loop over the music tracks in the tile: every op stays
    # a 2-D matmul / row-wise VPU op (Mosaic rejects lane-splitting
    # reshapes, so the [bv, bm*S] formulation doesn't lower).
    for mi in range(bm):
        k_m = k_ref[mi]                                     # [S, D]
        v_m = v_ref[mi]                                     # [S, D]
        scores = jax.lax.dot_general(
            q, k_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # [bv, S]
        scores = jnp.where(mask_ref[mi][None, :] != 0, scores, NEG_INF)
        scores = scores - scores.max(axis=-1, keepdims=True)
        p = jnp.exp(scores)
        p = p / p.sum(axis=-1, keepdims=True)               # softmax over S
        ctx = jnp.dot(p, v_m, preferred_element_type=jnp.float32)  # [bv, D]
        ctx = jnp.dot(ctx, wout, preferred_element_type=jnp.float32) + bout
        h = _layer_norm(ctx, g2, b2)                        # LN2
        lin = jnp.dot(h, wlin, preferred_element_type=jnp.float32) + blin
        out = _layer_norm(h + lin, g3, b3)                  # LN3
        out = out * jax.lax.rsqrt(
            jnp.maximum((out * out).sum(-1, keepdims=True), 1e-24))
        out_ref[mi, :] = (out * vhat).sum(-1)               # [bv]


def xpool_sim_fused(
    video_emb: jnp.ndarray,       # [V, D]
    seg_tokens: jnp.ndarray,      # [M, S, D]
    seg_mask: Optional[jnp.ndarray],  # [M, S] or None
    xpool_params: Dict,           # XPoolTransformer param subtree
    block_v: int = 128,
    block_m: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[V, M] pooled cosine similarity, fused.  Matches
    sim_matrix_music_pooling(video, XPoolTransformer(video, segs, mask))."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p = xpool_params["params"] if "params" in xpool_params else xpool_params
    vcount, d = video_emb.shape
    m, s, _ = seg_tokens.shape

    g1, b1 = p["layer_norm1"]["scale"], p["layer_norm1"]["bias"]
    video_n = _layer_norm(video_emb, g1, b1)
    segs_n = _layer_norm(seg_tokens, g1, b1)
    ca = p["cross_attn"]
    q_all = video_n @ ca["q_proj"]["kernel"] + ca["q_proj"]["bias"]
    k_all = segs_n @ ca["k_proj"]["kernel"] + ca["k_proj"]["bias"]
    v_all = segs_n @ ca["v_proj"]["kernel"] + ca["v_proj"]["bias"]
    vhat = video_emb * jax.lax.rsqrt(
        jnp.maximum((video_emb * video_emb).sum(-1, keepdims=True), 1e-24))

    if seg_mask is None:
        mask = jnp.ones((m, s), jnp.float32)
    else:
        mask = seg_mask.astype(jnp.float32)

    # pad V and M to block multiples
    vp = -(-vcount // block_v) * block_v
    mp = -(-m // block_m) * block_m
    pad_v, pad_m = vp - vcount, mp - m
    if pad_v:
        q_all = jnp.pad(q_all, ((0, pad_v), (0, 0)))
        vhat = jnp.pad(vhat, ((0, pad_v), (0, 0)))
    if pad_m:
        k_all = jnp.pad(k_all, ((0, pad_m), (0, 0), (0, 0)))
        v_all = jnp.pad(v_all, ((0, pad_m), (0, 0), (0, 0)))
        # one live snippet on padded tracks keeps the softmax finite
        mask = jnp.concatenate(
            [mask, jnp.zeros((pad_m, s)).at[:, 0].set(1.0)], axis=0)

    ca_out = p["cross_attn"]["out_proj"]
    lin = p["linear_proj"]

    grid = (mp // block_m, vp // block_v)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple([0] * len(shape)), memory_space=pltpu.VMEM)

    sims = pl.pallas_call(
        functools.partial(_xpool_sim_kernel, scale=1.0 / (d ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_v, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),            # q
            pl.BlockSpec((block_m, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # k
            pl.BlockSpec((block_m, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # v
            pl.BlockSpec((block_m, s), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),            # mask
            pl.BlockSpec((block_v, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),            # vhat
            rep((d, d)), rep((d,)),                           # out_proj
            rep((d,)), rep((d,)),                             # ln2
            rep((d, d)), rep((d,)),                           # linear_proj
            rep((d,)), rep((d,)),                             # ln3
        ],
        out_specs=pl.BlockSpec((block_m, block_v), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, vp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=vp * mp * (4 * s * d + 4 * d * d + 2 * d),
            bytes_accessed=(q_all.size + 2 * k_all.size) * 4,
            transcendentals=vp * mp * s,
        ),
    )(q_all, k_all, v_all, mask, vhat,
      ca_out["kernel"], ca_out["bias"],
      p["layer_norm2"]["scale"], p["layer_norm2"]["bias"],
      lin["kernel"], lin["bias"],
      p["layer_norm3"]["scale"], p["layer_norm3"]["bias"])

    return sims[:m, :vcount].T
