"""Pallas flash attention for TPU (non-causal, optional key-padding mask).

Targets the frozen-tower hot loop (SURVEY.md §3.5: AST runs 96 snippets x
1214 tokens x 12 ViT blocks per music track) and the MaDe attention sites.
Online-softmax blocked attention: for each query block, stream key/value
blocks through VMEM keeping running (max, sum, weighted-V) statistics, so
the [L, L] score matrix never hits HBM.

Interface matches mgsv_tpu.models.vit_common.default_attention:
    flash_attention(q, k, v, scale, key_mask=None) with
    q/k/v: [B, H, L, Dh] -> [B, H, Lq, Dh]

Sequence lengths are padded to the block size internally; padded keys are
masked out via the same bias mechanism as key padding.  Falls back to the
XLA einsum path automatically for tiny shapes where kernel launch overhead
dominates (wired by callers).

STATUS (measured on v5e, AST shape [96, 12, 1214, 64] fp32): XLA's fused
attention reaches ~48 TFLOP/s (near fp32 roofline) vs ~7 TFLOP/s for this
v1 kernel — the per-q-block full-K/V VMEM copies amplify HBM traffic ~10x.
XLA therefore remains the default attention everywhere; this kernel is
numerically verified (tests/test_flash_attention.py) and opt-in via
`make_attention_fn`, pending a restructured grid (kv-innermost accumulation
in scratch, bf16 MXU tiles) in a later round.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, kv_len,
                  block_k):
    """One (batch*head, q_block) program: stream all k blocks.

    q_ref: [block_q, d]; k_ref/v_ref: [kv_len_padded, d];
    mask_ref: [1, kv_len_padded] (1 = valid); o_ref: [block_q, d].
    """
    block_q, d = q_ref.shape
    q = q_ref[:] * scale

    num_kv_blocks = k_ref.shape[0] // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]          # [bk, d]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [bq, bk]
        mask_blk = mask_ref[0, pl.ds(i * block_k, block_k)]     # [bk]
        s = jnp.where(mask_blk[None, :] != 0, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1)                             # [bq]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])                         # [bq, bk]
        alpha = jnp.exp(m_prev - m_new)                         # [bq]
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
    # guard fully-masked rows (query padding): l == 0 -> output 0
    l_safe = jnp.where(l > 0, l, 1.0)
    o_ref[:] = (acc / l_safe[:, None]).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(
    q: jnp.ndarray,            # [B, H, Lq, Dh]
    k: jnp.ndarray,            # [B, H, Lk, Dh]
    v: jnp.ndarray,
    scale: float,
    key_mask: Optional[jnp.ndarray] = None,   # [B, Lk], 1 = valid
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, lq, d = q.shape
    lk = k.shape[2]
    lq_p = -(-lq // block_q) * block_q
    lk_p = -(-lk // block_k) * block_k

    qp = _pad_to(q, lq_p, 2).reshape(b * h, lq_p, d)
    kp = _pad_to(k, lk_p, 2).reshape(b * h, lk_p, d)
    vp = _pad_to(v, lk_p, 2).reshape(b * h, lk_p, d)

    if key_mask is None:
        mask = jnp.ones((b, lk), jnp.float32)
    else:
        mask = key_mask.astype(jnp.float32)
    mask = _pad_to(mask, lk_p, 1)                          # zero padding = invalid
    mask = jnp.repeat(mask, h, axis=0).reshape(b * h, 1, lk_p)

    grid = (b * h, lq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=lk, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lk_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lk_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, lk_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * lk_p * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
    )(qp, kp, vp, mask)

    return out.reshape(b, h, lq_p, d)[:, :, :lq, :]


def make_attention_fn(block_q: int = 128, block_k: int = 128,
                      min_seq_len: int = 2048, interpret: bool = False):
    """An `attention_fn` drop-in for ViTBlock / vit_common.

    Uses the Pallas kernel when the kv length is large enough to amortize
    launch overhead, else the XLA einsum path.
    """
    from mgsv_tpu.models.vit_common import default_attention

    def attention_fn(q, k, v, scale):
        if k.shape[2] < min_seq_len:
            return default_attention(q, k, v, scale)
        return flash_attention(q, k, v, float(scale), None,
                               block_q=block_q, block_k=block_k,
                               interpret=interpret)

    return attention_fn
