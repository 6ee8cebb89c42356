"""Pallas fused attention for TPU (non-causal, optional key-padding mask).

Targets the frozen-tower hot loop (SURVEY.md §3.5: AST runs 96 snippets x
1214 tokens x 12 ViT blocks per music track) and the MaDe attention sites.

v2 design (replaces the round-1 online-softmax kernel): at these sequence
lengths the whole K/V of one (batch, head) fits comfortably in VMEM
(1280 x 64 fp32 = 328 KB), so each program computes a full [block_q, L]
score tile with ONE MXU matmul, a row softmax, and one PV matmul — no
online-softmax bookkeeping, no per-block loop.  K/V block indices are
constant across the inner q-tile grid dimension, so Pallas fetches them
once per (batch*head) and reuses them for every q tile.  The matmuls run
on bf16 MXU tiles (f32 accumulate) when `precision="bf16"`, and the
softmax uses exp2 with log2(e) folded into the query scaling (one VPU op
cheaper per element than exp).

v1's failure mode (measured 7 TFLOP/s vs XLA's ~48): a fori_loop of ten
[128, 64] x [64, 128] matmuls per q block underutilized the MXU and
serialized VPU work; the restructure turns the same math into two large
matmuls per program.

Interface matches mgsv_tpu.models.vit_common.default_attention:
    flash_attention(q, k, v, scale, key_mask=None) with
    q/k/v: [B, H, L, Dh] -> [B, H, Lq, Dh]

STATUS — measured on v5e at the AST shape [96, 12, 1214, 64]:
    XLA fused attention   7.7 ms   56 TFLOP/s   (f32 AND bf16)
    this kernel (v2)     17.3 ms   25 TFLOP/s   (bf16, block_q=1280)
    this kernel (v1)     ~69 ms     7 TFLOP/s   (round 1)
    jax.experimental.pallas.ops.tpu.flash_attention
                         67.4 ms    7 TFLOP/s   (bf16, L padded to 1280)
v2 is 3.4x faster than v1 AND than the flash kernel that ships with JAX,
but XLA's fused attention is ~2.3x faster still — at head_dim 64 with
L~1.2k, XLA's layout/fusion choices sit near the lane-constrained roofline
and no flash-style kernel here beats it.  XLA therefore REMAINS the default
attention everywhere (an evidence-backed decision, not a gap); this kernel
is opt-in via make_attention_fn for shapes where streaming wins (long-L,
memory-bound regimes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _flash_kernel(q_ref, kt_ref, v_ref, bias_ref, o_ref, *, mxu_dtype):
    """One (batch*head, q_block) program over the full key length.

    q_ref: [block_q, d] (pre-scaled by scale*log2(e)); kt_ref: [d, L]
    (pre-transposed in XLA so the MXU contraction needs no per-program
    relayout); v_ref: [L, d]; bias_ref: [1, L] additive mask bias (0 valid /
    -inf padded — one VPU add instead of a select); o_ref: [block_q, d].
    """
    q = q_ref[:].astype(mxu_dtype)
    s = jax.lax.dot_general(                                   # [bq, L]
        q, kt_ref[:].astype(mxu_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s + bias_ref[:]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)                                        # e^(s-m)/log2e
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(                                   # [bq, d]
        p.astype(mxu_dtype), v_ref[:].astype(mxu_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # fully-masked rows: after max-subtraction l >= 1 always, so detect
    # them by the row max sitting at the -inf bias and zero the output
    dead = m <= NEG_INF * 0.5
    o_ref[:] = jnp.where(dead, 0.0, o / l).astype(o_ref.dtype)


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
    block_q: int = 256,
    block_k: int = 128,        # kv-length padding multiple
    precision: Optional[str] = None,          # "bf16" | "f32"
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if precision is None:
        precision = "bf16" if q.dtype == jnp.bfloat16 else "f32"
    mxu_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    b, h, lq, d = q.shape
    lk = k.shape[2]
    lq_p = -(-lq // block_q) * block_q
    lk_p = -(-lk // block_k) * block_k

    # fold softmax scale and the exp2 conversion into q once (f32, pre-cast)
    qs = q.astype(jnp.float32) * (scale * LOG2E)
    qp = _pad_to(qs, lq_p, 2).reshape(b * h, lq_p, d)
    ktp = _pad_to(k, lk_p, 2).reshape(b * h, lk_p, d).swapaxes(1, 2)
    vp = _pad_to(v, lk_p, 2).reshape(b * h, lk_p, d)

    # additive bias: 0 on valid keys, -inf on padded/masked ones
    if key_mask is None:
        mask = jnp.ones((b, lk), jnp.float32)
    else:
        mask = key_mask.astype(jnp.float32)
    bias = jnp.where(_pad_to(mask, lk_p, 1) != 0, 0.0, NEG_INF)
    bias = jnp.repeat(bias, h, axis=0).reshape(b * h, 1, lk_p)

    grid = (b * h, lq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, mxu_dtype=mxu_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # constant across j: fetched once per (batch*head), reused for
            # every q tile
            pl.BlockSpec((None, d, lk_p), lambda i, j: (i, 0, 0),
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
            bytes_accessed=(qp.size + ktp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
    )(qp, ktp, vp, bias)

    return out.reshape(b, h, lq_p, d)[:, :, :lq, :]


def make_attention_fn(block_q: int = 256, block_k: int = 128,
                      min_seq_len: int = 512, interpret: bool = False):
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
