"""Shared neural building blocks (flax.linen).

Functional equivalents of the reference's primitives:
  * QuickGELU                       — model_Base.py:17-20
  * FeedForward                     — model_Base.py:22-45
  * sinusoidal PositionalEncoding   — model_Base.py:48-60
  * DetrMLP                         — music_detr/transformer.py:348-360
  * PositionEmbeddingSine (cumsum)  — music_detr/position_encoding.py:35-71
  * MultiHeadAttention              — torch nn.MultiheadAttention semantics
    (packed-equivalent q/k/v/out projections, scaling 1/sqrt(head_dim),
    key-padding masking before softmax, dropout on attention weights).

All masks in this codebase follow ONE convention: float/bool [B, L] with
1 = valid token, 0 = padding (the reference mixes three conventions —
SURVEY.md §7 "Masking semantics fidelity").
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

BIG_NEG = -1e9  # acts as -inf under softmax (exp underflows to exactly 0)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) — model_Base.py:17-20."""
    return x * nn.sigmoid(1.702 * x)


def sinusoidal_table(seq_len: int, dim: int) -> np.ndarray:
    """Fixed sin/cos table [seq_len, dim] — model_Base.py:48-60."""
    position = np.arange(seq_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float32) * -(math.log(10000.0) / dim))
    pe = np.zeros((seq_len, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def pad_fused_sequence(fused: jnp.ndarray, mask: jnp.ndarray, multiple: int):
    """Pad the fused detection sequence [B, L, D] (+ its [B, L] mask) with
    mask-zero tokens up to a multiple of `multiple` tokens.

    TPU sublane alignment: the paper shape L=146 (50 frames + 96 snippets)
    is misaligned; padding to 152 makes the fused encoder layer FASTER in
    absolute time despite +4% masked tokens (scripts/exp_seq_pad_tpu.py,
    measurements in config.py at detr_seq_pad_multiple).  Valid tokens'
    math is unchanged: pads are masked out of every softmax, the masked
    mean-pool, and the decoder's cross-attention.  Shared by training
    (models/made.py) and serving (serve/engine.py) so the two paths cannot
    drift.  multiple <= 1 disables."""
    extra = (-fused.shape[1]) % multiple if multiple > 1 else 0
    if extra:
        fused = jnp.pad(fused, ((0, 0), (0, extra), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, extra)))
    return fused, mask


def position_embedding_sine(
    mask: jnp.ndarray, num_pos_feats: int, temperature: float = 10000.0,
) -> jnp.ndarray:
    """DETR sine embedding over the cumulative valid-token rank.

    mask: [B, L] with 1 = valid.  Position of a token is its rank among
    valid tokens, normalized to [0, 2*pi] — position_encoding.py:51-71
    (normalize=True, as built at :104).
    Returns [B, L, num_pos_feats].
    """
    x_embed = jnp.cumsum(mask.astype(jnp.float32), axis=1)
    eps = 1e-6
    x_embed = x_embed / (x_embed[:, -1:] + eps) * (2 * math.pi)
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos = x_embed[:, :, None] / dim_t                       # [B, L, F]
    pos = jnp.stack([jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])], axis=3)
    return pos.reshape(pos.shape[0], pos.shape[1], -1)


class TrainablePositionalEncoding(nn.Module):
    """Learned position table + LayerNorm + dropout over the input.

    Re-derivation of music_detr/position_encoding.py:10-32 — built upstream
    by build_position_encoding (:110) but never consumed downstream; kept
    here at the same completeness level (library utility with a parity
    test, unused in shipped configs, mirroring upstream).
    out = dropout(LayerNorm(x + pos_table[:L])).
    """

    max_positions: int
    dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: [B, L, D] with L <= max_positions."""
        table = self.param(
            "position_embeddings",
            nn.initializers.normal(1.0),  # torch nn.Embedding default N(0,1)
            (self.max_positions, self.dim))
        h = x + table[None, : x.shape[1]]
        h = nn.LayerNorm(epsilon=1e-5, name="ln")(h)  # torch LN default eps
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class FeedForward(nn.Module):
    """Linear-GELU-Dropout-Linear-Dropout — model_Base.py:22-45."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    kernel_init: Callable = nn.initializers.xavier_normal()

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, kernel_init=self.kernel_init,
                     bias_init=nn.initializers.constant(0.01), name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, kernel_init=self.kernel_init,
                     bias_init=nn.initializers.constant(0.01), name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class DetrMLP(nn.Module):
    """ReLU MLP head — music_detr/transformer.py:348-360."""

    hidden_dim: int
    out_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layer_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class _ProjParams(nn.Module):
    """Parameter-only projection (kernel/bias named like nn.Dense) so packed
    QKV computation can reuse the standard checkpoint layout."""

    features: int
    kernel_init: Callable

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param("kernel", self.kernel_init, (in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Multi-head attention with torch nn.MultiheadAttention numerics.

    q/k/v/out projections all dim->dim; queries scaled by 1/sqrt(head_dim);
    `key_mask` ([B, Lk], 1 = valid) excluded before softmax; dropout applied
    to the attention weights (as torch does).
    """

    dim: int
    heads: int
    dropout: float = 0.0
    kernel_init: Callable = nn.initializers.xavier_uniform()
    dtype: Optional[jnp.dtype] = None   # compute dtype (params stay float32)

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,                  # [B, Lq, D]
        key: jnp.ndarray,                    # [B, Lk, D]
        value: jnp.ndarray,                  # [B, Lk, D]
        key_mask: Optional[jnp.ndarray] = None,   # [B, Lk], 1 = valid
        deterministic: bool = True,
    ) -> jnp.ndarray:
        head_dim = self.dim // self.heads
        assert head_dim * self.heads == self.dim

        dense = lambda name: nn.Dense(self.dim, kernel_init=self.kernel_init,
                                      dtype=self.dtype, name=name)
        if query is key and key is value:
            # Self-attention fast path: one packed [D, 3D] GEMM instead of
            # three [D, D] GEMMs.  Params keep the q/k/v_proj names so the
            # checkpoint tree (and torch import) is unchanged.
            in_dim = query.shape[-1]
            wq, bq = _ProjParams(self.dim, self.kernel_init, name="q_proj")(in_dim)
            wk, bk = _ProjParams(self.dim, self.kernel_init, name="k_proj")(in_dim)
            wv, bv = _ProjParams(self.dim, self.kernel_init, name="v_proj")(in_dim)
            w = jnp.concatenate([wq, wk, wv], axis=1)        # [D, 3D]
            b = jnp.concatenate([bq, bk, bv], axis=0)
            x = query
            if self.dtype is not None:
                x, w = x.astype(self.dtype), w.astype(self.dtype)
                b = b.astype(self.dtype)
            qkv = x @ w + b
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif query is key:
            # q and k share their input (pos-embedded tokens, DETR layers):
            # pack those two projections; v runs on its own input.
            in_dim = query.shape[-1]
            wq, bq = _ProjParams(self.dim, self.kernel_init, name="q_proj")(in_dim)
            wk, bk = _ProjParams(self.dim, self.kernel_init, name="k_proj")(in_dim)
            w = jnp.concatenate([wq, wk], axis=1)
            b = jnp.concatenate([bq, bk], axis=0)
            x = query
            if self.dtype is not None:
                x, w, b = (x.astype(self.dtype), w.astype(self.dtype),
                           b.astype(self.dtype))
            q, k = jnp.split(x @ w + b, 2, axis=-1)
            v = dense("v_proj")(value)
        else:
            q = dense("q_proj")(query)
            k = dense("k_proj")(key)
            v = dense("v_proj")(value)

        def split(x):
            return x.reshape(*x.shape[:-1], self.heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(head_dim)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :] != 0, logits, BIG_NEG)
        # softmax in float32 for stability regardless of compute dtype
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1)
        if self.dtype is not None:
            attn = attn.astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(*out.shape[:-2], self.dim)
        return dense("out_proj")(out)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over the sequence axis counting only valid tokens.

    x: [B, L, D], mask: [B, L] -> [B, D].  Matches the reference's
    sum / mask.sum pooling (model_Base.py:579, :615) — note the reference
    does NOT guard against empty masks; callers guarantee >= 1 valid token.
    """
    mask = mask.astype(x.dtype)
    return (x * mask[..., None]).sum(axis=1) / mask.sum(axis=1, keepdims=True)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize(p=2) equivalent (denominator clamped to eps like torch).

    Written as sqrt(max(sum_sq, eps^2)) so the gradient at exactly-zero
    vectors is 0 instead of NaN (jnp.linalg.norm has an undefined gradient
    at 0; zero vectors DO occur — e.g. padded frame tokens through a
    zero-bias projection).
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return x / norm
