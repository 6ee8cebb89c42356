"""Generic masked cross-attention transformer (the "CA" fusion option).

Re-derivation of CrossAttention / CrossTransformer (model_Base.py:99-213),
used when mml_fusion == "CA": music snippet tokens attend to video frame
tokens before moment detection (model_Uni.py:32-43, :209-212).

Masking semantics preserved exactly (model_Base.py:147-163):
  * kv_mask: -inf *before* softmax;
  * q_mask: zero the attention rows *after* softmax (the reference's
    workaround to avoid all--inf rows NaNing the softmax).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mgsv_tpu.models.layers import BIG_NEG, FeedForward

_XAVIER = nn.initializers.xavier_normal()


class CrossAttention(nn.Module):
    """model_Base.py:99-167."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,                    # [B, Lq, D]
        context: jnp.ndarray,                  # [B, Lk, D]
        q_mask: Optional[jnp.ndarray] = None,  # [B, Lq] 1 = valid
        kv_mask: Optional[jnp.ndarray] = None, # [B, Lk] 1 = valid
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        inner = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)

        q = nn.Dense(inner, use_bias=False, kernel_init=_XAVIER, name="to_q")(query)
        kv = nn.Dense(inner * 2, use_bias=False, kernel_init=_XAVIER, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(x):
            return x.reshape(*x.shape[:-1], self.heads, self.dim_head).swapaxes(1, 2)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)  # [B, H, L, dh]
        dots = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (self.dim_head ** -0.5)

        if kv_mask is not None:
            dots = jnp.where(kv_mask[:, None, None, :] != 0, dots, BIG_NEG)
        attn = nn.softmax(dots, axis=-1)
        if q_mask is not None:
            attn = attn * (q_mask[:, None, :, None] != 0)

        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.swapaxes(1, 2).reshape(*query.shape[:-1], inner)
        if project_out:
            out = nn.Dense(self.dim, kernel_init=_XAVIER,
                           bias_init=nn.initializers.constant(0.01), name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out, attn


class CrossTransformer(nn.Module):
    """Pre-LN cross-attn + FFN stack + final Linear — model_Base.py:169-213."""

    dim: int
    depth: int = 1
    heads: int = 8
    dim_head: int = 128
    mlp_dim: int = 1024
    out_dim: int = 256
    dropout: float = 0.8

    @nn.compact
    def __call__(self, query, context, q_mask=None, kv_mask=None, deterministic=True):
        x = query
        last_attn = None
        for i in range(self.depth):
            norm_x = nn.LayerNorm(epsilon=1e-5, name=f"q_norm_{i}")(x)
            norm_ctx = nn.LayerNorm(epsilon=1e-5, name=f"ctx_norm_{i}")(context)
            x_res, attn = CrossAttention(
                self.dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, name=f"cross_attn_{i}",
            )(norm_x, norm_ctx, q_mask, kv_mask, deterministic=deterministic)
            attn_x = x_res + x
            norm_x = nn.LayerNorm(epsilon=1e-5, name=f"ff_norm_{i}")(attn_x)
            x = FeedForward(self.mlp_dim, self.dim, dropout=self.dropout,
                            name=f"ff_{i}")(norm_x, deterministic=deterministic) + attn_x
            last_attn = attn
        x = nn.Dense(self.out_dim, name="final_linear")(x)
        return x, last_attn
