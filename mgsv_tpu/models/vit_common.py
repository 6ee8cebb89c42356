"""Shared ViT block used by the AST (timm DeiT) and CLIP towers.

Both frozen encoders of the reference are 12-layer pre-norm ViTs
(model/ast_models.py uses timm's vit_deit_base_distilled_patch16_384;
CLIP ViT-B/32 comes from the `clip` package).  One block implementation
serves both — the differences (activation, qkv packing) are parameters.
Attention runs as one fused einsum chain that XLA maps onto the MXU; for
the AST's 1214-token sequences a Pallas flash-attention path can be
swapped in via `attention_fn`.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from mgsv_tpu.models.layers import quick_gelu


def default_attention(q, k, v, scale):
    """[B, H, L, Dh] full attention (XLA-fused)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    attn = nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


class ViTSelfAttention(nn.Module):
    dim: int
    heads: int
    attention_fn: Callable = default_attention
    dtype: jnp.dtype = jnp.float32    # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)  # packed like timm/CLIP
        qkv = qkv.reshape(*x.shape[:-1], 3, self.heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, -3, 0)
        q = jnp.moveaxis(q, -2, -3)                            # [B, H, L, Dh]
        k = jnp.moveaxis(k, -2, -3)
        v = jnp.moveaxis(v, -2, -3)
        out = self.attention_fn(q, k, v, 1.0 / jnp.sqrt(jnp.float32(head_dim)))
        out = jnp.moveaxis(out, -3, -2).reshape(*x.shape[:-1], self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm transformer block: x + attn(ln1(x)); x + mlp(ln2(x))."""

    dim: int
    heads: int
    mlp_ratio: float = 4.0
    act: str = "gelu"              # "gelu" (timm/AST) | "quick_gelu" (CLIP)
    attention_fn: Callable = default_attention
    dtype: jnp.dtype = jnp.float32    # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # LayerNorms compute in float32 for stability; matmuls in self.dtype.
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).astype(self.dtype)
        x = x + ViTSelfAttention(self.dim, self.heads,
                                 attention_fn=self.attention_fn,
                                 dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h) if self.act == "quick_gelu" else nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h
