"""Temporal "enhancement" transformer over frame / snippet tokens.

Re-derivation of Transformer_enhancement (model_Base.py:64-91): depth-N
stack of [norm1 -> self-attn(+residual on the *normed* input) -> norm2 ->
FFN(+residual)] followed by a final Linear.  The reference's unusual
residual placement (the residual is taken *after* norm1 is applied in
place) is preserved exactly:

    x = norm1(x); x = attn(x, x, x) + x; x = norm2(x); x = ff(x) + x
    return final_linear(x)

Default depth 1, 8 heads, FFN 256->1024->256, dropout 0.8 (r_enc,
model_Base.py:296).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from mgsv_tpu.models.layers import MultiHeadAttention


class TemporalTransformer(nn.Module):
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None   # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, deterministic: bool = True):
        """x: [B, L, D]; mask: [B, L] (1 = valid) -> [B, L, out_dim]."""
        for i in range(self.depth):
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(x)
            attn = MultiHeadAttention(
                self.dim, self.heads, dropout=self.dropout, dtype=self.dtype,
                name=f"attn_{i}"
            )(x, x, x, key_mask=mask, deterministic=deterministic)
            x = attn + x
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(x)
            h = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"ff_fc1_{i}")(x)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = nn.Dense(self.dim, dtype=self.dtype, name=f"ff_fc2_{i}")(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            x = h + x
        return nn.Dense(self.out_dim, name="final_linear")(x)
