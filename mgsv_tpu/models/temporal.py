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
import jax
import jax.numpy as jnp

from mgsv_tpu.models.layers import MultiHeadAttention, _ProjParams


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


_XAVIER = nn.initializers.xavier_uniform()     # MultiHeadAttention default
_LECUN = nn.initializers.lecun_normal()        # nn.Dense default


class FusedTemporalTransformer(nn.Module):
    """TemporalTransformer twin backed by the fused Pallas fwd+bwd kernels
    (ops/pallas/fused_temporal_layer.py).

    Declares the exact same parameter tree (checkpoint- and torch-import-
    compatible: norm1_{i}, attn_{i}/{q,k,v,out}_proj, norm2_{i},
    ff_fc1_{i}, ff_fc2_{i}, final_linear) and the same init distributions.
    Motivation: the two towers cost 20.5 ms of the 55 ms step at the paper
    dropout 0.8 under XLA (BASELINE.md round-3 attribution); the fused
    layer keeps the [H, L, L] attention and all dropout masks in VMEM with
    the in-kernel PRNG.  The final Linear stays in XLA (one big GEMM).
    """

    dim: int
    depth: int
    heads: int
    mlp_dim: int
    out_dim: int
    dropout: float = 0.0
    # accepted for signature parity with TemporalTransformer but NOT
    # honored: the fused kernel takes f32 operands (MXU tiles still run
    # bf16 under the default matmul precision, so the throughput cost is
    # HBM traffic only) — warn so a bf16 A/B isn't silently partial
    dtype: Optional[jnp.dtype] = None
    block_b: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, deterministic: bool = True):
        from mgsv_tpu.ops.pallas.fused_temporal_layer import (
            fused_temporal_layer_train)

        if self.dtype is not None and self.dtype != jnp.float32:
            import logging
            logging.getLogger("mgsv_tpu").warning(
                "FusedTemporalTransformer ignores dtype=%s (f32 operands; "
                "MXU tiles still bf16 via matmul precision)", self.dtype)

        d = self.dim

        class _Attn(nn.Module):
            @nn.compact
            def __call__(self):
                return {
                    name: dict(zip(("kernel", "bias"),
                                   _ProjParams(d, _XAVIER, name=name)(d)))
                    for name in ("q_proj", "k_proj", "v_proj", "out_proj")
                }

        class _Norm(nn.Module):
            @nn.compact
            def __call__(self):
                return {"scale": self.param("scale", nn.initializers.ones, (d,)),
                        "bias": self.param("bias", nn.initializers.zeros, (d,))}

        rate = 0.0 if deterministic else self.dropout
        x = x.astype(jnp.float32)
        for i in range(self.depth):
            params = {
                "norm1": _Norm(name=f"norm1_{i}")(),
                "self_attn": _Attn(name=f"attn_{i}")(),
                "norm2": _Norm(name=f"norm2_{i}")(),
                "linear1": dict(zip(("kernel", "bias"),
                                    _ProjParams(self.mlp_dim, _LECUN,
                                                name=f"ff_fc1_{i}")(d))),
                "linear2": dict(zip(("kernel", "bias"),
                                    _ProjParams(d, _LECUN,
                                                name=f"ff_fc2_{i}")(self.mlp_dim))),
            }
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            x = fused_temporal_layer_train(
                params, x, mask, seed, self.heads, self.block_b, None, rate)
        return nn.Dense(self.out_dim, name="final_linear")(x)
