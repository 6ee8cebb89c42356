"""DETR-style transformer for music-moment detection.

Re-derivation of music_detr/transformer.py: a post-norm (default) encoder
over the fused video+music token sequence and a decoder whose every layer's
output is collected (return_intermediate), with positional embeddings added
inside attention.  The decoder layer *skips self-attention* when
`self_attn=False` (decoder_SA=0, valid since #queries=1 —
transformer.py:281-290).

Differences by design (TPU-first):
  * batch-major [B, L, D] layout throughout (the reference permutes to
    torch's [L, B, D] seq-major layout, transformer.py:65-66);
  * one masked-attention primitive shared with the rest of the framework;
  * the stacked per-layer decoder states come back as a single [layers, B,
    Q, D] array ready for vmapped head/criterion application.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mgsv_tpu.models.layers import MultiHeadAttention

_XAVIER = nn.initializers.xavier_uniform()  # transformer.py:46-49 _reset_parameters


class DetrEncoderLayer(nn.Module):
    """Post-norm / pre-norm encoder layer — transformer.py:150-219."""

    dim: int
    heads: int
    ffn_dim: int
    dropout: float
    pre_norm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, src, mask, pos, deterministic: bool = True):
        attn = MultiHeadAttention(self.dim, self.heads, dropout=self.dropout,
                                  kernel_init=_XAVIER, dtype=self.dtype,
                                  name="self_attn")
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        def ffn(x):
            h = nn.Dense(self.ffn_dim, kernel_init=_XAVIER, dtype=self.dtype,
                         name="linear1")(x)
            h = drop(nn.relu(h))
            h = nn.Dense(self.dim, kernel_init=_XAVIER, dtype=self.dtype,
                         name="linear2")(h)
            return h

        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        if self.pre_norm:                                  # forward_pre :170-189
            src2 = norm1(src)
            qk = src2 + pos
            src = src + drop(attn(qk, qk, src2, key_mask=mask, deterministic=deterministic))
            src2 = norm2(src)
            src = src + drop(ffn(src2))
        else:                                              # forward_post :191-210
            qk = src + pos
            src = src + drop(attn(qk, qk, src, key_mask=mask, deterministic=deterministic))
            src = norm1(src)
            src = src + drop(ffn(src))
            src = norm2(src)
        return src


class DetrDecoderLayer(nn.Module):
    """Decoder layer, optional self-attention — transformer.py:224-321."""

    dim: int
    heads: int
    ffn_dim: int
    dropout: float
    pre_norm: bool = False
    self_attn: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tgt, memory, mem_mask, pos, query_pos, deterministic: bool = True):
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)
        cross = MultiHeadAttention(self.dim, self.heads, dropout=self.dropout,
                                   kernel_init=_XAVIER, dtype=self.dtype,
                                   name="multihead_attn")

        def ffn(x):
            h = nn.Dense(self.ffn_dim, kernel_init=_XAVIER, dtype=self.dtype,
                         name="linear1")(x)
            h = drop(nn.relu(h))
            return nn.Dense(self.dim, kernel_init=_XAVIER, dtype=self.dtype,
                            name="linear2")(h)

        if self.pre_norm:
            # forward_pre (:250-271) — always includes self-attention.
            sa = MultiHeadAttention(self.dim, self.heads, dropout=self.dropout,
                                    kernel_init=_XAVIER, dtype=self.dtype,
                                    name="self_attn")
            tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
            qk = tgt2 + query_pos
            tgt = tgt + drop(sa(qk, qk, tgt2, deterministic=deterministic))
            tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
            tgt = tgt + drop(cross(tgt2 + query_pos, memory + pos, memory,
                                   key_mask=mem_mask, deterministic=deterministic))
            tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
            tgt = tgt + drop(ffn(tgt2))
            return tgt

        # forward_post (:273-307); SA skipped when decoder_SA=0 (:281-290).
        if self.self_attn:
            sa = MultiHeadAttention(self.dim, self.heads, dropout=self.dropout,
                                    kernel_init=_XAVIER, dtype=self.dtype,
                                    name="self_attn")
            qk = tgt + query_pos
            tgt = tgt + drop(sa(qk, qk, tgt, deterministic=deterministic))
            tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)

        tgt2 = cross(tgt + query_pos, memory + pos, memory,
                     key_mask=mem_mask, deterministic=deterministic)
        tgt = tgt + drop(tgt2)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        tgt = tgt + drop(ffn(tgt))
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        return tgt


class FusedDetrEncoderLayer(nn.Module):
    """DetrEncoderLayer twin backed by the fused Pallas fwd+bwd kernels.

    Declares the exact same parameter tree (checkpoint-compatible) and
    routes compute through ops/pallas/fused_encoder_layer_vjp — measured
    12.4 ms vs 59 ms XLA fwd+bwd per layer at bs=512/L=146 on v5e.
    Training dropout (the reference's four per-layer sites,
    music_detr/transformer.py:163-168 + MHA weight dropout) runs on the
    in-kernel TPU PRNG, seeded from the flax "dropout" rng stream; the
    backward kernel regenerates the identical masks from the same seed.
    """

    dim: int
    heads: int
    ffn_dim: int
    dropout: float = 0.0
    block_b: int = 1   # rows per program (bb=1 measured fastest at bs=512)
    precision: str = "f32"   # "bf16" = bf16 MXU tiles, f32 accumulate
    # Multi-device: run the kernel per-device under shard_map (batch over
    # dp, params/seed replicated) with axis_index folded into the dropout
    # seed — the in-kernel PRNG row tags are LOCAL (program_id-derived), so
    # under a replicated seed every dp shard would draw bit-identical keep
    # masks.  Same fix as FusedXPoolSim (models/xpool.py).
    mesh: Optional[object] = None

    @nn.compact
    def __call__(self, src, mask, pos, deterministic: bool = True):
        from mgsv_tpu.models.layers import _ProjParams
        from mgsv_tpu.ops.pallas.fused_encoder_layer_vjp import (
            fused_encoder_layer_train)

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

        ffn = self.ffn_dim
        params = {
            "self_attn": _Attn(name="self_attn")(),
            "norm1": _Norm(name="norm1")(),
            "linear1": dict(zip(("kernel", "bias"),
                                _ProjParams(ffn, _XAVIER, name="linear1")(d))),
            "linear2": dict(zip(("kernel", "bias"),
                                _ProjParams(d, _XAVIER, name="linear2")(ffn))),
            "norm2": _Norm(name="norm2")(),
        }
        rate = 0.0 if deterministic else self.dropout
        if rate > 0.0:
            # One int32 seed per layer call; the kernels fold in program_id
            # for per-block streams and re-derive masks in backward.
            seed = jax.random.randint(
                self.make_rng("dropout"), (1,), 0,
                jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        x32 = src.astype(jnp.float32)
        pos32 = pos.astype(jnp.float32)
        if self.mesh is not None and self.mesh.devices.size > 1:
            from jax.sharding import PartitionSpec as P

            from mgsv_tpu.core.mesh import DATA_AXIS, fold_axis_into_seed

            dp = self.mesh.shape[DATA_AXIS]
            assert src.shape[0] % dp == 0, (src.shape, dp)
            heads, block_b, prec = self.heads, self.block_b, self.precision
            rate_ = rate

            def local_layer(params_, x_, mask_, pos_, seed_):
                seed_ = fold_axis_into_seed(seed_)
                return fused_encoder_layer_train(
                    params_, x_, mask_, pos_, seed_, heads, block_b, None,
                    rate_, prec)

            return jax.shard_map(
                local_layer, mesh=self.mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
                out_specs=P(DATA_AXIS),
                check_vma=False,
            )(params, x32, mask, pos32, seed)
        return fused_encoder_layer_train(
            params, x32, mask, pos32,
            seed, self.heads, self.block_b, None, rate, self.precision)


class FusedDetrDecoderLayer(nn.Module):
    """DetrDecoderLayer twin backed by the fused Pallas fwd+bwd kernels
    (checkpoint-compatible param tree; deterministic math)."""

    dim: int
    heads: int
    ffn_dim: int
    self_attn: bool = True
    block_b: int = 2

    @nn.compact
    def __call__(self, tgt, memory, mem_mask, pos, query_pos,
                 deterministic: bool = True):
        from mgsv_tpu.models.layers import _ProjParams
        from mgsv_tpu.ops.pallas.fused_decoder_layer import (
            fused_decoder_layer_train)

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

        params = {
            "multihead_attn": _Attn(name="multihead_attn")(),
            "norm2": _Norm(name="norm2")(),
            "norm3": _Norm(name="norm3")(),
            "linear1": dict(zip(("kernel", "bias"),
                                _ProjParams(self.ffn_dim, _XAVIER,
                                            name="linear1")(d))),
            "linear2": dict(zip(("kernel", "bias"),
                                _ProjParams(d, _XAVIER, name="linear2")(self.ffn_dim))),
        }
        if self.self_attn:
            params["self_attn"] = _Attn(name="self_attn")()
            params["norm1"] = _Norm(name="norm1")()
        return fused_decoder_layer_train(
            params, tgt.astype(jnp.float32), memory.astype(jnp.float32),
            mem_mask, pos.astype(jnp.float32), query_pos.astype(jnp.float32),
            self.heads, self.self_attn, self.block_b, None)


class DetrTransformer(nn.Module):
    """Encoder + intermediate-returning decoder — transformer.py:22-81.

    __call__(src [B, L, D], mask [B, L] 1=valid, pos [B, L, D],
             query_embed [Q, D], target [B, Q, D] | None)
      -> (hidden_states [num_dec_layers, B, Q, D], memory [B, L, D])
    """

    dim: int
    heads: int
    ffn_dim: int
    enc_layers: int
    dec_layers: int
    dropout: float = 0.1
    pre_norm: bool = False
    decoder_self_attn: bool = False
    dtype: Optional[jnp.dtype] = None
    # Recompute each layer in backward instead of saving its activations
    # (notably the [B, H, L, L] attention matrices).
    remat_layers: bool = False
    # Route encoder layers through the fused Pallas fwd+bwd kernels
    # (post-norm, dropout-free configs; ~4.8x per layer on v5e).
    fused_encoder: bool = False
    # Multi-device mesh for the fused encoder's shard_map/dropout-seed
    # handling (see FusedDetrEncoderLayer.mesh).
    mesh: Optional[object] = None

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        mask: jnp.ndarray,
        pos: jnp.ndarray,
        query_embed: jnp.ndarray,
        target: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        bs = src.shape[0]

        enc_cls = (nn.remat(DetrEncoderLayer, static_argnums=(4,))
                   if self.remat_layers else DetrEncoderLayer)
        use_fused_enc = self.fused_encoder and not self.pre_norm
        dec_cls = (nn.remat(DetrDecoderLayer, static_argnums=(6,))
                   if self.remat_layers else DetrDecoderLayer)

        memory = src
        for i in range(self.enc_layers):
            if use_fused_enc:
                memory = FusedDetrEncoderLayer(
                    self.dim, self.heads, self.ffn_dim, dropout=self.dropout,
                    precision=("bf16" if self.dtype == jnp.bfloat16
                               else "f32"),
                    mesh=self.mesh,
                    name=f"enc_{i}",
                )(memory, mask, pos, deterministic)
            else:
                memory = enc_cls(
                    self.dim, self.heads, self.ffn_dim, self.dropout,
                    pre_norm=self.pre_norm, dtype=self.dtype, name=f"enc_{i}",
                )(memory, mask, pos, deterministic)
        # No final encoder LN in the post-norm default (transformer.py:34).
        if self.pre_norm and self.enc_layers > 0:
            memory = nn.LayerNorm(epsilon=1e-5, name="encoder_norm")(memory)

        query_pos = jnp.broadcast_to(query_embed[None], (bs,) + query_embed.shape)
        tgt = jnp.zeros_like(query_pos) if target is None else target

        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        intermediate = []
        # NOTE: decoder layers stay on the XLA path even under fused_encoder
        # — the fused decoder kernel (FusedDetrDecoderLayer) is numerically
        # verified but measured slower end-to-end (106 vs 85 ms/step): its
        # per-row K/V projections underutilize the MXU vs XLA's batched
        # GEMMs at #queries=1. Kept available for larger-#Q configs.
        for i in range(self.dec_layers):
            tgt = dec_cls(
                self.dim, self.heads, self.ffn_dim, self.dropout,
                pre_norm=self.pre_norm, self_attn=self.decoder_self_attn,
                dtype=self.dtype, name=f"dec_{i}",
            )(tgt, memory, mask, pos, query_pos, deterministic)
            # return_intermediate: each layer's output through the shared
            # final norm (transformer.py:135-141).
            intermediate.append(decoder_norm(tgt))

        hidden_states = jnp.stack(intermediate, axis=0)     # [layers, B, Q, D]
        return hidden_states, memory
