"""X-Pool cross-attention: video-conditioned pooling of music snippets.

Re-derivation of Transformer_XA + MultiHeadedAttention_mask
(modules/transformer.py:73-180): single-head cross-attention where every
video embedding queries every music track's snippet sequence, producing one
pooled music embedding per (music, video) pair:

    q = q_proj(LN1(video))            [V, D]
    k, v = k/v_proj(LN1(music_segs))  [M, S, D]
    attn[m, v, s] = softmax_s(q[v] . k[m, s] / sqrt(D)), snippet mask -> -inf
    ctx[m, v] = out_proj(sum_s attn * v[m, s])
    out = LN3(LN2(ctx) + dropout(linear_proj(LN2(ctx))))   # NO residual
                                                           # around attention
                                                           # (transformer.py:173-174)

All projection weights are identity-initialized with zero bias
(Transformer_XA._init_parameters, transformer.py:148-154) — load-bearing
for training dynamics, preserved here.

The O(M*V*D) pooled tensor is fine at train batch sizes; corpus-scale
evaluation uses the blocked formulation in mgsv_tpu.eval.similarity
instead of the reference's fall-back-to-CPU (train-MaDe.py:588-591).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from mgsv_tpu.models.layers import BIG_NEG, l2_normalize


class XPoolAttention(nn.Module):
    """The pooled cross-attention core.  modules/transformer.py:73-123."""

    dim: int

    @nn.compact
    def __call__(
        self,
        video: jnp.ndarray,                   # [V, D]
        music_segs: jnp.ndarray,              # [M, S, D]
        seg_mask: Optional[jnp.ndarray],      # [M, S] 1 = valid, or None
    ) -> jnp.ndarray:
        ident = lambda name: nn.Dense(
            self.dim,
            kernel_init=_identity_init,
            bias_init=nn.initializers.zeros,
            name=name,
        )
        q = ident("q_proj")(video)            # [V, D]
        k = ident("k_proj")(music_segs)       # [M, S, D]
        v = ident("v_proj")(music_segs)       # [M, S, D]

        logits = jnp.einsum("vd,msd->mvs", q, k) / jnp.sqrt(jnp.float32(self.dim))
        if seg_mask is not None:
            logits = jnp.where(seg_mask[:, None, :] != 0, logits, BIG_NEG)
        attn = nn.softmax(logits, axis=-1)    # [M, V, S]
        ctx = jnp.einsum("mvs,msd->mvd", attn, v)
        return ident("out_proj")(ctx)         # [M, V, D]


def _identity_init(key, shape, dtype=jnp.float32):
    del key
    assert len(shape) == 2 and shape[0] == shape[1], shape
    return jnp.eye(shape[0], dtype=dtype)


class XPoolTransformer(nn.Module):
    """Transformer_XA wrapper.  modules/transformer.py:128-180."""

    dim: int
    dropout: float = 0.3

    @nn.compact
    def __call__(
        self,
        video: jnp.ndarray,                   # [V, D]
        music_segs: jnp.ndarray,              # [M, S, D]
        seg_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        ln1 = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")
        video = ln1(video)
        music_segs = ln1(music_segs)          # shared LN1, transformer.py:164-165

        attn_out = XPoolAttention(self.dim, name="cross_attn")(video, music_segs, seg_mask)
        attn_out = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(attn_out)

        linear_out = nn.Dense(
            self.dim, kernel_init=_identity_init, bias_init=nn.initializers.zeros,
            name="linear_proj",
        )(attn_out)
        linear_out = nn.Dropout(self.dropout)(linear_out, deterministic=deterministic)
        out = attn_out + linear_out
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm3")(out)   # [M, V, D]


class _DenseParams(nn.Module):
    """Declares Dense-shaped params without applying them (the fused kernel
    consumes the raw tensors)."""

    dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _identity_init, (self.dim, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return kernel, bias


class _LnParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _CrossAttnProj(nn.Module):
    """q/k/v projections applied in XLA + raw out_proj tensors, under the
    same "cross_attn" scope as XPoolAttention (checkpoint-compatible)."""

    dim: int

    @nn.compact
    def __call__(self, video_n, segs_n):
        ident = lambda name: nn.Dense(
            self.dim, kernel_init=_identity_init,
            bias_init=nn.initializers.zeros, name=name)
        q = ident("q_proj")(video_n)
        k = ident("k_proj")(segs_n)
        v = ident("v_proj")(segs_n)
        wout, bout = _DenseParams(self.dim, name="out_proj")()
        return q, k, v, wout, bout


class FusedXPoolSim(nn.Module):
    """Training-path drop-in for XPoolTransformer + sim_matrix_music_pooling
    backed by the custom-VJP fused kernel (ops/pallas/xpool_sim_vjp.py).

    Returns the [V, M] pooled cosine similarity directly; the [M, V, D]
    pooled tensor never exists in HBM in either direction.  The param tree
    is IDENTICAL to XPoolTransformer's, so checkpoints interchange and the
    optimizer grouping ("xpool_v2m" -> matching lr) is unchanged.
    """

    dim: int
    dropout: float = 0.3
    # block_v <= 0: pick min(512, padded V) — measured fastest at bs=512
    # (bwd core 8.5 -> 5.4 ms going 128 -> 512) without over-padding small
    # eval batches.
    block_v: int = 0
    block_m: int = 8
    # Multi-device: run the kernel per-device under shard_map — video axis
    # sharded over dp, music/k/v/weights replicated (all-pairs needs the
    # full music set on every device).  Gradients flow through the
    # custom_vjp inside shard_map with replicated-input cotangents psum'd
    # by the transpose (verified exact vs single-device on a CPU mesh).
    mesh: Optional[object] = None

    @nn.compact
    def __call__(
        self,
        video: jnp.ndarray,                   # [V, D]
        music_segs: jnp.ndarray,              # [M, S, D]
        seg_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        import jax
        import numpy as np

        from mgsv_tpu.ops.pallas.xpool_sim_vjp import _xpool_core

        ln1 = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")
        video_n = ln1(video)
        segs_n = ln1(music_segs)
        q, k, v, wout, bout = _CrossAttnProj(
            self.dim, name="cross_attn")(video_n, segs_n)
        g2, b2 = _LnParams(self.dim, name="layer_norm2")()
        wlin, blin = _DenseParams(self.dim, name="linear_proj")()
        g3, b3 = _LnParams(self.dim, name="layer_norm3")()

        vhat = l2_normalize(video)
        mask = (seg_mask.astype(jnp.float32) if seg_mask is not None
                else jnp.ones(music_segs.shape[:2], jnp.float32))
        rate = 0.0 if deterministic else self.dropout
        if rate > 0.0:
            seed = jax.random.randint(
                self.make_rng("dropout"), (1,), 0,
                np.iinfo(np.int32).max, jnp.int32)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        def pick_bv(n_rows):
            if self.block_v > 0:
                return self.block_v
            return min(512, -(-n_rows // 128) * 128)

        if self.mesh is not None and self.mesh.devices.size > 1:
            from jax.sharding import PartitionSpec as P

            from mgsv_tpu.core.mesh import DATA_AXIS, fold_axis_into_seed

            dp = self.mesh.shape[DATA_AXIS]
            assert video.shape[0] % dp == 0, (video.shape, dp)
            block_m = self.block_m
            rate_ = rate

            def local_core(q_, k_, v_, m_, vh_, *wargs):
                *ws, seed_ = wargs
                # Without the fold, row v on device 0 and row v + V/dp on
                # device 1 would draw bit-identical keep masks every step.
                seed_ = fold_axis_into_seed(seed_)
                return _xpool_core(q_, k_, v_, m_, vh_, *ws, seed_, rate_,
                                   pick_bv(q_.shape[0]), block_m, None)

            sim_mv = jax.shard_map(
                local_core, mesh=self.mesh,
                in_specs=(P(DATA_AXIS), P(), P(), P(), P(DATA_AXIS),
                          *([P()] * 8), P()),
                out_specs=P(None, DATA_AXIS),
                check_vma=False,
            )(q, k, v, mask, vhat, wout, bout, g2, b2, wlin, blin, g3, b3,
              seed)
        else:
            sim_mv = _xpool_core(q, k, v, mask, vhat, wout, bout, g2, b2,
                                 wlin, blin, g3, b3, seed, rate,
                                 pick_bv(video.shape[0]), self.block_m, None)
        return sim_mv.T                        # [V, M]


def sim_matrix_music_pooling(video: jnp.ndarray, pooled: jnp.ndarray) -> jnp.ndarray:
    """Pooled similarity (modules/metrics.py:10-24).

    video: [V, D]; pooled: [M, V, D] -> sims [V, M]:
    sims[v, m] = <video_hat[v], pooled_hat[m, v]>.
    """
    video = l2_normalize(video)
    pooled = l2_normalize(pooled)
    return jnp.einsum("vd,mvd->vm", video, pooled)


def sim_matrix_video_pooling(video_pooled: jnp.ndarray, music: jnp.ndarray) -> jnp.ndarray:
    """modules/metrics.py:26-41.  video_pooled: [V, M, D]; music: [M, D] -> [V, M]."""
    video_pooled = l2_normalize(video_pooled)
    music = l2_normalize(music)
    return jnp.einsum("md,vmd->vm", music, video_pooled)


def sim_matrix_both_pooling(video_pooled: jnp.ndarray, music_pooled: jnp.ndarray) -> jnp.ndarray:
    """modules/metrics.py:43-57.  video_pooled: [V, M, D]; music_pooled: [M, V, D] -> [V, M].

    sims[v, m] = mean_k <video_pooled_hat[v, k], music_pooled_hat[m, k... ]>
    following the reference's bmm over the middle axis then mean.
    """
    video_pooled = l2_normalize(video_pooled)
    music_pooled = l2_normalize(music_pooled)
    # reference: bmm([V, M, D], permute(music_pooled, 'm v d -> v d m')) -> [V, M, M], mean over axis 1
    sims = jnp.einsum("vkd,mvd->vkm", video_pooled, music_pooled)
    return sims.mean(axis=1)
