"""EmbeddingNet: the MLP+BatchNorm alternative aggregator (agg_module="mlp").

Re-derivation of model_Base.py:216-249:
    Linear(d -> 1024) -> BatchNorm1d(channel=seq_len) -> ReLU ->
    Linear(1024 -> d) -> BatchNorm1d(channel, momentum=0.99) -> ReLU ->
    Linear(d -> d)
where BatchNorm1d(num_features=seq_len) normalizes each *sequence position*
over (batch, feature) — the reference applies torch BN1d to [bs, seq, dim].

Divergence (documented): batch statistics are used in both train and eval
(use_running_average is never flipped), i.e. running BN stats are not
maintained.  The shipped configuration never uses this aggregator
(agg_module="transf" in scripts/train_kuai_all_feature.sh); full
batch_stats plumbing is deferred until a config actually trains with it.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_XAVIER = nn.initializers.xavier_normal()
_BIAS = nn.initializers.constant(0.01)


def _position_batchnorm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """BatchNorm1d(num_features=seq_len) on [B, L, D]: normalize each
    position l over (batch, feature) — torch semantics for a 3-D input."""
    mean = x.mean(axis=(0, 2), keepdims=True)
    var = x.var(axis=(0, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class EmbeddingNet(nn.Module):
    dim: int
    hidden: int = 1024
    seq_len: int = 0  # informational; BN is position-wise regardless

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, L, D] -> [B, L, D]."""
        scale1 = self.param("bn1_scale", nn.initializers.ones, (x.shape[1], 1))
        bias1 = self.param("bn1_bias", nn.initializers.zeros, (x.shape[1], 1))
        scale2 = self.param("bn2_scale", nn.initializers.ones, (x.shape[1], 1))
        bias2 = self.param("bn2_bias", nn.initializers.zeros, (x.shape[1], 1))

        h = nn.Dense(self.hidden, kernel_init=_XAVIER, bias_init=_BIAS,
                     name="fc1")(x)
        h = _position_batchnorm(h) * scale1[None] + bias1[None]
        h = nn.relu(h)
        h = nn.Dense(self.dim, kernel_init=_XAVIER, bias_init=_BIAS,
                     name="fc2")(h)
        h = _position_batchnorm(h) * scale2[None] + bias2[None]
        h = nn.relu(h)
        return nn.Dense(self.dim, kernel_init=_XAVIER, bias_init=_BIAS,
                        name="fc3")(h)
