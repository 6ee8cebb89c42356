"""EmbeddingNet: the MLP+BatchNorm alternative aggregator (agg_module="mlp").

Re-derivation of model_Base.py:216-249:
    Linear(d -> 1024) -> BatchNorm1d(channel=seq_len) -> ReLU ->
    Linear(1024 -> d) -> BatchNorm1d(channel, momentum=0.99) -> ReLU ->
    Linear(d -> d)
where BatchNorm1d(num_features=seq_len) normalizes each *sequence position*
over (batch, feature) — the reference applies torch BN1d to [bs, seq, dim].

Running averages follow torch semantics exactly: training normalizes with
the biased batch variance while the running buffers accumulate the unbiased
variance as `running = (1 - momentum) * running + momentum * batch`; eval
normalizes with the running buffers.  BN1 uses torch's default momentum
(0.1), BN2 the reference's explicit momentum=0.99 (model_Base.py:228).
The buffers live in the flax "batch_stats" collection — the train step
threads them through `mutable=["batch_stats"]` and they ride along in
checkpoints (routed to the zero-update optimizer label, never touched by
Adam).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_XAVIER = nn.initializers.xavier_normal()
_BIAS = nn.initializers.constant(0.01)


class EmbeddingNet(nn.Module):
    dim: int
    hidden: int = 1024
    eps: float = 1e-5
    momentum1: float = 0.1   # torch BatchNorm1d default (model_Base.py:224)
    momentum2: float = 0.99  # explicit in the reference (model_Base.py:228)

    def _bn(self, x: jnp.ndarray, name: str, momentum: float,
            deterministic: bool) -> jnp.ndarray:
        """Position-wise BatchNorm1d on [B, L, D] with running buffers."""
        seq = x.shape[1]
        scale = self.param(f"{name}_scale", nn.initializers.ones, (seq, 1))
        bias = self.param(f"{name}_bias", nn.initializers.zeros, (seq, 1))
        ra_mean = self.variable("batch_stats", f"{name}_mean",
                                lambda: jnp.zeros((seq, 1), jnp.float32))
        ra_var = self.variable("batch_stats", f"{name}_var",
                               lambda: jnp.ones((seq, 1), jnp.float32))
        if deterministic:
            mean, var = ra_mean.value[None], ra_var.value[None]
        else:
            mean = x.mean(axis=(0, 2), keepdims=True)      # [1, L, 1]
            var = x.var(axis=(0, 2), keepdims=True)        # biased, for norm
            if not self.is_initializing():
                n = x.shape[0] * x.shape[2]
                unbiased = var[0] * (n / max(n - 1, 1))
                ra_mean.value = ((1 - momentum) * ra_mean.value
                                 + momentum * mean[0])
                ra_var.value = ((1 - momentum) * ra_var.value
                                + momentum * unbiased)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        return y * scale[None] + bias[None]

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: [B, L, D] -> [B, L, D]."""
        h = nn.Dense(self.hidden, kernel_init=_XAVIER, bias_init=_BIAS,
                     name="fc1")(x)
        h = self._bn(h, "bn1", self.momentum1, deterministic)
        h = nn.relu(h)
        h = nn.Dense(self.dim, kernel_init=_XAVIER, bias_init=_BIAS,
                     name="fc2")(h)
        h = self._bn(h, "bn2", self.momentum2, deterministic)
        h = nn.relu(h)
        return nn.Dense(self.dim, kernel_init=_XAVIER, bias_init=_BIAS,
                        name="fc3")(h)
