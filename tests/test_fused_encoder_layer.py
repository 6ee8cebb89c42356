"""Fused encoder-layer kernel vs DetrEncoderLayer (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgsv_tpu.models.detr import DetrEncoderLayer
from mgsv_tpu.ops.pallas.fused_encoder_layer import fused_encoder_layer

pytestmark = pytest.mark.kernel


@pytest.mark.parametrize("b,L,d,heads,block_b", [
    (6, 16, 32, 4, 4),     # unaligned batch -> padding path
    (8, 24, 64, 8, 8),
])
def test_fused_matches_reference_layer(b, L, d, heads, block_b):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, L, d).astype(np.float32))
    pos = jnp.asarray(rng.randn(b, L, d).astype(np.float32))
    mask = np.ones((b, L), np.float32)
    mask[0, L // 2:] = 0
    mask[1, 3:] = 0
    mask = jnp.asarray(mask)

    lay = DetrEncoderLayer(d, heads, d * 4, dropout=0.1)
    params = lay.init(jax.random.PRNGKey(0), x, mask, pos)
    ref = lay.apply(params, x, mask, pos, deterministic=True)

    # kernel expects ffn dims from params (linear1: d -> 4d)
    out = fused_encoder_layer(x, mask, pos, params, heads=heads,
                              block_b=block_b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
