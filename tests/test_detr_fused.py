"""Fused functional DETR forward vs DetrTransformer.apply (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from mgsv_tpu.models.detr import DetrTransformer
from mgsv_tpu.ops.pallas.detr_fused import detr_forward_fused
import pytest

pytestmark = pytest.mark.kernel


def test_fused_detr_matches_module():
    b, L, d, heads, q = 6, 18, 32, 4, 1
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.3)
    pos = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.3)
    mask = np.ones((b, L), np.float32)
    mask[0, 9:] = 0
    mask = jnp.asarray(mask)
    query = jnp.asarray(rng.randn(q, d).astype(np.float32))
    target = jnp.asarray(rng.randn(b, q, d).astype(np.float32))

    detr = DetrTransformer(d, heads, d * 2, enc_layers=2, dec_layers=3,
                           dropout=0.1, decoder_self_attn=True)
    params = detr.init(jax.random.PRNGKey(0), src, mask, pos, query, target,
                       deterministic=True)
    hid_ref, mem_ref = detr.apply(params, src, mask, pos, query, target,
                                  deterministic=True)

    hid, mem = detr_forward_fused(
        params, src, mask, pos, query, target,
        heads=heads, ffn_dim=d * 2, enc_layers=2, dec_layers=3,
        decoder_self_attn=True, block_b=3, interpret=True)
    np.testing.assert_allclose(np.asarray(mem), np.asarray(mem_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(hid), np.asarray(hid_ref), atol=3e-5)
