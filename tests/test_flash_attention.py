"""Flash attention kernel vs XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mgsv_tpu.models.vit_common import default_attention
from mgsv_tpu.ops.pallas.flash_attention import flash_attention


@pytest.mark.parametrize("shape,block", [
    ((2, 2, 128, 32), (64, 64)),       # aligned
    ((1, 3, 100, 16), (64, 32)),       # unaligned seq -> padding path
    ((2, 1, 300, 64), (128, 128)),     # AST-like
])
def test_flash_matches_xla(shape, block):
    rng = np.random.RandomState(0)
    b, h, l, d = shape
    q = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
    scale = 1.0 / np.sqrt(d)

    ref = default_attention(q, k, v, scale)
    out = flash_attention(q, k, v, scale, None, block_q=block[0],
                          block_k=block[1], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_with_key_mask():
    rng = np.random.RandomState(1)
    b, h, l, d = 2, 2, 96, 32
    q = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
    mask = np.ones((b, l), np.float32)
    mask[0, 60:] = 0
    mask[1, 10:] = 0
    scale = 1.0 / np.sqrt(d)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    logits = jnp.where(jnp.asarray(mask)[:, None, None, :] != 0, logits, -1e30)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax_softmax(logits), v)

    out = flash_attention(q, k, v, scale, jnp.asarray(mask),
                          block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def jax_softmax(x):
    import jax.nn
    return jax.nn.softmax(x, axis=-1)


import jax  # noqa: E402  (used by jax_softmax)

pytestmark = pytest.mark.kernel
