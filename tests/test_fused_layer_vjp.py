"""Custom-VJP fused encoder layer: gradients vs jax.grad of the XLA layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgsv_tpu.models.detr import DetrEncoderLayer
from mgsv_tpu.ops.pallas.fused_encoder_layer_vjp import fused_encoder_layer_train

pytestmark = pytest.mark.kernel


@pytest.mark.parametrize("b,L,d,heads,block_b", [
    (5, 14, 32, 4, 4),    # unaligned batch (padding in both kernels)
    (8, 20, 64, 8, 4),
])
@pytest.mark.slow
def test_vjp_matches_xla_grads(b, L, d, heads, block_b):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.4)
    pos = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.4)
    mask = np.ones((b, L), np.float32)
    mask[0, L // 2:] = 0
    mask[2, 3:] = 0
    mask = jnp.asarray(mask)
    cot = jnp.asarray(rng.randn(b, L, d).astype(np.float32))

    lay = DetrEncoderLayer(d, heads, d * 4, dropout=0.1)
    params = lay.init(jax.random.PRNGKey(0), x, mask, pos)

    def loss_ref(p, x_, pos_):
        out = lay.apply(p, x_, mask, pos_, deterministic=True)
        return jnp.sum(out * cot)

    def loss_fused(p, x_, pos_):
        out = fused_encoder_layer_train(
            p, x_, mask, pos_, jnp.zeros((1,), jnp.int32),
            heads, block_b, True, 0.0)
        return jnp.sum(out * cot)

    ref_val, ref_grads = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        params, x, pos)
    got_val, got_grads = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(
        params, x, pos)

    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=2e-5)

    # params grads
    flat_ref = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(ref_grads[0])[0]}
    flat_got = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(got_grads[0])[0]}
    assert flat_ref.keys() == flat_got.keys()
    for key in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_got[key]), np.asarray(flat_ref[key]),
            atol=2e-4, rtol=2e-4, err_msg=key)

    # input grads
    np.testing.assert_allclose(np.asarray(got_grads[1]),
                               np.asarray(ref_grads[1]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_grads[2]),
                               np.asarray(ref_grads[2]), atol=2e-4)
