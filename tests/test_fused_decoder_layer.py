"""Fused decoder layer: forward + gradients vs DetrDecoderLayer (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgsv_tpu.models.detr import DetrDecoderLayer
from mgsv_tpu.ops.pallas.fused_decoder_layer import fused_decoder_layer_train

pytestmark = pytest.mark.kernel


@pytest.mark.slow
@pytest.mark.parametrize("self_attn,q", [(True, 1), (True, 3), (False, 1)])
def test_fused_decoder_matches_xla(self_attn, q):
    b, L, d, heads = 5, 14, 32, 4
    rng = np.random.RandomState(0)
    tgt = jnp.asarray(rng.randn(b, q, d).astype(np.float32) * 0.4)
    mem = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.4)
    pos = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.4)
    qpos = jnp.asarray(rng.randn(b, q, d).astype(np.float32) * 0.4)
    mask = np.ones((b, L), np.float32)
    mask[0, 7:] = 0
    mask = jnp.asarray(mask)
    cot = jnp.asarray(rng.randn(b, q, d).astype(np.float32))

    lay = DetrDecoderLayer(d, heads, d * 4, dropout=0.1, self_attn=self_attn)
    params = lay.init(jax.random.PRNGKey(0), tgt, mem, mask, pos, qpos)

    def loss_ref(p, t, m_, pos_, qp):
        out = lay.apply(p, t, m_, mask, pos_, qp, deterministic=True)
        return jnp.sum(out * cot)

    def loss_fused(p, t, m_, pos_, qp):
        out = fused_decoder_layer_train(p, t, m_, mask, pos_, qp,
                                        heads, self_attn, 2, True)
        return jnp.sum(out * cot)

    rv, rg = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        params, tgt, mem, pos, qpos)
    fv, fg = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        params, tgt, mem, pos, qpos)

    np.testing.assert_allclose(float(fv), float(rv), rtol=2e-5)
    flat_r = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(rg[0])[0]}
    flat_f = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(fg[0])[0]}
    assert flat_r.keys() == flat_f.keys()
    for key in flat_r:
        np.testing.assert_allclose(np.asarray(flat_f[key]),
                                   np.asarray(flat_r[key]),
                                   atol=3e-4, rtol=3e-4, err_msg=key)
    for i, name in [(1, "dtgt"), (2, "dmem"), (3, "dpos"), (4, "dqpos")]:
        np.testing.assert_allclose(np.asarray(fg[i]), np.asarray(rg[i]),
                                   atol=3e-4, err_msg=name)
