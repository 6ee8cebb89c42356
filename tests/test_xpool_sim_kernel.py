"""Fused X-Pool similarity kernel vs the XPoolTransformer reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgsv_tpu.models.xpool import XPoolTransformer, sim_matrix_music_pooling
from mgsv_tpu.ops.pallas.xpool_sim import xpool_sim_fused

pytestmark = [pytest.mark.slow, pytest.mark.kernel]


@pytest.mark.parametrize("vcount,m,s,d,bv,bm", [
    (16, 12, 8, 32, 8, 4),        # unaligned m -> padding path
    (8, 8, 6, 16, 8, 8),
])
def test_fused_matches_reference(vcount, m, s, d, bv, bm):
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(vcount, d).astype(np.float32))
    segs = jnp.asarray(rng.randn(m, s, d).astype(np.float32))
    mask = np.ones((m, s), np.float32)
    mask[0, s // 2:] = 0
    mask[1, 1:] = 0
    mask = jnp.asarray(mask)

    xpool = XPoolTransformer(d)
    params = xpool.init(jax.random.PRNGKey(0), video, segs, mask)
    # identity inits make a weak test; randomize the weights
    params = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(1), x.shape),
        params)

    pooled = xpool.apply(params, video, segs, mask, deterministic=True)
    ref = sim_matrix_music_pooling(video, pooled)

    out = xpool_sim_fused(video, segs, mask, params, block_v=bv, block_m=bm,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_no_mask():
    rng = np.random.RandomState(2)
    video = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    segs = jnp.asarray(rng.randn(6, 4, 16).astype(np.float32))
    xpool = XPoolTransformer(16)
    params = xpool.init(jax.random.PRNGKey(0), video, segs, None)
    pooled = xpool.apply(params, video, segs, None, deterministic=True)
    ref = sim_matrix_music_pooling(video, pooled)
    out = xpool_sim_fused(video, segs, None, params, block_v=8, block_m=2,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_sharded_matches_single_device():
    """xpool_sim_fused_sharded: music axis sharded over the 8-dev CPU mesh,
    fused kernel per device — must equal the single-device fused result."""
    from mgsv_tpu.core.mesh import make_mesh
    from mgsv_tpu.eval.similarity import xpool_sim_fused_sharded

    rng = np.random.RandomState(3)
    video = jnp.asarray(rng.randn(12, 16).astype(np.float32))
    segs = jnp.asarray(rng.randn(16, 4, 16).astype(np.float32))
    mask = jnp.asarray((rng.rand(16, 4) < 0.8).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)
    xpool = XPoolTransformer(16)
    params = xpool.init(jax.random.PRNGKey(0), video, segs, mask)

    single = xpool_sim_fused(video, segs, mask, params, block_v=8, block_m=2,
                             interpret=True)
    mesh = make_mesh((8, 1))
    sharded = xpool_sim_fused_sharded(video, segs, mask, params, mesh,
                                      block_v=8, block_m=2)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-6)
