"""Corpus-scale similarity computation, on-device and blocked/sharded.

The reference computes the eval-time X-Pool pooled similarity by moving the
pooling module to CPU and materializing the full [N_music, N_video, dim]
tensor (train-MaDe.py:588-591) — 4 GB at N=2000 and quadratic beyond.  Here
the same math runs on TPU in music-blocks: each block produces its [N_video,
block] similarity slice directly, so peak memory is O(block * N_video * dim)
and the full pooled tensor never exists.

Two drivers:
  * `xpool_similarity_blocked` — single-device, jit-compiled per-block scan;
  * `xpool_similarity_sharded` — multi-device `shard_map` over the music
    axis of a mesh; each device scans its shard, results gathered on the
    batch axis (the pod-scale retrieval path, BASELINE.json config 5).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mgsv_tpu.models.xpool import sim_matrix_music_pooling


def _block_sim(apply_fn: Callable, params, video_embs, seg_block, mask_block):
    """Pooled similarity of one music block vs all videos -> [V, block]."""
    pooled = apply_fn(params, video_embs, seg_block, mask_block,
                      deterministic=True)              # [block, V, D]
    return sim_matrix_music_pooling(video_embs, pooled)  # [V, block]


@functools.lru_cache(maxsize=8)
def _scan_blocks_program(apply_fn: Callable, masked: bool):
    """jit cache is keyed on function identity: defining the jitted scan
    inline in xpool_similarity_blocked would re-trace + re-compile the
    corpus-similarity program on EVERY eval epoch (tens of seconds over
    the remote tunnel) — same fix as evaluator._scan_program."""

    @jax.jit
    def scan_blocks(params, video_embs, seg_blocks, mask_blocks):
        def body(carry, blk):
            seg_b, mask_b = blk
            sims = _block_sim(apply_fn, params, video_embs, seg_b,
                              mask_b if masked else None)
            return carry, sims
        _, sims = jax.lax.scan(body, None, (seg_blocks, mask_blocks))
        # sims: [num_blocks, V, block] -> [V, num_blocks * block]
        return jnp.moveaxis(sims, 0, 1).reshape(video_embs.shape[0], -1)

    return scan_blocks


def xpool_similarity_blocked(
    apply_fn: Callable,
    params,
    video_embs: jnp.ndarray,     # [V, D]
    seg_tokens: jnp.ndarray,     # [M, S, D]
    seg_mask: Optional[jnp.ndarray],  # [M, S] or None
    block_size: int = 256,
) -> jnp.ndarray:
    """[V, M] pooled similarity without materializing [M, V, D].

    M is padded up to a block multiple internally; callers get exactly
    [V, M] back.
    """
    v, _ = video_embs.shape
    m, s, d = seg_tokens.shape
    pad = (-m) % block_size
    if pad:
        seg_tokens = jnp.concatenate(
            [seg_tokens, jnp.zeros((pad, s, d), seg_tokens.dtype)], axis=0)
        if seg_mask is not None:
            # Padded tracks get a single "valid" snippet so softmax stays
            # finite; their sims are sliced away below.
            pad_mask = jnp.zeros((pad, s), seg_mask.dtype).at[:, 0].set(1)
            seg_mask = jnp.concatenate([seg_mask, pad_mask], axis=0)
    num_blocks = seg_tokens.shape[0] // block_size

    seg_blocks = seg_tokens.reshape(num_blocks, block_size, s, d)
    if seg_mask is not None:
        mask_blocks = seg_mask.reshape(num_blocks, block_size, s)
    else:
        mask_blocks = jnp.ones((num_blocks, block_size, s), seg_tokens.dtype)

    scan_blocks = _scan_blocks_program(apply_fn, seg_mask is not None)
    full = scan_blocks(params, video_embs, seg_blocks, mask_blocks)
    return full[:, :m]


def xpool_similarity_sharded(
    apply_fn: Callable,
    params,
    video_embs: jnp.ndarray,
    seg_tokens: jnp.ndarray,
    seg_mask: jnp.ndarray,
    mesh: Mesh,
    axis: str = "dp",
    block_size: int = 256,
) -> jnp.ndarray:
    """Pooled similarity with the music axis sharded over `axis` of `mesh`.

    Each device runs the blocked scan over its music shard against the
    replicated video embeddings; the [V, M] result comes back sharded on
    its last axis (ICI all-gather happens only if the caller requests a
    replicated layout).  M must divide evenly by the axis size.
    """
    n_dev = mesh.shape[axis]
    m = seg_tokens.shape[0]
    assert m % n_dev == 0, f"music count {m} not divisible by mesh axis {n_dev}"

    shard_map = jax.shard_map

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    def sharded(params, video_embs, seg_shard, mask_shard):
        return xpool_similarity_blocked(
            apply_fn, params, video_embs, seg_shard, mask_shard,
            block_size=min(block_size, seg_shard.shape[0]))

    video_embs = jax.device_put(video_embs, NamedSharding(mesh, P()))
    return sharded(params, video_embs, seg_tokens, seg_mask)


def xpool_similarity_sharded_2d(
    apply_fn: Callable,
    params,
    video_embs: jnp.ndarray,     # [V, D]
    seg_tokens: jnp.ndarray,     # [M, S, D]
    seg_mask: jnp.ndarray,       # [M, S]
    mesh: Mesh,
    video_axis: str = "dp",
    music_axis: str = "mp",
    block_size: int = 256,
) -> jnp.ndarray:
    """Pooled similarity 2D-blocked over the full (dp, mp) mesh: the VIDEO
    axis shards over dp and the MUSIC/catalog axis over mp, so both mesh
    axes carry real work during train-time eval (VERDICT r3 task 5 — mp's
    job; the serving index is its other tenant, serve/engine.py mesh_axis).

    Each device computes its [V/dp, M/mp] block independently — the pooled
    attention and the similarity are per-(video, track) pairs, so no
    collectives are needed and the result is bit-identical to the 1D and
    single-device paths (pinned in tests/test_train_integration.py).
    V must divide dp and M must divide mp.
    """
    dp, mp = mesh.shape[video_axis], mesh.shape[music_axis]
    v, m = video_embs.shape[0], seg_tokens.shape[0]
    assert v % dp == 0, f"video count {v} not divisible by {video_axis}={dp}"
    assert m % mp == 0, f"music count {m} not divisible by {music_axis}={mp}"

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(video_axis), P(music_axis), P(music_axis)),
        out_specs=P(video_axis, music_axis),
        check_vma=False,
    )
    def sharded(params, video_shard, seg_shard, mask_shard):
        return xpool_similarity_blocked(
            apply_fn, params, video_shard, seg_shard, mask_shard,
            block_size=min(block_size, seg_shard.shape[0]))

    return sharded(params, video_embs, seg_tokens, seg_mask)


def xpool_similarity_mesh(
    apply_fn: Callable,
    params,
    video_embs: jnp.ndarray,     # [V, D]
    seg_tokens: jnp.ndarray,     # [M, S, D]
    seg_mask: jnp.ndarray,       # [M, S]
    mesh: Mesh,
    block_size: int = 256,
) -> jnp.ndarray:
    """Mesh-aware corpus similarity dispatch with internal padding.

    Routes to the 2D (dp x mp) sharding when the mesh has a real mp axis —
    both mesh axes carry work during train-time eval — and to the 1D
    music-sharded path on a dp-only mesh.  Pads V up to a dp multiple and
    M up to a (dp*|*mp) multiple so arbitrary corpus sizes work, then
    slices back to exactly [V, M]; padded video rows use ones (a zero
    video embedding would 0/0-NaN its own similarity row — harmless but
    ugly) and padded tracks get the same single-valid-snippet mask as
    xpool_similarity_blocked.
    """
    from mgsv_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    dp = axes.get(DATA_AXIS, 1)
    mp = axes.get(MODEL_AXIS, 1)
    v, m = video_embs.shape[0], seg_tokens.shape[0]
    m_div = mp if mp > 1 else dp

    pad_m = (-m) % m_div
    if pad_m:
        s, d = seg_tokens.shape[1:]
        seg_tokens = jnp.concatenate(
            [seg_tokens, jnp.zeros((pad_m, s, d), seg_tokens.dtype)], axis=0)
        pad_mask = jnp.zeros((pad_m, s), seg_mask.dtype).at[:, 0].set(1)
        seg_mask = jnp.concatenate([seg_mask, pad_mask], axis=0)

    if mp > 1:
        pad_v = (-v) % dp
        if pad_v:
            video_embs = jnp.concatenate(
                [video_embs,
                 jnp.ones((pad_v, video_embs.shape[1]), video_embs.dtype)],
                axis=0)
        sim = xpool_similarity_sharded_2d(
            apply_fn, params, video_embs, seg_tokens, seg_mask, mesh,
            video_axis=DATA_AXIS, music_axis=MODEL_AXIS,
            block_size=block_size)
        return sim[:v, :m]

    sim = xpool_similarity_sharded(
        apply_fn, params, video_embs, seg_tokens, seg_mask, mesh,
        axis=DATA_AXIS,
        block_size=min(block_size, seg_tokens.shape[0] // dp))
    return sim[:, :m]


def xpool_sim_fused_sharded(
    video_embs: jnp.ndarray,     # [V, D]
    seg_tokens: jnp.ndarray,     # [M, S, D]
    seg_mask: Optional[jnp.ndarray],
    xpool_params,
    mesh: Mesh,
    axis: str = "dp",
    block_v: int = 128,
    block_m: int = 8,
) -> jnp.ndarray:
    """Fused-Pallas corpus similarity with the music axis sharded over
    `mesh` — each device runs the fused kernel (ops/pallas/xpool_sim.py,
    1.6x over the XLA blocked path on v5e) on its music shard against
    replicated video embeddings.  Eval-only (forward), like the kernel."""
    from mgsv_tpu.ops.pallas.xpool_sim import xpool_sim_fused

    n_dev = mesh.shape[axis]
    m = seg_tokens.shape[0]
    assert m % n_dev == 0, f"music count {m} not divisible by mesh axis {n_dev}"
    if seg_mask is None:
        seg_mask = jnp.ones(seg_tokens.shape[:2], jnp.float32)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    def sharded(params, video, seg_shard, mask_shard):
        return xpool_sim_fused(video, seg_shard, mask_shard, params,
                               block_v=block_v, block_m=block_m)

    video = jax.device_put(video_embs, NamedSharding(mesh, P()))
    return sharded(xpool_params, video, seg_tokens, seg_mask)


def dual_similarity(video_embs: jnp.ndarray, music_embs: jnp.ndarray) -> jnp.ndarray:
    """Global-embedding cosine similarity [V, M] (calc_similarity,
    utils/util_test.py:10-29 — embeddings are already L2-normalized)."""
    from mgsv_tpu.ops.losses import cosine_sim_matrix

    return cosine_sim_matrix(video_embs, music_embs)
