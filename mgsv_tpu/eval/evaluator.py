"""Full evaluation epoch: forward every batch, corpus similarity, metrics.

Re-derivation of eval_epoch (train-MaDe.py:439-637 = test-MaDe.py:243-447 —
the reference duplicates it; here there is exactly one implementation used
by both the train loop and the eval CLI).  Differences by design:

  * the corpus X-Pool pooled similarity runs blocked on-device
    (eval/similarity.py) instead of moving the module to CPU and
    materializing [N, N, D] (train-MaDe.py:588-591);
  * per-sample IoUs are computed inside the jitted eval step, not in a
    python loop over tensors (train-MaDe.py:501-526);
  * final partial batches are padded to static shapes and excluded from
    metrics via a validity mask.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import functools

from mgsv_tpu.config import Config
from mgsv_tpu.data.dataset import MgsvDataset
from mgsv_tpu.eval import metrics as M
from mgsv_tpu.eval.similarity import dual_similarity, xpool_similarity_blocked
from mgsv_tpu.models.made import MaDe
from mgsv_tpu.models.xpool import XPoolTransformer
from mgsv_tpu.train.step import make_eval_step


@functools.lru_cache(maxsize=8)
def _scan_program(eval_step, gather_fn):
    """One jitted lax.scan over all eval batches of a device-resident
    dataset: a full epoch forward becomes a SINGLE dispatch (the per-batch
    host loop costs one link round-trip per batch — ~2 s each over the
    remote tunnel vs 136 ms of device compute at the paper shape).
    `gather_fn` is the dataset's batch-assembly program — the plain fancy
    gather on one device, or the shard_map psum_scatter gather when the
    resident tables are dp-sharded (data/device_data.py)."""

    @jax.jit
    def run(params, tree, idx_chunks):
        def body(_, idx):
            out = eval_step(params, gather_fn(tree, idx))
            return None, (out["video_emb"], out["music_emb"],
                          out["seg_tokens"], out["segment_mask"],
                          out["iou"], out["pred_spans_sec"], out["loss"])
        return jax.lax.scan(body, None, idx_chunks)[1]

    return run


def evaluate(
    model: MaDe,
    params,
    dataset: MgsvDataset,
    cfg: Config,
    batch_size: Optional[int] = None,
    eval_step=None,
    sim_block_size: int = 256,
    mesh=None,
    use_fused_sim: bool = False,
) -> Dict[str, Any]:
    """Returns {"loss", "retrieval", "localization", "composite", "results"}.

    With a multi-device `mesh`, the per-batch forward runs as one SPMD
    program sharded over the dp axis (the reference's DistributedSampler
    role, dataloaders/data_dataloaders.py:28-44: each device computes its
    batch shard, XLA gathers outputs) and the corpus similarity is also
    mesh-sharded.  Single-device behavior is unchanged.
    """
    batch_size = batch_size or cfg.train.batch_size_val
    eval_step = eval_step or make_eval_step(model, cfg)

    # Multi-process (jax.distributed): batches are fed per process through
    # the shared shipper, per-row outputs come back as non-addressable
    # global arrays and are gathered to identical host copies on every
    # process (process_allgather), and the corpus similarity then runs
    # host-fed per process — every process computes identical metrics.
    multiproc = jax.process_count() > 1
    from mgsv_tpu.core.dist import to_host  # allgather under multi-process

    shard = None
    if mesh is not None and mesh.devices.size > 1:
        from mgsv_tpu.core import mesh as mesh_lib

        dp = mesh.shape[mesh_lib.DATA_AXIS]
        # static shapes: every batch (incl. the padded final one) must split
        # evenly over dp
        batch_size = -(-batch_size // dp) * dp
        params = mesh_lib.replicate(mesh, params)
        sharding = mesh_lib.batch_sharding(mesh)
        shard = sharding  # sentinel: multi-device loop path below
    elif multiproc:
        raise ValueError("multi-process evaluation needs the global mesh")

    video_embs, music_embs = [], []
    seg_tokens, seg_masks = [], []
    ious, pred_spans, losses = [], [], []
    video_ids, music_ids = [], []
    n_valid = 0

    # Single-device path: the big per-batch tensors (seg_tokens is
    # [bs, S, D] — ~50 MB/batch at the paper shape) STAY ON DEVICE until
    # the one corpus-similarity computation; only scalars and [bs]-sized
    # results cross the (possibly remote) host link per batch.  Padding
    # rows exist only at the tail of the final batch, so device-side
    # concatenation + one prefix slice recovers exactly the valid rows.
    on_device = shard is None
    resident = hasattr(dataset, "tree") and (
        shard is None or getattr(dataset, "mesh", None) is not None)
    if resident:
        # Device-resident dataset: the whole epoch forward is ONE lax.scan
        # dispatch (same per-batch programs, same tail padding — repeat the
        # last row — so outputs are bit-identical to the loop below; pinned
        # in tests/test_device_data.py).  dp-sharded residency takes the
        # same path: the gather itself runs under shard_map.
        on_device = True
        n = n_valid = len(dataset)
        ix = dataset.index
        pad = (-n) % batch_size
        order = np.arange(n)
        idx_all = (np.concatenate([order, np.repeat(order[-1:], pad)])
                   if pad else order)
        # host numpy in (uncommitted): under a multi-process mesh a local
        # jnp.asarray would clash with the global table arrays
        chunks = idx_all.reshape(-1, batch_size).astype(np.int32)
        ve, me, st, smk, io, ps, ls = _scan_program(
            eval_step, dataset.gather_fn)(params, dataset.tree, chunks)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        if multiproc:
            # Per-row outputs are non-addressable GLOBAL arrays; gather
            # identical host copies on every process and fall through to
            # the replicated host-fed similarity below (the proven
            # multi-process eval path) — pod-scale corpus eval has its own
            # sharded driver (eval/similarity.py / scripts/bench_corpus_*).
            video_embs = to_host(flat(ve))[:n]
            music_embs = to_host(flat(me))[:n]
            seg_tokens = to_host(flat(st))[:n]
            seg_masks = to_host(flat(smk))[:n]
            on_device = False
        else:
            video_embs = flat(ve)[:n]             # [N, D]
            music_embs = flat(me)[:n]
            seg_tokens = flat(st)[:n]             # [N, S, D]
            seg_masks = flat(smk)[:n]
        ious = to_host(flat(io))[:n]
        pred_spans = [to_host(flat(ps))[:n]]
        weights = np.full(chunks.shape[0], batch_size, np.int64)
        weights[-1] = batch_size - pad
        losses = list(zip(to_host(ls).tolist(), weights.tolist()))
        video_ids = list(ix.video_ids)
        music_ids = list(ix.music_ids)
    else:
        from mgsv_tpu.data.pipeline import make_batch_shipper
        from mgsv_tpu.data.dataset import epoch_index_batches

        ship = make_batch_shipper(dataset, shard)
        for idx, bvalid in epoch_index_batches(
                len(dataset), batch_size, shuffle=False, drop_last=False):
            batch, meta = ship(idx, bvalid)
            out = eval_step(params, batch)
            valid = meta.valid
            k = int(valid.sum())
            n_valid += k
            if on_device:
                video_embs.append(out["video_emb"])
                music_embs.append(out["music_emb"])
                seg_tokens.append(out["seg_tokens"])
                seg_masks.append(out["segment_mask"])
            else:
                video_embs.append(to_host(out["video_emb"])[valid])
                music_embs.append(to_host(out["music_emb"])[valid])
                seg_tokens.append(to_host(out["seg_tokens"])[valid])
                seg_masks.append(to_host(out["segment_mask"])[valid])
            ious.append(to_host(out["iou"])[valid])
            pred_spans.append(to_host(out["pred_spans_sec"])[valid])
            # Weight each batch's loss by its valid-row count so the padded
            # final batch doesn't skew the epoch average (its in-batch loss
            # still sees padded rows as extra negatives; full batches
            # dominate).
            losses.append((float(out["loss"]), k))
            video_ids.extend([v for v, ok in zip(meta.video_ids, valid) if ok])
            music_ids.extend([m for m, ok in zip(meta.music_ids, valid) if ok])

        cat = jnp.concatenate if on_device else np.concatenate
        video_embs = cat(video_embs)[:n_valid]    # [N, D]
        music_embs = cat(music_embs)[:n_valid]
        seg_tokens = cat(seg_tokens)[:n_valid]    # [N, S, D]
        seg_masks = cat(seg_masks)[:n_valid]
        ious = np.concatenate(ious)

    # Multi-process: every process holds identical host copies of the
    # gathered embeddings, so the corpus similarity runs per process on its
    # local devices (replicated work, zero cross-host coordination) and all
    # processes derive bit-identical metrics.  Single-process multi-device
    # keeps the mesh-sharded similarity.
    sim = corpus_similarity(
        params, video_embs, music_embs, seg_tokens, seg_masks, cfg,
        block_size=sim_block_size, mesh=None if multiproc else mesh,
        use_fused_kernel=use_fused_sim)

    ret_metrics, ranks, ret_results = M.recall_metrics(sim, music_ids)
    loc_metrics = M.iou_metrics(ious)
    com_metrics = M.composite_metrics(ranks, ious)

    return {
        "loss": (float(np.average([l for l, _ in losses],
                                  weights=[w for _, w in losses]))
                 if losses else 0.0),
        "retrieval": ret_metrics,
        "localization": loc_metrics,
        "composite": com_metrics,
        "ranks": ranks,
        "ious": ious,
        "pred_spans": np.concatenate(pred_spans),
        "video_ids": video_ids,
        "music_ids": music_ids,
        "ret_results": ret_results,
    }


def corpus_similarity(
    params,
    video_embs: np.ndarray,
    music_embs: np.ndarray,
    seg_tokens: np.ndarray,
    seg_masks: np.ndarray,
    cfg: Config,
    block_size: int = 256,
    use_fused_kernel: bool = False,
    mesh=None,
) -> np.ndarray:
    """Similarity fusion per vmr_loss — train-MaDe.py:577-604.

    use_fused_kernel selects the Pallas fused X-Pool similarity kernel
    (ops/pallas/xpool_sim.py) — measured ~1.6x faster than the XLA blocked
    path at 2000x2000 on v5e, at the cost of a long first compile; the XLA
    path is the default.  A multi-device `mesh` shards the pooled
    similarity over its dp axis (pod-scale retrieval).
    """
    lc, m = cfg.loss, cfg.model
    video = jnp.asarray(video_embs)

    def pooled_sim():
        sub = {"params": params["params"]["xpool_v2m"]}
        mask = jnp.asarray(seg_masks) if m.fusion_mask else None
        if use_fused_kernel:
            from mgsv_tpu.core.mesh import DATA_AXIS
            if (mesh is not None and mesh.devices.size > 1
                    and len(seg_tokens) % mesh.shape[DATA_AXIS] == 0):
                from mgsv_tpu.eval.similarity import xpool_sim_fused_sharded
                return xpool_sim_fused_sharded(
                    video, jnp.asarray(seg_tokens), mask, sub, mesh)
            from mgsv_tpu.ops.pallas.xpool_sim import xpool_sim_fused
            return xpool_sim_fused(video, jnp.asarray(seg_tokens), mask, sub)
        xpool = XPoolTransformer(m.dim_input, dropout=m.xpool_dropout)
        if mesh is not None and mesh.devices.size > 1:
            from mgsv_tpu.eval.similarity import xpool_similarity_mesh
            # fusion_mask=False still ships an all-ones mask (the sharded
            # path needs a concrete array for its shard specs).
            shard_mask = (jnp.asarray(seg_masks) if m.fusion_mask
                          else jnp.ones(seg_masks.shape, jnp.float32))
            # dispatches 2D (video x catalog over dp x mp) when the mesh
            # has a real mp axis, 1D music-sharded otherwise; pads
            # internally so any corpus size works
            return xpool_similarity_mesh(
                xpool.apply, sub, video, jnp.asarray(seg_tokens),
                shard_mask, mesh,
                block_size=min(block_size, len(seg_tokens)))
        return xpool_similarity_blocked(
            xpool.apply, sub, video, jnp.asarray(seg_tokens), mask,
            block_size=min(block_size, len(seg_tokens)),
        )

    # All branches return the DEVICE-resident similarity; ranking now also
    # runs on device (eval/metrics.py dedup_rank_device), so the [N, N]
    # matrix never crosses the host link.
    if "XA" not in m.vmr_fusion:
        return dual_similarity(video, jnp.asarray(music_embs))
    if lc.vmr_loss == "single":
        return pooled_sim()
    if lc.vmr_loss in ("dual_single_sim_fuse", "dual_single_loss_fuse"):
        single = pooled_sim()
        dual = dual_similarity(video, jnp.asarray(music_embs))
        return single * 1.0 + dual * 1.0
    if lc.vmr_loss == "dual_single_feature_fuse":
        # Pooled features fused with the global music embedding before sim
        # (train-MaDe.py:600-603).  Rarely-used variant: materializes the
        # pooled tensor (like the reference) rather than blocking.
        from mgsv_tpu.models.xpool import sim_matrix_music_pooling

        xpool = XPoolTransformer(m.dim_input, dropout=m.xpool_dropout)
        sub = {"params": params["params"]["xpool_v2m"]}
        pooled = xpool.apply(
            sub, video, jnp.asarray(seg_tokens),
            jnp.asarray(seg_masks) if m.fusion_mask else None,
            deterministic=True)
        fused = pooled + jnp.asarray(music_embs)[:, None, :]
        return sim_matrix_music_pooling(video, fused)
    if lc.vmr_loss == "dual":
        return dual_similarity(video, jnp.asarray(music_embs))
    raise ValueError(f"unsupported vmr_loss for eval: {lc.vmr_loss}")
