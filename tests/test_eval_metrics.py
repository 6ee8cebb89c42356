"""Metric parity vs utils/util_test.py and blocked/sharded similarity checks."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/reference")
from utils.util_test import Composite_metrics as ref_composite  # noqa: E402
from utils.util_test import IoU_metrics as ref_iou  # noqa: E402
from utils.util_test import Recall_metrics as ref_recall  # noqa: E402

from mgsv_tpu.eval import metrics, similarity  # noqa: E402
from mgsv_tpu.models.xpool import XPoolTransformer, sim_matrix_music_pooling  # noqa: E402
import pytest

pytestmark = pytest.mark.torch_oracle


def _sim_problem(n=60, n_unique=40, seed=0):
    rng = np.random.RandomState(seed)
    sim = rng.randn(n, n).astype(np.float64)
    # duplicated music ids to exercise dedup ranking
    ids = [f"m{rng.randint(n_unique)}" for _ in range(n)]
    # make sure each row's own id appears at its own column
    return sim, ids


def test_recall_metrics_parity():
    sim, ids = _sim_problem()
    ref_m, ref_ind, ref_results = ref_recall(sim, dedup=True, all_music_ids_list=ids)
    ours_m, ours_ind, ours_results = metrics.recall_metrics(sim, ids)
    np.testing.assert_array_equal(ours_ind, ref_ind)
    for k in ["R1", "R3", "R5", "R10", "R20", "R25", "R50", "R100",
              "MedianR", "MeanR", "MRR"]:
        np.testing.assert_allclose(ours_m[k], ref_m[k], atol=1e-9, err_msg=k)
    for a, b in zip(ours_results, ref_results):
        assert a["music_id"] == b["music_id"]
        assert a["rank"] == b["rank"]
        assert a["topk_music_ids"] == b["topk_music_ids"]


def test_iou_and_composite_parity():
    rng = np.random.RandomState(1)
    n = 80
    iou = rng.rand(n)
    ranks = rng.randint(0, 120, size=n)

    ref_m = ref_iou(list(iou))
    ours_m = metrics.iou_metrics(iou)
    for k in ref_m:
        np.testing.assert_allclose(ours_m[k], ref_m[k], atol=1e-9, err_msg=k)

    import torch
    iou_t = [torch.tensor(x) for x in iou]
    ref_c = ref_composite(list(ranks), iou_t, [{}] * n, ["v"] * n, ["m"] * n)
    ours_c = metrics.composite_metrics(ranks, iou)
    for k in ref_c:
        np.testing.assert_allclose(ours_c[k], float(ref_c[k]), atol=1e-7, err_msg=k)


def test_blocked_similarity_matches_direct():
    rng = np.random.RandomState(2)
    v_count, m_count, s, d = 12, 20, 8, 32
    video = jnp.asarray(rng.randn(v_count, d).astype(np.float32))
    segs = jnp.asarray(rng.randn(m_count, s, d).astype(np.float32))
    mask = np.ones((m_count, s), np.float32)
    mask[:, 6:] = 0
    mask = jnp.asarray(mask)

    xpool = XPoolTransformer(d)
    params = xpool.init(jax.random.PRNGKey(0), video, segs, mask)
    direct = sim_matrix_music_pooling(
        video, xpool.apply(params, video, segs, mask, deterministic=True))

    blocked = similarity.xpool_similarity_blocked(
        xpool.apply, params, video, segs, mask, block_size=6)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(direct), atol=1e-5)


def test_sharded_similarity_matches_blocked():
    from jax.sharding import Mesh

    devs = jax.devices()
    assert len(devs) == 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(np.array(devs), ("dp",))

    rng = np.random.RandomState(3)
    v_count, m_count, s, d = 8, 32, 6, 16
    video = jnp.asarray(rng.randn(v_count, d).astype(np.float32))
    segs = jnp.asarray(rng.randn(m_count, s, d).astype(np.float32))
    mask = jnp.asarray(np.ones((m_count, s), np.float32))

    xpool = XPoolTransformer(d)
    params = xpool.init(jax.random.PRNGKey(0), video, segs, mask)
    blocked = similarity.xpool_similarity_blocked(
        xpool.apply, params, video, segs, mask, block_size=8)
    sharded = similarity.xpool_similarity_sharded(
        xpool.apply, params, video, segs, mask, mesh, block_size=4)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(blocked), atol=1e-5)


def test_mesh_2d_similarity_matches_blocked():
    """xpool_similarity_mesh on a (dp=4, mp=2) mesh — video rows sharded
    over dp, the music catalog over mp (VERDICT r3 task 5: the mp axis's
    eval-time job) — must match the single-device blocked path exactly,
    including the internal padding for corpus sizes that divide neither
    axis (V=10 % 4 != 0, M=21 % 2 != 0)."""
    from mgsv_tpu.core.mesh import make_mesh

    mesh = make_mesh((4, 2))
    rng = np.random.RandomState(4)
    v_count, m_count, s, d = 10, 21, 6, 16
    video = jnp.asarray(rng.randn(v_count, d).astype(np.float32))
    segs = jnp.asarray(rng.randn(m_count, s, d).astype(np.float32))
    mask = np.ones((m_count, s), np.float32)
    mask[:, 4:] = 0
    mask = jnp.asarray(mask)

    xpool = XPoolTransformer(d)
    params = xpool.init(jax.random.PRNGKey(0), video, segs, mask)
    blocked = similarity.xpool_similarity_blocked(
        xpool.apply, params, video, segs, mask, block_size=8)
    mesh2d = similarity.xpool_similarity_mesh(
        xpool.apply, params, video, segs, mask, mesh, block_size=8)
    assert mesh2d.shape == (v_count, m_count)
    np.testing.assert_allclose(np.asarray(mesh2d), np.asarray(blocked),
                               atol=1e-5)

    # dp-only mesh routes to the 1D music-sharded path, same contract
    mesh1d = similarity.xpool_similarity_mesh(
        xpool.apply, params, video, segs, mask, make_mesh((8, 1)),
        block_size=8)
    assert mesh1d.shape == (v_count, m_count)
    np.testing.assert_allclose(np.asarray(mesh1d), np.asarray(blocked),
                               atol=1e-5)


def test_rect_rank_equals_dedup_rank():
    """[N_videos, N_unique_tracks] ranking == the reference's deduplicated
    ranking over the square [N, N] matrix with duplicated-track columns —
    the identity that makes 53k x 4k pod-scale retrieval exact
    (SURVEY.md §2.7; util_test.py:44-68)."""
    from mgsv_tpu.eval.metrics import (dedup_rank, recall_metrics,
                                       recall_metrics_rect, rect_rank)

    rng = np.random.RandomState(0)
    n_rows, n_tracks = 40, 12
    track_ids = [f"m{j}" for j in range(n_tracks)]
    gt = [track_ids[rng.randint(n_tracks)] for _ in range(n_rows)]
    # ensure every track appears at least once as a GT (columns of the
    # square matrix are the per-row GT tracks)
    gt[:n_tracks] = track_ids

    rect = rng.randn(n_rows, n_tracks)          # video x unique-track sims
    col = {m: j for j, m in enumerate(track_ids)}
    square = rect[:, [col[m] for m in gt]]      # duplicate columns per row

    r_rect = rect_rank(rect, track_ids, gt)
    r_square = dedup_rank(square, gt)
    np.testing.assert_array_equal(r_rect, r_square)

    m_rect, _ = recall_metrics_rect(rect, track_ids, gt)
    m_square, _, _ = recall_metrics(square, gt)
    for k in ("R1", "R5", "R10", "MedianR", "MRR"):
        assert m_rect[k] == m_square[k], k

    # exact ties between DISTINCT tracks (quantized sims — e.g. duplicate
    # audio or low-precision storage): the square dedup ranking breaks
    # them by first VIDEO-order occurrence, which is not the unique-column
    # order — the rect path must reproduce that, host and device
    rect_t = np.round(rect * 2) / 2
    square_t = rect_t[:, [col[m] for m in gt]]
    np.testing.assert_array_equal(
        rect_rank(rect_t, track_ids, gt), dedup_rank(square_t, gt))
    from mgsv_tpu.eval import metrics as M
    np.testing.assert_array_equal(
        M.rect_rank_device(jnp.asarray(rect_t, jnp.float32), track_ids, gt),
        dedup_rank(square_t.astype(np.float32), gt))


def _tied_problem(n=48, n_unique=20, seed=3):
    """Similarity with deliberate exact ties (quantized values) so the
    stable-order tie-breaking of the device rankers is actually exercised."""
    rng = np.random.RandomState(seed)
    sim = np.round(rng.randn(n, n) * 2) / 2          # many exact ties
    ids = [f"m{rng.randint(n_unique)}" for _ in range(n)]
    return sim, ids


def test_dedup_rank_device_matches_host():
    for seed in range(4):
        sim, ids = _tied_problem(seed=seed)
        host = metrics.dedup_rank(sim.astype(np.float32), ids)
        dev_ranks, dev_top1 = metrics.dedup_rank_device(
            jnp.asarray(sim, jnp.float32), ids)
        np.testing.assert_array_equal(dev_ranks, host)
        order = np.argsort(-sim.astype(np.float32), axis=1, kind="stable")
        np.testing.assert_array_equal(dev_top1, order[:, 0])


def test_recall_metrics_device_path_identical():
    sim, ids = _tied_problem(seed=9)
    host_m, host_r, host_res = metrics.recall_metrics(sim.astype(np.float32), ids)
    dev_m, dev_r, dev_res = metrics.recall_metrics(
        jnp.asarray(sim, jnp.float32), ids)
    np.testing.assert_array_equal(dev_r, host_r)
    assert dev_m == host_m
    assert dev_res == host_res


def test_rect_rank_device_matches_host():
    rng = np.random.RandomState(11)
    n_v, n_m = 64, 24
    sim = np.round(rng.randn(n_v, n_m) * 2) / 2
    cols = [f"m{j}" for j in range(n_m)]
    gts = [cols[rng.randint(n_m)] for _ in range(n_v)]
    host = metrics.rect_rank(sim.astype(np.float32), cols, gts)
    dev = metrics.rect_rank_device(jnp.asarray(sim, jnp.float32), cols, gts)
    np.testing.assert_array_equal(dev, host)
    host_m, _ = metrics.recall_metrics_rect(sim.astype(np.float32), cols, gts)
    dev_m, _ = metrics.recall_metrics_rect(jnp.asarray(sim, jnp.float32), cols, gts)
    assert dev_m == host_m
