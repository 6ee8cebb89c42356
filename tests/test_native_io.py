"""Native C++ IO runtime: build, gather parity, f16 widening, prefetch pipeline."""

import numpy as np
import pytest

from mgsv_tpu.data.feature_store import PackedFeatureStore
from mgsv_tpu.runtime import native


@pytest.fixture(scope="module")
def store_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store"))
    rng = np.random.RandomState(0)
    ids = [f"id{i}" for i in range(37)]
    feats = (rng.randn(37, 5, 16) * 3).astype(np.float16)
    mask = rng.randint(0, 2, (37, 5)).astype(np.uint8)
    PackedFeatureStore.build(root, ids, {"feats": feats, "mask": mask})
    return root, feats, mask


def test_native_lib_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ build of libmgsv_io.so failed"


def test_native_gather_matches_numpy(store_root):
    root, feats, mask = store_root
    store = PackedFeatureStore(root, use_native=True)
    # confirm the native path is actually active
    assert hasattr(store.arrays["feats"], "gather"), "native store not in use"

    idx = np.asarray([0, 5, 5, 36, 12], np.int64)
    out = store.gather("feats", idx, np.float32)
    np.testing.assert_allclose(out, feats[idx].astype(np.float32), atol=0)
    assert out.dtype == np.float32

    m = store.gather("mask", idx, np.float32)
    np.testing.assert_array_equal(m, mask[idx].astype(np.float32))

    # raw-dtype gather
    raw = store.gather("feats", idx, None)
    assert raw.dtype == np.float16
    np.testing.assert_array_equal(raw, feats[idx])

    store.prefetch("feats", idx)  # smoke: must not crash


def test_f16_widening_exact(store_root):
    """The C++ half->float conversion must be bit-exact vs numpy, including
    subnormals and specials."""
    import tempfile, os
    specials = np.asarray(
        [0.0, -0.0, 1.0, -1.0, 65504.0, -65504.0, 6.1e-5, 5.96e-8,
         np.inf, -np.inf, np.nan, 3.14159], np.float16).reshape(1, -1)
    root = tempfile.mkdtemp()
    PackedFeatureStore.build(root, ["a"], {"x": specials})
    store = PackedFeatureStore(root)
    out = store.gather("x", np.asarray([0]), np.float32)
    ref = specials.astype(np.float32)
    np.testing.assert_array_equal(
        out.view(np.uint32), ref.view(np.uint32))


def test_prefetch_pipeline_yields_all_batches(store_root):
    import jax
    from mgsv_tpu.config import DataConfig
    from mgsv_tpu.data import synthetic
    from mgsv_tpu.data.pipeline import prefetch_epoch
    import tempfile

    dcfg = DataConfig(max_v_frames=6, stride=40.0, filter_sec=40.0,
                      vit_dim=16, ast_dim=24)
    root = tempfile.mkdtemp()
    synthetic.generate(root, n_rows=20, data_cfg=dcfg, seed=1)
    ds = synthetic.open_synthetic(root, dcfg)

    seen = 0
    for batch, meta in prefetch_epoch(ds, 8, shuffle=True, seed=3, epoch=1):
        assert isinstance(batch["frame_feats"], jax.Array)
        seen += 1
    assert seen == 2  # 20 rows, bs 8, drop_last

    # deterministic order per (seed, epoch) — same contract as
    # DistributedSampler.set_epoch
    ids_a = [m.video_ids for _, m in prefetch_epoch(ds, 8, shuffle=True, seed=3, epoch=1)]
    ids_b = [m.video_ids for _, m in prefetch_epoch(ds, 8, shuffle=True, seed=3, epoch=1)]
    ids_c = [m.video_ids for _, m in prefetch_epoch(ds, 8, shuffle=True, seed=3, epoch=2)]
    assert ids_a == ids_b
    assert ids_a != ids_c
