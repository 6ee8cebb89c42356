"""Interop export: MaDe params -> reference-format torch state dict.

Pins the two round-trip identities that make the export trustworthy:
  * import(export(params)) == params exactly (flax -> torch -> flax);
  * export(import(ref_state)) == ref_state on the mapped subset, where
    ref_state comes from the LIVE reference Uni_model (same stub set as
    tests/test_made_parity.py) — so names AND layouts match the real
    torch module, not just our own importer's expectations;
plus the .bin checkpoint save/load cycle (utils/util_train.py:38-60
format) through save_reference_checkpoint / load_reference_checkpoint.
"""

import dataclasses
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# ---- stub the frozen-encoder deps before importing the reference model ----
for name in ["clip", "wget"]:
    sys.modules.setdefault(name, types.ModuleType(name))
timm = types.ModuleType("timm")
timm.__version__ = "0.4.5"
timm_models = types.ModuleType("timm.models")
timm_layers = types.ModuleType("timm.models.layers")
timm_layers.to_2tuple = lambda x: (x, x)
timm_layers.trunc_normal_ = lambda *a, **k: None
timm_vit = types.ModuleType("timm.models.vision_transformer")
timm_vit.PatchEmbed = object
timm_models.layers = timm_layers
timm_models.vision_transformer = timm_vit
timm.models = timm_models
sys.modules.setdefault("timm", timm)
sys.modules.setdefault("timm.models", timm_models)
sys.modules.setdefault("timm.models.layers", timm_layers)
sys.modules.setdefault("timm.models.vision_transformer", timm_vit)

from mgsv_tpu.config import Config  # noqa: E402
from mgsv_tpu.interop.torch_export import (export_uni_state_dict,  # noqa: E402
                                           save_reference_checkpoint)
from mgsv_tpu.interop.torch_import import (import_uni_state_dict,  # noqa: E402
                                           load_reference_checkpoint)
from mgsv_tpu.models.made import MaDe  # noqa: E402

pytestmark = pytest.mark.torch_oracle


def _cfg():
    cfg = Config()
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="float32"))


def _init_params(cfg):
    rng = np.random.RandomState(0)
    bs, frames, segs = 2, 4, 6
    model = MaDe(cfg)
    return model.init(
        jax.random.PRNGKey(3),
        jnp.asarray(rng.randn(bs, frames, 512).astype(np.float32)),
        jnp.ones((bs, frames), jnp.float32),
        jnp.asarray(rng.randn(bs, segs, 768).astype(np.float32)),
        jnp.ones((bs, segs), jnp.float32), deterministic=True)


def _assert_trees_equal(a, b):
    flat_a = jax.tree_util.tree_flatten_with_path(a)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(b)[0]
    assert ([jax.tree_util.keystr(k) for k, _ in flat_a]
            == [jax.tree_util.keystr(k) for k, _ in flat_b])
    for (k, va), (_, vb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=jax.tree_util.keystr(k))


@pytest.mark.parametrize("model_over", [
    {},
    # CA fusion adds the CrossTransformer block (model_Base.py:169-213)
    {"mml_fusion": "CA"},
    # both X-Pool sides + moment head
    {"vmr_fusion": "XA-music-video", "moment_loss": True},
], ids=["paper", "ca_fusion", "xa_both_moment"])
@pytest.mark.slow
def test_roundtrip_flax_torch_flax(model_over):
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, **model_over))
    params = _init_params(cfg)
    state = export_uni_state_dict(params, cfg)
    back = import_uni_state_dict(state, cfg)
    _assert_trees_equal(back, params)


def test_roundtrip_matches_live_reference_names():
    """export(import(ref_state)) == ref_state, with ref_state produced by
    the real torch Uni_model — proves exported names/layouts load into the
    reference exactly (strict on the trainable-head subset)."""
    import torch

    sys.path.insert(0, "/root/reference")
    from model.model_Uni import Uni_model
    from tests.test_made_parity import _ref_args

    torch.manual_seed(0)
    ref = Uni_model(_ref_args(), device=torch.device("cpu"), logger=None)
    ref.vit_proj = torch.nn.Linear(512, 256)
    ref.ast_proj = torch.nn.Linear(768, 256)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, max_v_frames=10),
        model=dataclasses.replace(cfg.model, compute_dtype="float32",
                                  detr_enc_layers=2, detr_dec_layers=6),
    )
    params = import_uni_state_dict(state, cfg)
    out = export_uni_state_dict(params, cfg)
    for k, v in out.items():
        assert k in state, f"exported key {k} not in reference state dict"
        np.testing.assert_array_equal(v, state[k], err_msg=k)
    # base_state merge carries unmapped (frozen-encoder-style) entries
    merged = export_uni_state_dict(params, cfg, base_state=state)
    assert set(merged) == set(state)

    # and the exported dict actually LOADS into the torch module
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in out.items()},
        strict=False)
    assert not unexpected, unexpected[:5]


@pytest.mark.slow
def test_bin_checkpoint_cycle(tmp_path):
    cfg = _cfg()
    params = _init_params(cfg)
    path = str(tmp_path / "export.bin")
    save_reference_checkpoint(params, cfg, path, epoch=7, loss=1.5)

    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    assert blob["epoch"] == 7 and blob["loss"] == 1.5

    back = load_reference_checkpoint(path, cfg)
    _assert_trees_equal(back, params)
