"""Config system: overrides, derived values, serialization."""

import dataclasses
import json

import pytest

from mgsv_tpu.config import Config
from mgsv_tpu.cli.train import parse_overrides


def test_defaults_are_paper_config():
    cfg = Config()
    assert cfg.data.max_snippet_num == 96
    assert cfg.data.max_v_frames == 50
    assert cfg.model.dim_input == 256
    assert cfg.model.detr_enc_layers == 2 and cfg.model.detr_dec_layers == 6
    assert cfg.model.temperature_init_value == pytest.approx(3e-2)
    assert cfg.loss.ret_loss_weight == 1.0 and cfg.loss.loc_loss_weight == 1.0
    assert cfg.train.batch_size_train == 512
    assert cfg.train.warmup_rate == pytest.approx(0.02)
    assert cfg.loss.foreground_label == 0 and cfg.loss.background_label == 1


def test_from_overrides_and_errors():
    cfg = Config.from_overrides({
        "data.stride": 5.0, "model.detr_dec_layers": 2,
        "train.epochs": 7, "loss.ret_loss_weight": 3.0,
    })
    assert cfg.data.stride == 5.0
    assert cfg.data.max_snippet_num == 48      # derived
    assert cfg.model.detr_dec_layers == 2
    assert cfg.train.epochs == 7
    with pytest.raises(KeyError):
        Config.from_overrides({"bogus.key": 1})
    with pytest.raises(TypeError):
        Config.from_overrides({"train.not_a_field": 1})


def test_cli_parse_overrides_types():
    known, ov = parse_overrides([
        "--train.epochs", "3", "--data.stride", "2.5",
        "--model.compute_dtype", "float32", "--train.profile", "true",
    ])
    assert ov == {"train.epochs": 3, "data.stride": 2.5,
                  "model.compute_dtype": "float32", "train.profile": True}
    cfg = Config.from_overrides(ov)
    assert cfg.train.profile is True

    # --key=value form (previously mis-consumed the NEXT token as value)
    known, ov = parse_overrides([
        "--train.epochs=3", "--data.stride", "2.5", "--train.name=run=a",
    ])
    assert ov == {"train.epochs": 3, "data.stride": 2.5,
                  "train.name": "run=a"}


def test_to_json_roundtrip_keys():
    cfg = Config()
    blob = json.loads(cfg.to_json())
    assert set(blob) == {"data", "model", "loss", "train"}
    assert blob["model"]["compute_dtype"] in ("float32", "bfloat16")


def test_span_loss_type_ce_rejected_loudly():
    # The reference's "ce" argparse choice (train-MaDe.py:85) is dead
    # upstream (span_embed never emits snippet logits; matcher.py:79-85
    # crashes on reshape / float indexing).  A silent no-op knob here
    # would let users believe they trained a ce model — reject at
    # construction instead.
    cfg = Config()
    with pytest.raises(ValueError, match="span_loss_type"):
        dataclasses.replace(cfg.model, span_loss_type="ce")


def test_rejects_project_out_false_ca_shape():
    # ca_heads=1 with ca_dim_head == dim_input makes CrossAttention's to_out
    # an Identity (project_out=False, models/cross.py:43 mirroring
    # model_Base.py:107-118); the torch interop key maps assume to_out
    # exists, so the config is rejected at construction (ADVICE r3).
    cfg = Config()
    with pytest.raises(ValueError, match="project_out"):
        dataclasses.replace(cfg.model, ca_heads=1, ca_dim_head=256)
    # 1 head with a different head dim is still a legal shape
    dataclasses.replace(cfg.model, ca_heads=1, ca_dim_head=64)
