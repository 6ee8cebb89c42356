"""Optimizer / schedule parity and grouping semantics."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")
from utils.scheduler import (  # noqa: E402
    WarmupConstantSchedule, WarmupCosineSchedule, WarmupLinearSchedule)

from mgsv_tpu.config import Config  # noqa: E402
from mgsv_tpu.train import schedule as sched  # noqa: E402
from mgsv_tpu.train.optimizer import FROZEN, label_params, make_optimizer  # noqa: E402

pytestmark = pytest.mark.torch_oracle


@pytest.mark.parametrize("name,ref_cls", [
    ("warmupcosine", WarmupCosineSchedule),
    ("warmuplinear", WarmupLinearSchedule),
    ("warmupconstant", WarmupConstantSchedule),
])
def test_schedule_matches_torch_lambdalr(name, ref_cls):
    base_lr, warmup, total = 3e-4, 20, 200
    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([param], lr=base_lr)
    if ref_cls is WarmupConstantSchedule:
        ref = ref_cls(opt, warmup_steps=warmup)
    else:
        ref = ref_cls(opt, warmup_steps=warmup, t_total=total)

    ours = sched.make_schedule(name, base_lr, warmup, total)
    # The reference calls scheduler.step() after each optimizer step
    # (train-MaDe.py:378-380 with lr_update_rate forced to 1): update k uses
    # the lr set after k scheduler steps == lambda(k).
    ref_lrs = []
    for step in range(total):
        ref_lrs.append(opt.param_groups[0]["lr"])
        ref.step()
    our_lrs = [float(ours(k)) for k in range(total)]
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-6, atol=1e-10)


@pytest.mark.parametrize("update_rate", [1, 7, 50])
def test_exponential_schedule_matches_torch(update_rate):
    """`--scheduler exponential`: torch ExponentialLR(gamma=decay_rate)
    stepped with the reference's gating — AFTER optimizer.step(), when
    total_step % lr_update_rate == 0 with total_step pre-increment
    (train-MaDe.py:285, :378-384; lr_update_rate NOT forced to 1 for this
    scheduler, :274-275)."""
    base_lr, gamma, total = 3e-4, 0.9, 160
    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([param], lr=base_lr)
    ref = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=gamma)

    ref_lrs = []
    for t in range(total):
        ref_lrs.append(opt.param_groups[0]["lr"])   # lr used by step t
        if t % update_rate == 0:                    # fires after the step
            ref.step()
    ours = sched.make_schedule("exponential", base_lr, 0, total,
                               decay_rate=gamma, lr_update_rate=update_rate)
    our_lrs = [float(ours(k)) for k in range(total)]
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-6, atol=1e-12)


@pytest.mark.slow
def test_param_groups_cover_model_and_freeze_query_embed():
    from mgsv_tpu.models.made import MaDe
    import dataclasses

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, vit_dim=16, ast_dim=24,
                                 max_v_frames=4, stride=60.0, filter_sec=60.0),
        model=dataclasses.replace(
            cfg.model, dim_input=8, temporal_mlp_dim=16, detr_ffn_dim=16,
            temporal_heads=2, detr_heads=2, detr_enc_layers=1,
            detr_dec_layers=1, contrastive_dim=8, video_pe_len=8,
            audio_pe_len=8),
    )
    model = MaDe(cfg)
    rng = np.random.RandomState(0)
    ff = jnp.asarray(rng.randn(2, 4, 16).astype(np.float32))
    fm = jnp.ones((2, 4))
    sf = jnp.asarray(rng.randn(2, 4, 24).astype(np.float32))
    sm = jnp.ones((2, 4))
    params = model.init(jax.random.PRNGKey(0), ff, fm, sf, sm, deterministic=True)

    labels = label_params(params)
    assert labels["params"]["query_embed"] == FROZEN
    assert labels["params"]["video_tower"] == "temporal"
    assert labels["params"]["xpool_v2m"] == "matching"
    assert labels["params"]["detr"] == "detection"

    tx = make_optimizer(cfg, total_steps=100)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    # warmup lambda(0) = 0, so the FIRST update is all-zero by design (torch
    # LambdaLR semantics); check the second.
    updates, opt_state = tx.update(grads, opt_state, params)
    updates, _ = tx.update(grads, opt_state, params)
    # frozen group gets exactly zero updates (reference quirk: query embed
    # is in no optimizer param group, model_Uni.py:73-114)
    assert float(jnp.abs(updates["params"]["query_embed"]).max()) == 0.0
    # other groups do update
    assert float(jnp.abs(
        jax.tree.leaves(updates["params"]["detr"])[0]).max()) > 0.0

    # train_query_embed flips the quirk off
    labels2 = label_params(params, train_query_embed=True)
    assert labels2["params"]["query_embed"] == "detection"


@pytest.mark.slow
def test_param_audit_partitions_tree():
    """The startup audit's 4 groups partition the param tree exactly
    (the reference's count_parameters audit, train-MaDe.py:209-304)."""
    from mgsv_tpu.models.made import MaDe
    from mgsv_tpu.train.optimizer import audit_param_groups
    import dataclasses
    import logging

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, vit_dim=16, ast_dim=24,
                                 max_v_frames=4, stride=60.0, filter_sec=60.0),
        model=dataclasses.replace(
            cfg.model, dim_input=8, temporal_mlp_dim=16, detr_ffn_dim=16,
            temporal_heads=2, detr_heads=2, detr_enc_layers=1,
            detr_dec_layers=1, contrastive_dim=8, video_pe_len=8,
            audio_pe_len=8),
    )
    model = MaDe(cfg)
    rng = np.random.RandomState(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.randn(2, 4, 16).astype(np.float32)), jnp.ones((2, 4)),
        jnp.asarray(rng.randn(2, 4, 24).astype(np.float32)), jnp.ones((2, 4)),
        deterministic=True)

    audit = audit_param_groups(params)
    total = sum(x.size for x in jax.tree.leaves(params))
    # the 3 optimizer groups + frozen partition the whole tree
    assert sum(g["params"] for g in audit.values()) == total
    assert set(audit) == {"temporal", "matching", "detection", "frozen"}
    assert audit["frozen"]["modules"] == {
        "query_embed": params["params"]["query_embed"].size}
    assert audit["temporal"]["params"] > 0
    assert audit["matching"]["params"] > 0
    assert audit["detection"]["params"] > 0
    # train_query_embed moves the quirk param into detection
    audit2 = audit_param_groups(params, train_query_embed=True)
    assert audit2["frozen"]["params"] == 0
    assert (audit2["detection"]["params"]
            == audit["detection"]["params"] + audit["frozen"]["params"])

    # the log helper runs and returns the same audit
    from mgsv_tpu.train.optimizer import log_param_audit
    assert log_param_audit(logging.getLogger("test"), params) == audit


def test_label_params_rejects_unknown_subtree():
    with pytest.raises(KeyError):
        label_params({"params": {"mystery_module": {}}})
