"""Golden parity: our jit-native matcher/criterion/retrieval losses vs the
reference's torch implementations executed on CPU.

The reference modules imported here (music_detr.matcher, music_detr.loss_detr,
modules.loss) depend only on torch + scipy, so they run in this environment
and serve as an executable spec.  We copy no code — we check numbers.
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from music_detr.loss_detr import SetCriterion as TorchSetCriterion  # noqa: E402
from music_detr.matcher import build_matcher as torch_build_matcher  # noqa: E402
from modules.loss import CLIPLoss as torch_clip_loss  # noqa: E402
from modules.loss import InfoNCELoss as torch_info_nce  # noqa: E402
from modules.loss import cal_distance as torch_cal_distance  # noqa: E402

from mgsv_tpu.config import LossConfig  # noqa: E402
from mgsv_tpu.ops import losses, matcher  # noqa: E402

pytestmark = pytest.mark.torch_oracle


def _ref_args(**kw):
    a = types.SimpleNamespace(
        fb_label="01",
        span_loss_type="l1",
        max_snippet_num=96,
        contrastive_align_loss=1,
        moment_loss=0,
        aux_loss=1,
        l1_loss=1,
        detr_dec_layers=6,
        ignore_same_music=1,
    )
    for k, v in kw.items():
        setattr(a, k, v)
    return a


def _cfg(**kw):
    return LossConfig(**kw)


def _random_problem(rng, bs, nq, nt, zero_width_rows=()):
    logits = rng.randn(bs, nq, 2).astype(np.float32)
    spans = rng.rand(bs, nq, 2).astype(np.float32) * 0.5 + 0.1  # cw, positive width
    tgt = rng.rand(bs, nt, 2).astype(np.float32) * 0.5 + 0.1
    for b, t in zero_width_rows:
        tgt[b, t, 1] = 0.0  # invalid target (width == 0)
    return logits, spans, tgt


@pytest.mark.parametrize(
    "bs,nq,nt,zeros",
    [
        (6, 1, 1, ()),                      # shipped config
        (5, 3, 2, ()),
        (4, 2, 4, ((1, 3), (2, 0))),        # some invalid targets
        (3, 4, 1, ()),
    ],
)
def test_matcher_parity(bs, nq, nt, zeros):
    rng = np.random.RandomState(bs * 100 + nq * 10 + nt)
    logits, spans, tgt = _random_problem(rng, bs, nq, nt, zeros)

    tm = torch_build_matcher(_ref_args())
    ref_indices = tm(
        {"pred_logits": torch.tensor(logits), "pred_spans": torch.tensor(spans)},
        torch.tensor(tgt),
    )

    res = matcher.hungarian_match(
        jnp.asarray(logits), jnp.asarray(spans), jnp.asarray(tgt),
        jnp.asarray(tgt[..., 1] != 0), _cfg(),
    )
    cost = np.asarray(
        matcher.matcher_cost(
            jnp.asarray(logits), jnp.asarray(spans), jnp.asarray(tgt),
            jnp.asarray(tgt[..., 1] != 0), _cfg(),
        )
    )

    for b in range(bs):
        pred_idx, tgt_local_idx = ref_indices[b]
        valid_slots = np.flatnonzero(tgt[b, :, 1] != 0)
        ref_pairs = {
            (int(p), int(valid_slots[t])) for p, t in zip(pred_idx, tgt_local_idx)
        }
        our_pairs = {
            (int(res.tgt_to_pred[b, t]), int(t))
            for t in range(nt)
            if bool(res.pair_valid[b, t])
        }
        assert len(our_pairs) == len(ref_pairs)
        # Assignments may differ on exact index ties; total cost must match.
        ref_cost = sum(cost[b, p, t] for p, t in ref_pairs)
        our_cost = sum(cost[b, p, t] for p, t in our_pairs)
        np.testing.assert_allclose(our_cost, ref_cost, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("bs,nq,nt,layers", [(6, 1, 1, 6), (4, 3, 2, 3), (5, 2, 1, 1)])
def test_set_criterion_parity(bs, nq, nt, layers):
    rng = np.random.RandomState(bs + nq * 7 + nt * 13 + layers)
    con_dim = 32
    frames = 10
    logits_l = rng.randn(layers, bs, nq, 2).astype(np.float32)
    spans_l = (rng.rand(layers, bs, nq, 2) * 0.5 + 0.1).astype(np.float32)
    tgt = (rng.rand(bs, nt, 2) * 0.5 + 0.1).astype(np.float32)
    pq = rng.randn(layers, bs, nq, con_dim).astype(np.float32)
    pq /= np.linalg.norm(pq, axis=-1, keepdims=True)
    pv = rng.randn(bs, frames, con_dim).astype(np.float32)
    pv /= np.linalg.norm(pv, axis=-1, keepdims=True)

    # Reference criterion.
    args = _ref_args(detr_dec_layers=layers)
    crit = TorchSetCriterion(args, eos_coef=0.1, temperature=0.07)
    outputs = {
        "pred_logits": torch.tensor(logits_l[-1]),
        "pred_spans": torch.tensor(spans_l[-1]),
        "proj_queries": torch.tensor(pq[-1]),
        "proj_vid_mem": torch.tensor(pv),
        "aux_outputs": [
            {
                "pred_logits": torch.tensor(logits_l[i]),
                "pred_spans": torch.tensor(spans_l[i]),
                "proj_queries": torch.tensor(pq[i]),
                "proj_vid_mem": torch.tensor(pv),
            }
            for i in range(layers - 1)
        ],
    }
    if layers == 1:
        outputs.pop("aux_outputs")
    ref_losses = crit(outputs, torch.tensor(tgt))
    ref_total = sum(
        ref_losses[k] * v for k, v in crit.weight_dict.items() if k in ref_losses
    ).item()

    cfg = _cfg(aux_loss=layers > 1)
    total, log_dict = losses.set_criterion(
        jnp.asarray(logits_l), jnp.asarray(spans_l), jnp.asarray(pq),
        jnp.asarray(pv), jnp.asarray(tgt), cfg,
    )
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-4, atol=2e-5)
    for key in ["loss_span", "loss_giou", "loss_label", "loss_contrastive_align"]:
        np.testing.assert_allclose(
            float(log_dict[key]), float(ref_losses[key]), rtol=2e-4, atol=2e-5,
            err_msg=key,
        )


def test_clip_and_infonce_parity():
    rng = np.random.RandomState(3)
    n, d = 12, 16
    v = rng.randn(n, d).astype(np.float32)
    m = rng.randn(n, d).astype(np.float32)
    scale = np.float32(np.log(1 / 0.03))

    sims_ref = torch_cal_distance(torch.tensor(v), torch.tensor(m))
    sims = losses.cosine_sim_matrix(jnp.asarray(v), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(sims), sims_ref.numpy(), atol=1e-5)

    ref_clip = torch_clip_loss(sims_ref, torch.tensor(scale)).item()
    ours_clip = float(losses.clip_loss(sims, jnp.asarray(scale)))
    np.testing.assert_allclose(ours_clip, ref_clip, rtol=1e-5)

    ref_nce = torch_info_nce(
        sims_ref, torch.tensor(scale), audio_id=None,
        args=_ref_args(), is_train=True,
    )[0].item()
    ours_nce = float(losses.info_nce_loss(sims, jnp.asarray(scale)))
    np.testing.assert_allclose(ours_nce, ref_nce, rtol=1e-5)


def test_info_nce_ignore_same_music_parity():
    """The ignore_same_music=0 branch (loss.py:90-114): duplicate-music
    columns dropped from the v2a negatives."""
    rng = np.random.RandomState(5)
    n, d = 10, 16
    v = rng.randn(n, d).astype(np.float32)
    m = rng.randn(n, d).astype(np.float32)
    scale = np.float32(np.log(1 / 0.05))
    music_ids = ["a", "b", "a", "c", "b", "d", "a", "e", "c", "f"]

    sims_ref = torch_cal_distance(torch.tensor(v), torch.tensor(m))
    ref = torch_info_nce(
        sims_ref, torch.tensor(scale), audio_id=music_ids,
        args=_ref_args(ignore_same_music=0), is_train=True,
    )[0].item()

    codes = np.unique(music_ids, return_inverse=True)[1].astype(np.int32)
    sims = losses.cosine_sim_matrix(jnp.asarray(v), jnp.asarray(m))
    ours = float(losses.info_nce_loss(sims, jnp.asarray(scale),
                                      jnp.asarray(codes)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
