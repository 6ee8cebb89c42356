"""Dropout-site fingerprint: localize any systematic dropout-ON difference.

The paired 24-seed A/B (AB_REPORT.md) resolves sub-point metric gaps; to
attribute a gap to a subsystem WITHOUT retraining, this compares the
DISTRIBUTION of each loss component over N independent dropout-mask draws
— torch reference vs mgsv_tpu, same imported weights, same single batch —
with dropout enabled in ONE subsystem at a time:

  * none      control: all dropout off — sides must agree to float precision
              (validates the plumbing; this is the parity-test regime)
  * temporal  towers only (rate 0.8, model_Base.py:296 r_enc)
  * xpool     X-Pool wrapper only (rate 0.3, modules/transformer.py:133)
  * detr      DETR encoder/decoder only (rate 0.1, args.detr_dropout)
  * all       the paper configuration

Dropout is mean-preserving only in expectation per site; a PLACEMENT or
SCALING difference between the two implementations shows up as a shifted
mean of the post-nonlinearity losses at that site's scenario, resolvable
at N draws when |mean_ref - mean_ours| >> sqrt(var_ref/N + var_our/N).
A matching mean with matching spread is evidence the site sets are the
same (same number/placement of masks), not just unbiased.

Usage: python scripts/diag_dropout_fingerprint.py [--draws 300] [--rows 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ab_trained_behavior as ab  # noqa: E402  (sets up CPU jax + ref path)

import jax  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

from mgsv_tpu.config import Config, ModelConfig, TrainConfig  # noqa: E402
from mgsv_tpu.data import synthetic  # noqa: E402
from mgsv_tpu.interop.torch_import import import_uni_state_dict  # noqa: E402
from mgsv_tpu.models.made import MaDe  # noqa: E402
from mgsv_tpu.train.objective import total_loss  # noqa: E402

# (torch submodule attributes, our ModelConfig knobs) per scenario
SUBSYSTEMS = {
    "temporal": ["video_transformer", "audio_transformer"],
    "xpool": ["video_guided_to_music_pooling_cross_transformer"],
    "detr": ["detr_transformer"],
}
SCENARIOS = {
    "none": {},
    "temporal": {"temporal": True},
    "xpool": {"xpool": True},
    "detr": {"detr": True},
    "all": {"temporal": True, "xpool": True, "detr": True},
}


def snapshot_rates(module: torch.nn.Module):
    rates = {}
    for name, m in module.named_modules():
        if isinstance(m, torch.nn.Dropout):
            rates[name] = ("p", m.p)
        elif isinstance(m, torch.nn.MultiheadAttention):
            rates[name] = ("dropout", m.dropout)
    return rates


def set_scenario(ref: torch.nn.Module, rates, enabled: dict):
    """All dropout off, then restore recorded rates inside enabled subsystems."""
    ab.zero_dropout(ref)
    prefixes = [a for k, on in enabled.items() if on for a in SUBSYSTEMS[k]]
    for name, (attr, p) in rates.items():
        if any(name == pre or name.startswith(pre + ".") for pre in prefixes):
            sub = ref
            for part in name.split("."):
                sub = getattr(sub, part)
            setattr(sub, attr, p)


def our_cfg(enabled: dict, base: Config) -> Config:
    model = ModelConfig(
        compute_dtype="float32", fused_detr_encoder=False,
        temporal_dropout=0.8 if enabled.get("temporal") else 0.0,
        xpool_dropout=0.3 if enabled.get("xpool") else 0.0,
        detr_dropout=0.1 if enabled.get("detr") else 0.0,
        ca_dropout=0.0,
    )
    return Config(data=base.data, model=model, train=base.train)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--draws", type=int, default=300)
    p.add_argument("--rows", type=int, default=64)
    p.add_argument("--seed", type=int, default=1000)
    p.add_argument("--workdir", type=str, default="/tmp/diag_fp")
    p.add_argument("--out", type=str, default="/tmp/diag_fp/fingerprint.json")
    a = p.parse_args()

    base = ab.our_config(1, a.rows, a.seed, dropout="paper")
    root = os.path.join(a.workdir, "data")
    synthetic.generate(root, n_rows=a.rows, n_unique_music=max(2, a.rows // 2),
                       data_cfg=base.data, seed=0, family_size=32,
                       family_delta=0.15)
    dataset = synthetic.open_synthetic(root, base.data)
    batch, _meta = next(dataset.epoch_batches(a.rows, shuffle=False))

    args = ab.ref_args(1)
    args.detr_dropout = 0.1            # paper rate; scenario gating below
    torch.manual_seed(a.seed)
    ref = ab.Uni_model(args, device=torch.device("cpu"), logger=None)
    ref.vit_proj = torch.nn.Linear(512, 256)
    ref.ast_proj = torch.nn.Linear(768, 256)
    rates = snapshot_rates(ref)
    ref.train()

    state_np = {k: v.detach().numpy().copy()
                for k, v in ref.state_dict().items()}
    ff, sf, fm, sm, spans = ab.torch_batch(batch)

    report = {}
    for scen, enabled in SCENARIOS.items():
        set_scenario(ref, rates, enabled)
        cfg = our_cfg(enabled, base)
        params = import_uni_state_dict(state_np, cfg)
        model = MaDe(cfg)

        @jax.jit
        def our_losses(rng, params=params, model=model, cfg=cfg):
            out = model.apply(
                params, batch["frame_feats"], batch["frame_mask"],
                batch["segment_feats"], batch["segment_mask"],
                v_duration=batch.get("v_duration"),
                deterministic=False, rngs={"dropout": rng})
            _, log = total_loss(out, batch["spans_target"], cfg,
                                music_codes=batch.get("music_codes"))
            return log["retrieval_loss"], log["localization_loss"]

        draws = a.draws if enabled else 3
        r_ret, r_loc, o_ret, o_loc = [], [], [], []
        with torch.no_grad():
            for i in range(draws):
                torch.manual_seed(a.seed + 31 * i + 7)
                _, loss_map, _, _, _ = ref(
                    ff, sf, fm, sm, spans, v_duration=None,
                    video_ids=None, music_ids=None, is_train=True)
                r_ret.append(float(loss_map["retrieval_loss"]))
                r_loc.append(float(loss_map["localization_loss"]))
                ret_l, loc_l = our_losses(jax.random.PRNGKey(a.seed + 977 * i))
                o_ret.append(float(ret_l))
                o_loc.append(float(loc_l))
        row = {}
        for comp, rv, ov in (("retrieval", r_ret, o_ret),
                             ("localization", r_loc, o_loc)):
            rv, ov = np.asarray(rv), np.asarray(ov)
            se = float(np.sqrt(rv.var(ddof=1) / len(rv)
                               + ov.var(ddof=1) / len(ov))) if draws > 1 else 0.0
            row[comp] = {
                "ref_mean": float(rv.mean()), "ref_std": float(rv.std(ddof=1)),
                "our_mean": float(ov.mean()), "our_std": float(ov.std(ddof=1)),
                "diff": float(ov.mean() - rv.mean()), "se": se,
                "z": float((ov.mean() - rv.mean()) / se) if se > 0 else 0.0,
            }
        report[scen] = row
        print(f"{scen:9s} " + "  ".join(
            f"{c}: ref {row[c]['ref_mean']:.4f}±{row[c]['ref_std']:.4f} "
            f"ours {row[c]['our_mean']:.4f}±{row[c]['our_std']:.4f} "
            f"z={row[c]['z']:+.2f}" for c in ("retrieval", "localization")),
            flush=True)

    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"out": a.out, "draws": a.draws, "rows": a.rows}))


if __name__ == "__main__":
    main()
