"""Post-hoc K-epoch re-averaging for the dropout A/B (--stats-from
--stats-k): the estimator-selection path must be gap-blind, scale the
resolution quantum by 1/K, and pick a K>1 exactly when final-epoch
snapshot noise dominates the recorded per-epoch window.

Runs the script with NO training (--stats-from on a synthesized record
file), so this only pays the module import."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.torch_oracle]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KEYS = ("R1", "R5", "R10", "MRR", "mIoU", "IoU@0.5")


def _mk_blob(noisy_last: bool, seeds: int = 8, window: int = 5):
    """Records whose per-epoch series are flat except (optionally) a large
    final-epoch wobble: with noisy_last, K=1 has inflated across-seed
    variance and any K>1 shrinks it, so gap-blind SE minimization must
    choose K>1; without it every K is equivalent up to trend (none here)
    and K=1 ties — select_k keeps the smallest."""
    rng = np.random.default_rng(0)
    per_seed = []
    for i in range(seeds):
        rec = {"seed": 1000 + i, "eval_last_k": window}
        for side in ("ref", "our"):
            pe_all = {}
            for m in KEYS:
                base = {"MRR": 0.8, "mIoU": 0.2}.get(m, 70.0)
                series = [base] * window
                if noisy_last:
                    series[-1] = base + float(rng.normal(0.0, 0.1 * base))
                pe_all[m] = series
                rec[f"{side}_{m}"] = float(np.mean(series))
            rec[f"{side}_per_epoch"] = pe_all
        per_seed.append(rec)
    summary = {"mode": "dropout_paper", "seeds": seeds, "rows": 768,
               "epochs": 10, "bs": 32, "eval_last_k": window,
               "family_size": 32, "family_delta": 0.15,
               "all_compatible": True, "wall_s": 0.0}
    return {"summary": summary, "stats": {}, "per_seed": per_seed}


def _run_stats(tmp_path, blob, stats_k):
    src = tmp_path / "in.json"
    with open(src, "w") as f:
        json.dump(blob, f)
    workdir = tmp_path / "out"
    os.makedirs(workdir, exist_ok=True)
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "ab_trained_behavior.py"),
         "--dropout", "paper", "--stats-from", str(src),
         "--stats-k", stats_k, "--workdir", str(workdir),
         "--report", str(tmp_path / "report.md")],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    with open(workdir / "ab_dropout_report.json") as f:
        return out.stdout, json.load(f)


def test_auto_k_picks_average_when_last_epoch_is_noisy(tmp_path):
    stdout, rep = _run_stats(tmp_path, _mk_blob(noisy_last=True), "auto")
    assert "# stats-k: averaging window K=" in stdout
    k = rep["summary"]["eval_last_k"]
    assert k > 1, f"snapshot noise dominates yet auto kept K={k}"
    # resolution quantum shrinks by 1/K
    assert rep["stats"]["R1"]["resolution"] == pytest.approx(
        100.0 / 768 / k)
    # averaged headline must equal the mean of the last K per-epoch values
    rec = rep["per_seed"][0]
    want = float(np.mean(rec["ref_per_epoch"]["R1"][-k:]))
    assert rec["ref_R1"] == pytest.approx(want)


def test_fixed_k_reaverages_exactly(tmp_path):
    _, rep = _run_stats(tmp_path, _mk_blob(noisy_last=True), "3")
    assert rep["summary"]["eval_last_k"] == 3
    for rec in rep["per_seed"]:
        for side in ("ref", "our"):
            for m in KEYS:
                want = float(np.mean(rec[f"{side}_per_epoch"][m][-3:]))
                assert rec[f"{side}_{m}"] == pytest.approx(want)


def test_auto_k_keeps_1_when_series_is_flat(tmp_path):
    stdout, rep = _run_stats(tmp_path, _mk_blob(noisy_last=False), "auto")
    # zero variance at every K: the tie must fall to the smallest window
    assert rep["summary"]["eval_last_k"] == 1
