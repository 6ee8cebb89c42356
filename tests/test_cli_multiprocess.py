"""Production multi-process training entry, driven end-to-end (VERDICT r3 #1).

Launches `python -m mgsv_tpu.cli.train --coordinator ...` itself — not a
hand-rolled worker — as 2 OS processes x 4 virtual CPU devices (gloo), on a
shared synthetic dataset, and asserts:

  * per-epoch train losses and eval metrics are bit-identical across ranks
    (gradients genuinely sync through the global mesh — unlike the
    reference, whose DDP wrapper is discarded before training,
    train-MaDe.py:241, SURVEY.md quirk #1);
  * exactly ONE checkpoint tree and ONE TensorBoard event stream are
    written (rank-0 gating, the reference's local_rank == 0 checks);
  * metrics match a single-process run on the same data and global mesh
    shape (dp=8 either way), so the launcher changes distribution, not math.

Reference being matched: scripts/train_kuai_all_feature.sh ->
torch.distributed.launch train-MaDe.py:25; sampler
dataloaders/data_dataloaders.py:11.
"""

import glob
import json
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "--synthetic", "32",
    "--data.max_v_frames", "6", "--data.stride", "40.0",
    "--data.filter_sec", "40.0", "--data.vit_dim", "24",
    "--data.ast_dim", "32",
    "--model.dim_input", "16", "--model.temporal_mlp_dim", "32",
    "--model.detr_ffn_dim", "32", "--model.detr_enc_layers", "1",
    "--model.detr_dec_layers", "2", "--model.temporal_heads", "2",
    "--model.detr_heads", "2", "--model.contrastive_dim", "16",
    "--model.video_pe_len", "8", "--model.audio_pe_len", "8",
    "--model.compute_dtype", "float32",
    "--train.epochs", "2", "--train.batch_size_train", "16",
    "--train.batch_size_val", "16", "--train.device_data", "off",
]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["TF_CPP_MIN_LOG_LEVEL"] = "3"
    return env


def _run_single(out_dir: str, extra=()) -> dict:
    cmd = [sys.executable, "-m", "mgsv_tpu.cli.train",
           "--platform", "cpu", "--cpu-devices", "8",
           *TINY, *extra, "--train.output_dir", out_dir]
    p = subprocess.run(cmd, cwd=REPO, env=_clean_env(), timeout=600,
                       capture_output=True, text=True)
    assert p.returncode == 0, p.stdout[-4000:] + p.stderr[-4000:]
    with open(os.path.join(out_dir, "made", "history.json")) as f:
        return {"history": json.load(f)}


def _run_multi(out_dir: str, extra=()) -> dict:
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "mgsv_tpu.cli.train",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--platform", "cpu", "--cpu-devices", "4",
             *TINY, *extra, "--train.output_dir", out_dir],
            cwd=REPO, env=_clean_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-6000:]}"
    digests = {}
    for pid, out in enumerate(outs):
        m = re.search(r"MP_RESULT (\{.*\})", out)
        assert m, f"no MP_RESULT from rank {pid}:\n{out[-6000:]}"
        digests[pid] = json.loads(m.group(1))
        assert digests[pid]["process"] == pid
    return digests


@pytest.mark.slow
def test_cli_train_coordinator_end_to_end(tmp_path):
    sp_dir = str(tmp_path / "single")
    mp_dir = str(tmp_path / "multi")

    single = _run_single(sp_dir)
    digests = _run_multi(mp_dir)

    # 1) bit-identical losses and metrics across ranks: the replicated loss
    # comes out of ONE SPMD program on the global mesh
    assert digests[0]["losses"] == digests[1]["losses"]
    assert digests[0]["eval_R1"] == digests[1]["eval_R1"]
    assert digests[0]["eval_mIoU"] == digests[1]["eval_mIoU"]
    assert len(digests[0]["losses"]) == 2

    # 2) exactly one checkpoint tree + one TB event stream under the run dir
    # (best_r1iou05 uses strict > and stays 0.0 on this tiny run, so it is
    # legitimately never saved — BestMetricTracker policy)
    run_dir = os.path.join(mp_dir, "made")
    saved = {t for t, v in digests[0]["best"].items() if v["epoch"] > 0}
    for tag in ({"best_r1", "best_iou"} & saved) | {"last"}:
        assert os.path.isdir(os.path.join(run_dir, f"ckpt_{tag}")), tag
    events = glob.glob(os.path.join(run_dir, "events.out.tfevents.*"))
    assert len(events) == 1, events
    assert os.path.exists(os.path.join(run_dir, "history.json"))

    # 3) equal to the single-process run on the same data + global mesh
    # shape (dp=8 both ways).  Losses may differ in the last float bits
    # (gloo cross-process reduction order vs in-process), so allclose with
    # a tight tolerance; the quantized metrics must agree exactly.
    sp_hist = single["history"]
    sp_losses = [r["train"]["loss"] for r in sp_hist]
    np.testing.assert_allclose(digests[0]["losses"], sp_losses,
                               rtol=2e-4, atol=1e-5)
    assert digests[0]["eval_R1"] == [r["eval"]["R1"] for r in sp_hist]
    np.testing.assert_allclose(
        digests[0]["eval_mIoU"], [r["eval"]["mIoU"] for r in sp_hist],
        rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_cli_train_coordinator_resume(tmp_path):
    """Checkpoint/resume across the process boundary: a 2-process run
    stopped after epoch 1 and resumed from the collective 'last'
    checkpoint (params + typed opt_state + step, orbax) finishes with the
    same losses and metrics as an uninterrupted single-process 3-epoch run
    on the same data and global mesh shape.  Constant LR so the schedule
    horizon (total_steps derives from --train.epochs) doesn't differ
    between the 1-epoch first leg and the uninterrupted run.  The
    reference cannot do this at all: its resume helper exists but the
    train loop never calls it (utils/util_train.py:38-60, SURVEY.md §5).
    """
    const = ["--train.scheduler", "constant"]

    sp = _run_single(str(tmp_path / "single"),
                     extra=[*const, "--train.epochs", "3"])
    sp_hist = sp["history"]
    assert [r["epoch"] for r in sp_hist] == [1, 2, 3]

    mp_dir = str(tmp_path / "multi")
    leg1 = _run_multi(mp_dir, extra=[*const, "--train.epochs", "1"])
    assert len(leg1[0]["losses"]) == 1
    assert os.path.isdir(os.path.join(mp_dir, "made", "ckpt_last"))

    leg2 = _run_multi(mp_dir, extra=[*const, "--train.epochs", "3",
                                     "--train.resume", "last"])
    # resumed history merges the pre-resume epochs from history.json
    assert len(leg2[0]["losses"]) == 3
    assert leg2[0]["losses"] == leg2[1]["losses"]      # ranks still agree
    assert leg2[0]["losses"][0] == leg1[0]["losses"][0]  # epoch 1 untouched

    sp_losses = [r["train"]["loss"] for r in sp_hist]
    np.testing.assert_allclose(leg2[0]["losses"], sp_losses,
                               rtol=2e-4, atol=1e-5)
    assert leg2[0]["eval_R1"][-1] == sp_hist[-1]["eval"]["R1"]
    np.testing.assert_allclose(
        leg2[0]["eval_mIoU"][-1], sp_hist[-1]["eval"]["mIoU"],
        rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_cli_train_coordinator_device_resident(tmp_path):
    """Device-resident dataset under the production multi-process entry
    (VERDICT r4 #1): `cli.train --coordinator --train.device_data on` runs
    the fastest input path — global dp-sharded resident tables, each
    process uploading only the rows its devices own, batches assembled by
    the shard_map psum_scatter gather — and its losses are BIT-IDENTICAL
    to the host-pipeline multi-process run on the same data and mesh
    (same SPMD train program, same batch values, same shardings).
    Reference being matched: the DistributedSampler shard role,
    dataloaders/data_dataloaders.py:11."""
    host = _run_multi(str(tmp_path / "host"))          # TINY: device_data off
    dev = _run_multi(str(tmp_path / "dev"),
                     extra=["--train.device_data", "on"])

    # ranks agree with each other...
    assert dev[0]["losses"] == dev[1]["losses"]
    assert dev[0]["eval_R1"] == dev[1]["eval_R1"]
    # ...and the resident input path changes NOTHING about the math:
    # bit-identical losses and metrics vs the host-pipeline launch
    assert dev[0]["losses"] == host[0]["losses"]
    assert dev[0]["eval_R1"] == host[0]["eval_R1"]
    assert dev[0]["eval_mIoU"] == host[0]["eval_mIoU"]
    assert len(dev[0]["losses"]) == 2


def _run_eval_single(out_dir: str, run_dir: str, extra=()) -> dict:
    cmd = [sys.executable, "-m", "mgsv_tpu.cli.evaluate",
           "--platform", "cpu", "--cpu-devices", "8",
           "--ckpt", "last", "--run-dir", run_dir, "--split", "val",
           "--data.val_csv", os.path.join(out_dir, "synthetic_data", "data.csv"),
           "--data.feature_root", os.path.join(out_dir, "synthetic_data"),
           *TINY, *extra]
    p = subprocess.run(cmd, cwd=REPO, env=_clean_env(), timeout=600,
                       capture_output=True, text=True)
    assert p.returncode == 0, p.stdout[-4000:] + p.stderr[-4000:]
    m = re.search(r"EVAL_RESULT (\{.*\})", p.stdout)
    assert m, f"no EVAL_RESULT:\n{p.stdout[-4000:]}"
    return json.loads(m.group(1))


def _run_eval_multi(out_dir: str, run_dir: str, extra=()) -> dict:
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "mgsv_tpu.cli.evaluate",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--platform", "cpu", "--cpu-devices", "4",
             "--ckpt", "last", "--run-dir", run_dir, "--split", "val",
             "--data.val_csv",
             os.path.join(out_dir, "synthetic_data", "data.csv"),
             "--data.feature_root", os.path.join(out_dir, "synthetic_data"),
             *TINY, *extra],
            cwd=REPO, env=_clean_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    digests = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-6000:]}"
        m = re.search(r"EVAL_RESULT (\{.*\})", out)
        assert m, f"no EVAL_RESULT from rank {pid}:\n{out[-6000:]}"
        digests[pid] = json.loads(m.group(1))
        assert digests[pid]["process"] == pid
    return digests


@pytest.mark.slow
def test_cli_evaluate_coordinator(tmp_path):
    """Multi-process-safe evaluation entry (VERDICT r4 #2): the reference's
    test script itself runs under the launcher (test-MaDe.py:25
    init_process_group); `cli.evaluate --coordinator` must produce metrics
    identical across ranks AND identical to a single-process evaluation of
    the same checkpoint on the same data/global mesh, with exactly one
    --save-json file written (primary-gated).  A second multi-process pass
    with --train.device_data on exercises the dp-sharded resident eval
    path (scan + allgather) to the same metrics."""
    out_dir = str(tmp_path / "train")
    _run_single(out_dir)                               # mints ckpt_last
    run_dir = os.path.join(out_dir, "made")

    sp_json = str(tmp_path / "sp.json")
    sp = _run_eval_single(out_dir, run_dir,
                          extra=["--save-json", sp_json])

    mp_json = str(tmp_path / "mp.json")
    mp = _run_eval_multi(out_dir, run_dir, extra=["--save-json", mp_json])

    # ranks agree with each other, and with the single-process run
    assert mp[0]["results"] == mp[1]["results"]
    assert mp[0]["results"] == sp["results"]

    # exactly one JSON written by the multi-process launch, with the same
    # per-sample content as the single-process one
    with open(mp_json) as f:
        mp_rows = json.load(f)
    with open(sp_json) as f:
        sp_rows = json.load(f)
    assert mp_rows == sp_rows
    assert len(mp_rows) == 32

    # device-resident multi-process eval: same metrics, same rank agreement
    res = _run_eval_multi(out_dir, run_dir,
                          extra=["--train.device_data", "on"])
    assert res[0]["results"] == res[1]["results"]
    assert res[0]["results"] == sp["results"]
