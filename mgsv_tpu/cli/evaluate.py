"""Eval CLI: `python -m mgsv_tpu.cli.evaluate --ckpt <dir|tag> ...`.

Replaces test-MaDe.py: loads a checkpoint (ours via orbax, or a reference
`pytorch_model.bin.*` via the torch importer), runs the shared evaluator on
the chosen split, prints metrics, optionally dumps per-sample JSON
(test-MaDe.py:436-440 / utils/util_test.py:202-226).  `--test-best` sweeps
the four best-metric checkpoints like test-MaDe.py:491-501.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import jax

from mgsv_tpu.config import Config
from mgsv_tpu.cli.train import parse_overrides


def _load_params(path_or_tag: str, run_dir: str, cfg: Config, example_init):
    if path_or_tag.endswith(".bin") or ".bin." in path_or_tag:
        from mgsv_tpu.interop.torch_import import load_reference_checkpoint
        return load_reference_checkpoint(path_or_tag, cfg)
    from mgsv_tpu.core.checkpoint import CheckpointManager
    mgr = CheckpointManager(run_dir)
    restored = mgr.restore(path_or_tag)
    return restored["params"]


def _epoch_sweep_tags(ckpt, run_dir):
    """All-epoch checkpoint scan, sorted by epoch — test-MaDe.py:502-528.

    The reference scans `pytorch_model.bin.{0..epochs}` and skips missing
    files; here both checkpoint formats are swept: orbax `ckpt_epoch_{N}`
    dirs under --run-dir (written by Trainer when train.save_every_epoch),
    and reference `pytorch_model.bin.{N}` files when --ckpt is a directory.
    """
    import re

    tags = []
    if ckpt and os.path.isdir(ckpt):
        for name in os.listdir(ckpt):
            m = re.fullmatch(r"pytorch_model\.bin\.(\d+)", name)
            if m:
                tags.append((int(m.group(1)), os.path.join(ckpt, name)))
    elif run_dir and os.path.isdir(run_dir):
        for name in os.listdir(run_dir):
            m = re.fullmatch(r"ckpt_epoch_(\d+)", name)
            if m:
                tags.append((int(m.group(1)), f"epoch_{m.group(1)}"))
    return [tag for _, tag in sorted(tags)]


def main(argv=None):
    from mgsv_tpu.core.cache import enable as _enable_cache
    _enable_cache()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    argv = argv if argv is not None else sys.argv[1:]
    parser = argparse.ArgumentParser("mgsv-tpu-eval", add_help=True)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="orbax tag (with --run-dir) or reference .bin path")
    parser.add_argument("--run-dir", type=str, default=None)
    parser.add_argument("--test-best", action="store_true",
                        help="sweep best_{r1,iou,r1iou05,r1iou07} checkpoints")
    parser.add_argument("--sweep-epochs", action="store_true",
                        help="evaluate every per-epoch checkpoint "
                             "(test-MaDe.py:502-528): orbax ckpt_epoch_* under "
                             "--run-dir, or pytorch_model.bin.* when --ckpt "
                             "is a directory of reference checkpoints")
    parser.add_argument("--split", choices=["val", "test"], default="test")
    parser.add_argument("--save-json", type=str, default=None)
    parser.add_argument("--fused-sim", action="store_true",
                        help="use the fused Pallas X-Pool similarity kernel")
    parser.add_argument("--export-torch", type=str, default=None,
                        help="convert the loaded checkpoint to a reference-"
                             "format torch .bin at PATH and exit (interop."
                             "torch_export; load it with the reference's own "
                             "test-MaDe.py)")
    known, rest = parser.parse_known_args(argv)
    _, overrides = parse_overrides(rest)
    cfg = Config.from_overrides(overrides)

    import os.path as osp
    from mgsv_tpu.core import dist
    from mgsv_tpu.core import mesh as mesh_lib
    from mgsv_tpu.data.dataset import MgsvDataset
    from mgsv_tpu.eval.evaluator import evaluate
    from mgsv_tpu.models.made import MaDe

    # Multi-process launch (the reference's test script itself runs under
    # the launcher — test-MaDe.py:25 init_process_group): one log stream,
    # primary-gated prints/writes, the global mesh plumbed into evaluate().
    multiproc = dist.process_count() > 1
    if multiproc and not dist.is_primary():
        logging.getLogger().setLevel(logging.WARNING)

    # Same mesh policy as the Trainer: all devices on dp unless configured.
    mesh = mesh_lib.make_mesh(
        cfg.train.mesh_shape if cfg.train.mesh_shape != (1, 1)
        else (len(jax.devices()), 1))

    csv = cfg.data.test_csv if known.split == "test" else cfg.data.val_csv
    data = MgsvDataset.open(
        csv,
        osp.join(cfg.data.feature_root, "video_store"),
        osp.join(cfg.data.feature_root, "music_store"),
        cfg.data.max_m_duration)
    # Device residency — SAME policy as the Trainer (train/loop.py): "on"
    # forces it, "auto" enables it on accelerator backends when the stores
    # fit the per-device budget (dp-sharded tables divide by dp).  On
    # multi-device meshes the resident tables dp-shard exactly like
    # training — essential for checkpoint sweeps, which re-iterate the
    # data once per checkpoint.
    use_dev_data = (cfg.train.device_data == "on" or (
        cfg.train.device_data == "auto"
        and jax.default_backend() not in ("cpu",)))
    if use_dev_data:
        from mgsv_tpu.data.device_data import (DeviceResidentData,
                                               dataset_device_bytes)
        dp = max(1, mesh.shape.get(mesh_lib.DATA_AXIS, 1))
        if (cfg.train.device_data == "on"
                or dataset_device_bytes(data) // dp < 6 << 30):
            res_mesh = mesh if mesh.devices.size > 1 else None
            logging.info("device-resident dataset enabled%s",
                         f" (tables dp-sharded over {dp} devices)"
                         if res_mesh is not None else "")
            data = DeviceResidentData(data, mesh=res_mesh)

    import functools

    model = MaDe(cfg, mesh=mesh if mesh.devices.size > 1 else None)
    batch, _ = next(iter(data.epoch_batches(cfg.train.batch_size_val,
                                            shuffle=False, drop_last=False)))
    init_params = jax.jit(functools.partial(model.init, deterministic=True))(
        jax.random.PRNGKey(0), batch["frame_feats"], batch["frame_mask"],
        batch["segment_feats"], batch["segment_mask"])

    if known.test_best:
        tags = ["best_r1", "best_iou", "best_r1iou05", "best_r1iou07"]
    elif known.sweep_epochs:
        tags = _epoch_sweep_tags(known.ckpt, known.run_dir)
        if not tags:
            raise SystemExit("--sweep-epochs found no per-epoch checkpoints "
                             f"(ckpt={known.ckpt!r} run_dir={known.run_dir!r})")
        logging.info("sweeping %d epoch checkpoints: %s ... %s",
                     len(tags), tags[0], tags[-1])
    else:
        tags = [known.ckpt]
    # one jitted eval step shared across the sweep — without this every
    # checkpoint recompiles the program (minutes each over a remote chip)
    from mgsv_tpu.train.step import make_eval_step
    shared_eval_step = make_eval_step(model, cfg)

    all_results = {}
    for tag in tags:
        if tag is None:
            params = init_params
            tag = "random_init"
        else:
            try:
                params = _load_params(tag, known.run_dir or ".", cfg, init_params)
            except FileNotFoundError:
                logging.warning("checkpoint %s missing, skipped", tag)
                continue
        if known.export_torch:
            from mgsv_tpu.interop.torch_export import save_reference_checkpoint
            out = known.export_torch
            if len(tags) > 1:
                # sweep mode: one file per checkpoint, tag-suffixed —
                # a single path would silently export only the first tag
                out = f"{out}.{os.path.basename(str(tag))}"
            if dist.is_primary():        # one writer per run
                save_reference_checkpoint(params, cfg, out)
                logging.info("exported %s -> %s (reference torch format)",
                             tag, out)
            all_results[tag] = {"exported": out}
            continue
        res = evaluate(model, params, data, cfg, eval_step=shared_eval_step,
                       mesh=mesh, use_fused_sim=known.fused_sim)
        summary = {**res["retrieval"], **res["localization"], **res["composite"]}
        summary.pop("cols", None)
        all_results[tag] = summary
        # every process computes identical metrics (allgathered embeddings,
        # replicated similarity); exactly ONE prints and writes — the
        # reference's local_rank == 0 gating (test-MaDe.py, SURVEY.md §5)
        if dist.is_primary():
            print(tag, json.dumps(summary, indent=2, default=float))
        if known.save_json and dist.is_primary():
            from mgsv_tpu.eval.metrics import save_results_json
            loc_results = [
                dict(video_id=v, music_id=m, m_duration=float(d),
                     gt_moment=g.tolist(), pred_st=float(p[0]), pred_ed=float(p[1]))
                for v, m, d, g, p in zip(
                    res["video_ids"], res["music_ids"],
                    data.index.m_duration, data.index.gt_moment,
                    res["pred_spans"])
            ]
            save_results_json(res["ret_results"], loc_results, res["ious"],
                              known.save_json, cfg.data.max_m_duration)
    # one machine-parsable line per process (the multi-process CLI test
    # asserts metrics are identical across ranks and vs single-process)
    digest = {"process": jax.process_index(),
              "results": {str(t): ({k: float(v) for k, v in r.items()}
                                   if "exported" not in r else r)
                          for t, r in all_results.items()}}
    print("EVAL_RESULT " + json.dumps(digest, default=float), flush=True)
    if multiproc:
        # co-exit: non-primary processes wait for the primary's writes
        dist.barrier("evaluate-end")
    return all_results


if __name__ == "__main__":
    main()
