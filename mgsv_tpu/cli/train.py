"""Train CLI: `python -m mgsv_tpu.cli.train [--key value ...]`.

One typed-config entry point replacing the reference's ~100 argparse flags
duplicated across train-MaDe.py:27-173 / test-MaDe.py:27-175 and the bash
env-var blocks in scripts/*.sh.  Overrides use dotted section.key paths,
e.g. `--train.epochs 100 --data.feature_root features/Kuai_feature`.
Defaults are the paper configuration (see mgsv_tpu.config).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys

from mgsv_tpu.config import Config


def parse_overrides(argv):
    parser = argparse.ArgumentParser("mgsv-tpu-train", add_help=True)
    parser.add_argument("--config-json", type=str, default=None,
                        help="path to a full config JSON to start from")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="train on a generated synthetic dataset of N rows")
    parser.add_argument("--synthetic-family-size", type=int, default=1,
                        help="confusable-track family size for --synthetic "
                             "(>1 makes retrieval non-saturating: R@1 starts "
                             "near 100/family_size and must be learned)")
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu", "axon"],
                        help="force the JAX platform in-process (reliable "
                             "even where sitecustomize ignores JAX_PLATFORMS)")
    parser.add_argument("--cpu-devices", type=int, default=None,
                        help="with --platform cpu: number of virtual devices")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host: coordinator address host:port "
                             "(the reference's init_process_group, "
                             "train-MaDe.py:25)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    known, rest = parser.parse_known_args(argv)
    if known.coordinator is not None:
        # multi-host: platform forcing must ride through dist.initialize,
        # before the backend exists (tests/mp_worker.py is the template)
        from mgsv_tpu.core import dist
        dist.initialize(known.coordinator, known.num_processes,
                        known.process_id, platform=known.platform,
                        num_cpu_devices=known.cpu_devices)
    else:
        from mgsv_tpu.core.platform import force_platform
        force_platform(known.platform, known.cpu_devices)
    return known, parse_kv_overrides(rest)


def parse_kv_overrides(rest):
    """`--section.key value` / `--section.key=value` pairs -> dict."""
    overrides = {}
    it = iter(rest)
    for key in it:
        if not key.startswith("--"):
            raise SystemExit(f"expected --section.key, got {key}")
        if "=" in key:                       # --section.key=value form
            key, raw = key.split("=", 1)
        else:
            raw = next(it, None)
            if raw is None:
                raise SystemExit(f"missing value for {key}")
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        overrides[key[2:]] = value
    return overrides


def main(argv=None):
    from mgsv_tpu.core.cache import enable as _enable_cache
    _enable_cache()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s")
    known, overrides = parse_overrides(argv if argv is not None else sys.argv[1:])
    cfg = Config.from_overrides(overrides)

    from mgsv_tpu.core import dist
    multiproc = dist.process_count() > 1
    if multiproc and not dist.is_primary():
        # one log stream per run (the reference's local_rank == 0 gating on
        # all output, SURVEY.md §5) — non-primary processes stay quiet
        # unless something is actually wrong
        logging.getLogger("mgsv_tpu").setLevel(logging.WARNING)

    from mgsv_tpu.data.dataset import MgsvDataset
    from mgsv_tpu.train.loop import Trainer

    if known.synthetic:
        from mgsv_tpu.data import synthetic
        root = os.path.join(cfg.train.output_dir, "synthetic_data")
        if dist.is_primary():
            synthetic.generate(root, n_rows=known.synthetic,
                               data_cfg=cfg.data,
                               family_size=known.synthetic_family_size)
        if multiproc:
            # single writer: everyone else opens after the barrier
            dist.barrier("synthetic-data")
        train_data = val_data = synthetic.open_synthetic(root, cfg.data)
    else:
        feature_root = cfg.data.feature_root
        train_data = MgsvDataset.open(
            cfg.data.train_csv,
            os.path.join(feature_root, "video_store"),
            os.path.join(feature_root, "music_store"),
            cfg.data.max_m_duration)
        val_data = MgsvDataset.open(
            cfg.data.val_csv,
            os.path.join(feature_root, "video_store"),
            os.path.join(feature_root, "music_store"),
            cfg.data.max_m_duration)

    trainer = Trainer(cfg, train_data=train_data, val_data=val_data)
    result = trainer.fit()
    if multiproc:
        # one machine-parsable line per process: the multi-process test
        # asserts per-epoch losses and final metrics are identical across
        # ranks (gradient sync through the global mesh is real, unlike the
        # reference's discarded DDP wrapper — SURVEY.md quirk #1)
        import jax
        digest = {
            "process": jax.process_index(),
            "losses": [r["train"]["loss"] for r in result["history"]],
            "eval_R1": [r["eval"]["R1"] for r in result["history"]
                        if "eval" in r],
            "eval_mIoU": [r["eval"]["mIoU"] for r in result["history"]
                          if "eval" in r],
            "best": result["best"],
        }
        print("MP_RESULT " + json.dumps(digest, default=float), flush=True)
    if dist.is_primary():
        print(json.dumps({"best": result["best"]}, indent=2, default=float))


if __name__ == "__main__":
    main()
