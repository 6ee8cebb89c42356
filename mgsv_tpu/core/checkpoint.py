"""Checkpointing: orbax-backed {params, opt_state, step} with best-metric aliases.

TPU-native equivalent of utils/util_train.py:21-60: the reference writes
`pytorch_model.bin.{epoch}` plus four best-metric files
(`.best_{r1,iou,r1iou05,r1iou07}`, train-MaDe.py:707-727); here each tag is
an orbax directory under the run dir, saved asynchronously off the device
sync path.
"""

from __future__ import annotations

import logging
import os
import shutil
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

logger = logging.getLogger("mgsv_tpu")


class CheckpointManager:
    def __init__(self, run_dir: str):
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.run_dir, f"ckpt_{tag}")

    def save(self, tag: str, state: Dict[str, Any]) -> str:
        """state: pytree of HOST arrays (e.g. {"params", "opt_state", "step"}).

        Multi-process: COLLECTIVE — every process must call save with the
        same tag sequence (save decisions derive from replicated losses and
        allgathered metrics, so they agree by construction).  Orbax writes
        host/replicated arrays from the primary only — exactly one
        checkpoint tree per run, the reference's rank-0 gating
        (train-MaDe.py:707-727) — and runs its own cross-process barriers;
        a primary-only gate here would deadlock rank 0 inside that barrier
        (observed: orbax save hang under the 2-process CLI launch).

        The "last" tag — the ONLY resume point, rewritten every
        checkpoint_every_steps — is rotated crash-atomically: orbax's
        `force=True` deletes the existing directory before the tmp-dir
        rename that commits the new one, so a SIGKILL inside that window
        would destroy the previous resume point before the replacement
        exists.  Instead the committed "last" is renamed (atomic) to
        `ckpt_last.prev` and the new save commits under the primary name
        with no deletion in between; restore/exists fall back to `.prev`.
        At every instant of a kill there is a complete resume point on
        disk once the first save has committed.
        """
        path = self._path(tag)
        if tag == "last" and os.path.isdir(path):
            from mgsv_tpu.core import dist
            # join the previous async save first so `path` is a COMMITTED
            # checkpoint when rotated (orbax's async save would join it
            # anyway before starting this one)
            self._ckptr.wait_until_finished()
            if dist.is_primary():
                prev = path + ".prev"
                if os.path.isdir(prev):
                    shutil.rmtree(prev)
                os.rename(path, prev)
            # force=True: nothing left at `path` on the primary (just
            # renamed away), and it stops a non-primary rank that reaches
            # orbax's exists-check before the rename from raising
            self._ckptr.save(path, state, force=True)
        else:
            self._ckptr.save(path, state, force=True)
        return path

    def _resolve(self, tag: str) -> str:
        path = self._path(tag)
        if not os.path.isdir(path) and os.path.isdir(path + ".prev"):
            logger.warning(
                "checkpoint %s is missing but its rotation backup exists — "
                "a kill landed between rotation and commit; restoring "
                "%s.prev (one save interval older)", path, path)
            return path + ".prev"
        return path

    def restore(self, tag: str, target: Optional[Dict[str, Any]] = None):
        self._ckptr.wait_until_finished()
        return self._ckptr.restore(self._resolve(tag), target=target)

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self._resolve(tag))

    def wait(self):
        self._ckptr.wait_until_finished()


class BestMetricTracker:
    """Best-metric checkpoint policy — train-MaDe.py:707-727.

    Tracks R1, R5, mIoU, R1_iou0.5, R1_iou0.7; `update` returns the list of
    best-checkpoint tags that improved this epoch.
    """

    WATCH = {
        "best_r1": ("R1", True),            # >= keeps latest on ties (:709)
        "best_r5": ("R5", True),            # tracked but not checkpointed (:713)
        "best_iou": ("mIoU", True),
        "best_r1iou05": ("R1_iou0.5", False),  # strict > (:720)
        "best_r1iou07": ("R1_iou0.7", True),
    }
    SAVED = ("best_r1", "best_iou", "best_r1iou05", "best_r1iou07")

    def __init__(self):
        self.best = {tag: {"value": 0.0, "epoch": 0} for tag in self.WATCH}

    def update(self, epoch: int, metrics: Dict[str, float]):
        improved = []
        for tag, (key, ties_keep) in self.WATCH.items():
            value = float(metrics.get(key, 0.0))
            cur = self.best[tag]["value"]
            better = value >= cur if ties_keep else value > cur
            if better:
                self.best[tag] = {"value": value, "epoch": epoch}
                if tag in self.SAVED:
                    improved.append(tag)
        return improved

    def last_best_epoch(self) -> int:
        return max(v["epoch"] for v in self.best.values())

    def should_stop(self, epoch: int, min_epochs: int = 60, patience: int = 20) -> bool:
        """Early stop — train-MaDe.py:735-736."""
        return epoch >= max(min_epochs, self.last_best_epoch() + patience)
