"""The training loop: epochs, metrics, best-metric checkpoints, early stop.

One Trainer replaces the duplicated train-MaDe.py / test-MaDe.py loops
(SURVEY.md §1 "the training loop, eval loop, and CLI are duplicated").
Data-parallel by construction: batches are device_put with a dp-sharded
NamedSharding over the mesh and every step is one jit-compiled SPMD program
— gradients sync via XLA collectives, unlike the reference whose DDP
wrapper is discarded before training (train-MaDe.py:241, quirk #1;
intentionally fixed here).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from mgsv_tpu.config import Config
from mgsv_tpu.core import mesh as mesh_lib
from mgsv_tpu.core.checkpoint import BestMetricTracker, CheckpointManager
from mgsv_tpu.data.dataset import MgsvDataset
from mgsv_tpu.eval.evaluator import evaluate
from mgsv_tpu.models.made import MaDe
from mgsv_tpu.train.optimizer import make_optimizer
from mgsv_tpu.train.step import create_state, make_eval_step, make_train_step

logger = logging.getLogger("mgsv_tpu")


class Preempted(RuntimeError):
    """Injected preemption (train.abort_at_step fault injection): the run
    dies at an arbitrary step, exactly like a spot/maintenance kill.  The
    preemption tests assert that resuming from the step-granular 'last'
    checkpoint replays to a bit-identical final state with bounded lost
    work (tests/test_train_integration.py)."""


def _retype_like(live, restored):
    """Rebuild `restored` (an orbax-restored pure dict/list pytree) with the
    container types of `live` (the in-memory optax state).

    An untyped `tree_unflatten(tree_structure(live), tree_leaves(restored))`
    is WRONG in general: dicts flatten in sorted-key order while namedtuples
    (optax states) flatten in field order, so the leaf sequences differ —
    e.g. optax.MultiStepsState(mini_step, gradient_step, inner_opt_state,
    acc_grads, skip_state) restores as a dict whose sorted-key leaf order
    starts at acc_grads, silently reassigning every slot.  Walking the two
    trees in parallel and matching namedtuple fields BY NAME is order-proof.
    """
    if hasattr(live, "_fields"):                       # namedtuple node
        vals = []
        for i, f in enumerate(type(live)._fields):
            sub = (restored[f] if isinstance(restored, dict)
                   else restored[i])                   # positional fallback
            vals.append(_retype_like(getattr(live, f), sub))
        return type(live)(*vals)
    if isinstance(live, dict):
        return {k: _retype_like(v, restored[k]) for k, v in live.items()}
    if isinstance(live, (list, tuple)):
        return type(live)(
            _retype_like(v, restored[i]) for i, v in enumerate(live))
    if live is None:
        return None
    return restored                                    # leaf


@dataclasses.dataclass
class EpochStats:
    loss: float
    retrieval_loss: float
    localization_loss: float
    miou: float
    seconds: float
    steps: int
    clips_per_sec: float


class Trainer:
    def __init__(
        self,
        cfg: Config,
        train_data: Optional[MgsvDataset] = None,
        val_data: Optional[MgsvDataset] = None,
        mesh=None,
        run_dir: Optional[str] = None,
    ):
        self.cfg = cfg
        # Persistent compilation cache here, not only in the CLI entry: the
        # multi-process AOT-warmup in train_epoch relies on the post-barrier
        # dispatch hitting this cache (the lower().compile() result is not
        # jit's dispatch cache), so library users launching Trainer directly
        # must get the same rank-skew bound as the CLI path.
        from mgsv_tpu.core.cache import enable as _enable_cache
        _enable_cache()
        self.train_data = train_data
        self.val_data = val_data
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(
            cfg.train.mesh_shape if cfg.train.mesh_shape != (1, 1)
            else (len(jax.devices()), 1))
        # Device residency: upload the dataset once, gather batches on
        # device (data/device_data.py).  Biggest win over remote-TPU links
        # (measured: per-batch uploads at bs=512 cost ~8 s/step vs the
        # 55 ms compute); a PCIe-traffic win on local chips too.
        self.multiprocess = jax.process_count() > 1
        # Multi-process residency (VERDICT r4 #1): the resident tables are
        # GLOBAL dp-sharded arrays over the whole mesh — each process
        # device_puts only the rows its addressable devices own, and the
        # shard_map psum_scatter gather assembles batches over ICI exactly
        # as in the single-process multi-device case.  This is what lets
        # the fastest input path run under the production launcher at the
        # multi-host scale the launcher exists for (reference analogue:
        # the DistributedSampler shard, dataloaders/data_dataloaders.py:11).
        use_dev_data = train_data is not None and (
            cfg.train.device_data == "on" or (
                cfg.train.device_data == "auto"
                and jax.default_backend() not in ("cpu",)))
        if use_dev_data:
            from mgsv_tpu.data.device_data import (DeviceResidentData,
                                                   dataset_device_bytes)
            # multi-device meshes shard the resident tables over the dp
            # AXIS ONLY (data/device_data.py uses P(DATA_AXIS); tables are
            # replicated over mp), so the per-device budget divides by dp,
            # not by the total device count — dividing by devices.size
            # would under-estimate each device's footprint by the mp factor
            from mgsv_tpu.core.mesh import DATA_AXIS
            dp = max(1, self.mesh.shape.get(DATA_AXIS, 1))
            if (cfg.train.device_data == "on"
                    or dataset_device_bytes(train_data) // dp < 6 << 30):
                res_mesh = self.mesh if self.mesh.devices.size > 1 else None
                logger.info("device-resident dataset enabled%s",
                            f" (tables dp-sharded over {dp} devices)"
                            if res_mesh is not None else "")
                orig_train = train_data
                self.train_data = train_data = DeviceResidentData(
                    train_data, mesh=res_mesh)
                if val_data is not None:
                    # synthetic runs reuse the train dataset as val: share
                    # the uploaded copy instead of doubling HBM
                    self.val_data = val_data = (
                        train_data if val_data is orig_train else
                        DeviceResidentData(val_data, mesh=res_mesh))

        if self.mesh.devices.size > 1 and cfg.model.fused_xpool_sim:
            logger.info("multi-device mesh: fused X-Pool similarity runs "
                        "under shard_map over dp")
        self.run_dir = run_dir or os.path.join(
            cfg.train.output_dir, cfg.train.name)
        os.makedirs(self.run_dir, exist_ok=True)
        self.ckpt = CheckpointManager(self.run_dir) if cfg.train.save_checkpoints else None
        self.tracker = BestMetricTracker()

        self.model = MaDe(
            cfg, mesh=self.mesh if self.mesh.devices.size > 1 else None)
        steps_per_epoch = (
            train_data.num_batches(cfg.train.batch_size_train)
            if train_data is not None else 1)
        self.total_steps = steps_per_epoch * cfg.train.epochs
        self.tx = make_optimizer(cfg, self.total_steps,
                                 train_query_embed=cfg.train.train_query_embed)
        self.train_step = make_train_step(self.model, cfg)
        self.eval_step = make_eval_step(self.model, cfg)
        self.state = None
        self._tb = None

    def _emergency_save(self, epoch: int) -> None:
        """Write the epoch-start snapshot as a resumable 'last' checkpoint.

        Called when a non-finite loss is detected: the LIVE state has been
        through apply_gradients with NaN grads and is unusable, so the saved
        state is the clean one captured at the top of the epoch (resume
        re-trains the failed epoch).  When step-granular checkpointing has
        already written a VERIFIED-finite snapshot this epoch, that newer
        save is the resume point and must NOT be overwritten with the older
        epoch-start state.  Exercised by tests/test_train_integration.py
        fault-injection tests.
        """
        if self.ckpt is None:
            return
        if getattr(self, "_saved_in_epoch", 0):
            self.ckpt.wait()
            logger.error(
                "non-finite loss in epoch %d — resume point is the "
                "step-granular 'last' checkpoint (step_in_epoch %d, "
                "verified finite at save time)", epoch, self._saved_in_epoch)
            return
        if getattr(self, "_epoch_start_state", None):
            self.ckpt.save("last", self._epoch_start_state)
            self.ckpt.wait()
            logger.error(
                "non-finite loss in epoch %d — emergency 'last' checkpoint "
                "written from the epoch-start state (step %d)",
                epoch, self._epoch_start_state["step"])

    def _periodic_save(self, epoch: int, steps: int, window) -> None:
        """Step-granular 'last' checkpoint (train.checkpoint_every_steps):
        {params, opt_state, step, epoch, step_in_epoch}, saved only after
        verifying the loss window since the previous save is finite — a
        poisoned state must never become the resume point (detection
        latency and lost work are both bounded by N steps).  The host
        fetch of the window forces a device sync, which is the price of
        the verification."""
        vals = np.asarray([float(x) for x in window])
        if not np.isfinite(vals).all():
            self._emergency_save(epoch)
            bad = int(np.argmax(~np.isfinite(vals)))
            raise FloatingPointError(
                f"non-finite loss at epoch {epoch} step "
                f"{steps - len(vals) + bad + 1}: {vals[bad]} (resumable "
                "'last' checkpoint on disk; nothing poisoned was saved)")
        self.ckpt.save("last", {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": int(self.state.step),
            "epoch": epoch,
            "step_in_epoch": steps,
        })
        self._saved_in_epoch = steps

    def _to_host(self, x) -> np.ndarray:
        """Fetch a per-row device array to host; multi-process arrays are
        non-addressable and come back via a replicating allgather
        (core/dist.to_host, shared with the evaluator)."""
        from mgsv_tpu.core import dist
        return dist.to_host(x)

    # ------------------------------------------------------------------ setup
    def init_state(self, example_batch: Dict[str, Any], seed: Optional[int] = None):
        rng = jax.random.PRNGKey(self.cfg.train.seed if seed is None else seed)
        state = create_state(self.model, self.cfg, self.tx, rng, example_batch)
        self.state = mesh_lib.replicate(self.mesh, state)
        n_params = sum(x.size for x in jax.tree.leaves(state.params))
        logger.info("initialized %0.3fM trainable-head params on mesh %s",
                    n_params / 1e6, dict(zip(self.mesh.axis_names, self.mesh.devices.shape)))
        # Startup trainable/frozen audit (count_parameters /
        # show_model_architecture, train-MaDe.py:209-304).
        from mgsv_tpu.train.optimizer import log_param_audit
        log_param_audit(logger, state.params,
                        train_query_embed=self.cfg.train.train_query_embed)
        return self.state

    def _tb_writer(self):
        if self._tb is None:
            from mgsv_tpu.core import dist
            if not dist.is_primary():
                # exactly one TB stream per run: the reference gates every
                # writer on local_rank == 0 (train-MaDe.py:246-247)
                self._tb = False
                return None
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir=self.run_dir)
            except Exception:  # pragma: no cover
                self._tb = False
        return self._tb or None

    # ------------------------------------------------------------------ train
    def train_epoch(self, epoch: int, start_step: int = 0) -> EpochStats:
        """One epoch; `start_step` > 0 resumes MID-epoch: the seeded batch
        stream is fast-forwarded past the first `start_step` batches (the
        permutation is a pure function of (seed, epoch), so the remaining
        batches are exactly what an uninterrupted run would have seen) and
        the epoch's stats cover only the steps actually run here."""
        cfg = self.cfg
        assert self.train_data is not None
        if self.state is None:
            first = next(iter(self.train_data.epoch_batches(
                cfg.train.batch_size_train, shuffle=False)))[0]
            self.init_state(first)

        rng = jax.random.PRNGKey(cfg.train.seed + 977 * epoch)
        # Clean-state snapshot for the NaN guard below: once a non-finite
        # loss has gone through apply_gradients the live params are poisoned,
        # so the emergency checkpoint must come from BEFORE the failure —
        # one host fetch per epoch buys a resumable epoch-boundary state.
        self._saved_in_epoch = 0
        if self.ckpt is not None:
            self._epoch_start_state = {
                "params": jax.device_get(self.state.params),
                "opt_state": jax.device_get(self.state.opt_state),
                "step": int(self.state.step), "epoch": epoch - 1,
            }
            if start_step:
                # mid-epoch resume: the snapshot IS the restored mid-epoch
                # state — stamp it so a NaN right after resume goes back
                # to exactly this point, not to a fictitious epoch start
                self._epoch_start_state["epoch"] = epoch
                self._epoch_start_state["step_in_epoch"] = start_step
        t0 = time.time()
        losses, ret_losses, loc_losses, ious = [], [], [], []
        steps = start_step
        every = cfg.train.checkpoint_every_steps
        from mgsv_tpu.core.profiling import StepProfiler
        from mgsv_tpu.data.pipeline import prefetch_epoch
        profiler = StepProfiler(self.run_dir,
                                enabled=cfg.train.profile and epoch == 1)
        from mgsv_tpu.data.device_data import DeviceResidentData
        if isinstance(self.train_data, DeviceResidentData):
            # batches are assembled on device; no host pipeline needed
            iterator = self.train_data.epoch_batches(
                cfg.train.batch_size_train, shuffle=True,
                seed=cfg.train.seed, epoch=epoch, start_batch=start_step)
        else:
            iterator = prefetch_epoch(
                self.train_data, cfg.train.batch_size_train, shuffle=True,
                seed=cfg.train.seed, epoch=epoch, start_batch=start_step,
                sharding=mesh_lib.batch_sharding(self.mesh))
        for batch, _meta in iterator:
            profiler.step(steps)
            if self.multiprocess and not getattr(self, "_mp_warmed", False):
                # AOT-compile BEFORE the first dispatch, then align ranks:
                # gloo's transport init has a hardcoded ~30 s connect
                # deadline, and on loaded hosts concurrent jit compiles can
                # skew ranks past it — the leading rank's first collective
                # then dies with "Gloo context initialization failed".
                # Compiling first (pure host work, no collective) and
                # barriering via the coordination service bounds the skew
                # at dispatch to the barrier's own sync.
                self.train_step.lower(self.state, batch, rng).compile()
                from mgsv_tpu.core import dist
                dist.barrier("train-step-compiled")
                self._mp_warmed = True
            self.state, log = self.train_step(self.state, batch, rng)
            steps += 1
            # Failure detection (absent upstream, SURVEY.md §5): a non-finite
            # loss would silently poison every later step — abort loudly with
            # the offending step's stats instead.
            if steps % 50 == 1 and not np.isfinite(float(log["loss"])):
                self._emergency_save(epoch)
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch} step {steps}: "
                    f"{ {k: float(v) for k, v in log.items() if np.ndim(v) == 0} }"
                    " (resumable 'last' checkpoint on disk — the epoch-start"
                    " state, or the newest verified step-granular save)")
            losses.append(log["loss"])
            ret_losses.append(log["retrieval_loss"])
            loc_losses.append(log["localization_loss"])
            ious.append(log["train_iou"])
            if every and self.ckpt is not None and steps % every == 0:
                self._periodic_save(epoch, steps, losses[-every:])
            if (cfg.train.abort_at_step
                    and int(self.state.step) >= cfg.train.abort_at_step):
                raise Preempted(
                    f"injected preemption at global step "
                    f"{int(self.state.step)} (epoch {epoch} step {steps})")
            if steps % max(1, self.train_data.num_batches(
                    cfg.train.batch_size_train) // cfg.train.log_every) == 0:
                logger.info(
                    "epoch %d step %d loss %.4f (ret %.4f loc %.4f)",
                    epoch, steps, float(log["loss"]),
                    float(log["retrieval_loss"]), float(log["localization_loss"]))
                # per-step scalars (train-MaDe.py:399-410), fetched only at
                # log points to avoid a device sync every step
                tb = self._tb_writer()
                if tb:
                    global_step = int(self.state.step)
                    for key in ("loss", "retrieval_loss", "localization_loss",
                                "loss_span", "loss_label", "loss_giou",
                                "class_error", "loss_contrastive_align",
                                "grad_norm"):
                        if key in log:
                            tb.add_scalar(f"train/{key}", float(log[key]),
                                          global_step)
        profiler.close()
        # one device sync at epoch end — and a full-coverage finiteness
        # check over every step (the in-loop check above only samples every
        # 50th step to avoid a per-step device sync).
        step_losses = np.asarray([float(x) for x in losses])
        if not np.isfinite(step_losses).all():
            bad = int(np.argmax(~np.isfinite(step_losses)))
            self._emergency_save(epoch)
            raise FloatingPointError(
                f"non-finite loss at epoch {epoch} step "
                f"{start_step + bad + 1}: {step_losses[bad]} (resumable "
                "'last' checkpoint on disk — the epoch-start state, or the "
                "newest verified step-granular save)")
        dt = time.time() - t0
        ran = steps - start_step          # steps executed in THIS session
        if ran:
            loss = float(step_losses.mean())
            ret = float(np.mean([float(x) for x in ret_losses]))
            loc = float(np.mean([float(x) for x in loc_losses]))
            miou = float(np.mean(np.concatenate(
                [self._to_host(x) for x in ious])))
        else:
            # eval-only replay (restore found the epoch train-complete but
            # unrecorded): no steps ran, so there are no train stats
            loss = ret = loc = miou = float("nan")
        clips = ran * cfg.train.batch_size_train / dt if dt > 0 else 0.0
        stats = EpochStats(loss, ret, loc, miou, dt, ran, clips)
        tb = self._tb_writer()
        if tb:
            tb.add_scalar("train/loss_epoch", loss, epoch)
            tb.add_scalar("train/mIoU_epoch", miou, epoch)
            tb.add_scalar("train/clips_per_sec", clips, epoch)
        logger.info("epoch %d done: loss %.4f mIoU %.4f (%.1fs, %.1f clips/s)",
                    epoch, loss, miou, dt, clips)
        return stats

    # ------------------------------------------------------------------- eval
    def eval_epoch(self, epoch: int) -> Dict[str, Any]:
        assert self.val_data is not None and self.state is not None
        res = evaluate(self.model, self.state.params, self.val_data, self.cfg,
                       eval_step=self.eval_step, mesh=self.mesh)
        r, l, c = res["retrieval"], res["localization"], res["composite"]
        logger.info(
            "eval %d >>> R@1 %.2f R@5 %.2f R@10 %.2f MdR %.1f MRR %.4f | "
            "mIoU %.4f IoU@.5 %.2f IoU@.7 %.2f | R1^iou.5 %.2f R1^iou.7 %.2f",
            epoch, r["R1"], r["R5"], r["R10"], r["MedianR"], r["MRR"],
            l["mIoU"], l["IoU@0.5"], l["IoU@0.7"],
            c["R1_iou0.5"], c["R1_iou0.7"])
        tb = self._tb_writer()
        if tb:
            tb.add_scalar("eval/R1_epoch", r["R1"], epoch)
            tb.add_scalar("eval/mIoU_epoch", l["mIoU"], epoch)
        return res

    # ----------------------------------------------------------------- resume
    def _history_has_epoch(self, epoch: int) -> bool:
        """Whether the run's history.json already records `epoch` — i.e. the
        epoch's eval + write-through completed before a kill.  The file is
        written atomically (tmp + rename) so a partial read is impossible."""
        try:
            with open(os.path.join(self.run_dir, "history.json")) as f:
                return any(int(r["epoch"]) == int(epoch) for r in json.load(f))
        except (OSError, ValueError, KeyError):
            return False

    def restore(self, tag: str = "last") -> int:
        """Restore {params, opt_state, step, epoch[, step_in_epoch]} from a
        checkpoint.

        Returns the epoch to resume from and sets `self.resume_step`: an
        epoch-boundary checkpoint resumes fresh at saved epoch + 1
        (resume_step 0); a step-granular one (step_in_epoch > 0, written by
        train.checkpoint_every_steps) resumes the SAME epoch with the batch
        stream fast-forwarded past the completed steps.  The reference
        wires resume for test only (utils/util_train.py:38-60, never called
        by the train loop); here it is a first-class trainer feature.
        """
        assert self.ckpt is not None and self.ckpt.exists(tag), tag
        if self.state is None:
            first = next(iter(self.train_data.epoch_batches(
                self.cfg.train.batch_size_train, shuffle=False)))[0]
            self.init_state(first)
        # best_*/epoch_* tags carry params only; "last" also carries
        # opt_state — restore untyped and take what is present.
        restored = self.ckpt.restore(tag)
        replace = {
            "params": mesh_lib.replicate(self.mesh, restored["params"]),
            "step": int(restored["step"]),
        }
        if "opt_state" in restored:
            opt_state = _retype_like(self.state.opt_state,
                                     restored["opt_state"])
            replace["opt_state"] = mesh_lib.replicate(self.mesh, opt_state)
        else:
            logger.warning(
                "checkpoint %s has no optimizer state; resuming with a fresh "
                "optimizer", tag)
        self.state = self.state.replace(**replace)
        self.resume_step = int(restored.get("step_in_epoch", 0) or 0)
        saved_epoch = int(restored["epoch"])
        if self.resume_step and self.train_data is not None:
            per_epoch = self.train_data.num_batches(
                self.cfg.train.batch_size_train)
            if self.resume_step >= per_epoch:
                # saved at/after the epoch's final step: no train work left
                # in it — but only skip to the next epoch if the epoch's
                # eval/history record actually landed before the kill
                # (eval runs after the final periodic save; a kill during
                # it would otherwise silently drop that epoch's record)
                if self._history_has_epoch(saved_epoch):
                    self.resume_step = 0
                    logger.info("restored %s at step %d (epoch %d complete)",
                                tag, int(restored["step"]), saved_epoch)
                    return saved_epoch + 1
                self.resume_step = per_epoch
                logger.info(
                    "restored %s at step %d: epoch %d train-complete but "
                    "its record never landed (killed during eval?) — "
                    "replaying eval only", tag, int(restored["step"]),
                    saved_epoch)
                return saved_epoch
        if (not self.resume_step and saved_epoch >= 1
                and self.train_data is not None
                and not self._history_has_epoch(saved_epoch)):
            # epoch-boundary checkpoint whose epoch has no history record:
            # same kill window as above — redo the eval/record, not the
            # (already applied) train steps
            self.resume_step = self.train_data.num_batches(
                self.cfg.train.batch_size_train)
            logger.info(
                "restored %s at step %d: epoch %d checkpointed but its "
                "record never landed — replaying eval only", tag,
                int(restored["step"]), saved_epoch)
            return saved_epoch
        if self.resume_step:
            logger.info("restored %s at step %d (epoch %d, mid-epoch at "
                        "step %d)", tag, int(restored["step"]),
                        int(restored["epoch"]), self.resume_step)
            return int(restored["epoch"])
        logger.info("restored %s at step %d (epoch %d)", tag,
                    int(restored["step"]), int(restored["epoch"]))
        return int(restored["epoch"]) + 1

    # -------------------------------------------------------------------- fit
    def fit(self, epochs: Optional[int] = None) -> Dict[str, Any]:
        cfg = self.cfg
        epochs = epochs or cfg.train.epochs
        history = []
        start_epoch = 1
        resume_step = 0
        hist_path = os.path.join(self.run_dir, "history.json")
        if cfg.train.resume and self.ckpt:
            if not self.ckpt.exists(cfg.train.resume):
                # failing loudly beats silently retraining from scratch
                raise FileNotFoundError(
                    f"train.resume={cfg.train.resume!r} requested but no such "
                    f"checkpoint exists under {self.run_dir} — unset resume "
                    "to train from scratch")
            start_epoch = self.restore(cfg.train.resume)
            resume_step = getattr(self, "resume_step", 0)
            # continue the run's history instead of overwriting it (a
            # mid-epoch resume redoes its in-progress epoch's record)
            if os.path.exists(hist_path):
                with open(hist_path) as f:
                    history = [r for r in json.load(f)
                               if r["epoch"] < start_epoch]
        if start_epoch > epochs:
            # nothing to train (resume of a finished run) — leave the
            # history file and the "last" checkpoint exactly as they are
            logger.info("resume epoch %d is beyond epochs=%d; nothing to do",
                        start_epoch, epochs)
            return {"history": history, "best": self.tracker.best}
        for epoch in range(start_epoch, epochs + 1):
            stats = self.train_epoch(
                epoch, start_step=resume_step if epoch == start_epoch else 0)
            record: Dict[str, Any] = {"epoch": epoch,
                                      "train": dataclasses.asdict(stats)}
            if self.val_data is not None:
                res = self.eval_epoch(epoch)
                flat = {**res["retrieval"], **res["localization"], **res["composite"]}
                flat.pop("cols", None)
                record["eval"] = flat
                improved = self.tracker.update(epoch, flat)
                if self.ckpt:
                    for tag in improved:
                        self.ckpt.save(tag, {
                            "params": jax.device_get(self.state.params),
                            "step": int(self.state.step),
                            "epoch": epoch,
                        })
            if self.ckpt and cfg.train.save_every_epoch:
                self.ckpt.save(f"epoch_{epoch}", {
                    "params": jax.device_get(self.state.params),
                    "step": int(self.state.step),
                    "epoch": epoch,
                })
            if self.ckpt and cfg.train.checkpoint_every_steps:
                # epoch-boundary 'last' (no step_in_epoch): with periodic
                # saving on, the newest on-disk state must never lag a full
                # epoch behind — and it supersedes any mid-epoch save from
                # this epoch so resume never replays completed work
                self.ckpt.save("last", {
                    "params": jax.device_get(self.state.params),
                    "opt_state": jax.device_get(self.state.opt_state),
                    "step": int(self.state.step),
                    "epoch": epoch,
                })
            history.append(record)
            from mgsv_tpu.core import dist
            if dist.is_primary():
                # write-through after EVERY epoch: a preemption mid-run must
                # not lose the completed epochs' records (the resume path
                # reloads them from this file) — via tmp + rename so a kill
                # mid-write can't leave a truncated file resume can't parse
                with open(hist_path + ".tmp", "w") as f:
                    json.dump(history, f, indent=2, default=float)
                os.replace(hist_path + ".tmp", hist_path)
            # Early stop (train-MaDe.py:735-736) — only meaningful when a
            # validation metric is being tracked.
            if self.val_data is not None and self.tracker.should_stop(
                    epoch, cfg.train.early_stop_min_epochs,
                    cfg.train.early_stop_patience):
                logger.info("early stop at epoch %d", epoch)
                break
        from mgsv_tpu.core import dist
        if dist.is_primary():
            with open(hist_path + ".tmp", "w") as f:
                json.dump(history, f, indent=2, default=float)
            os.replace(hist_path + ".tmp", hist_path)
        if self.ckpt:
            # "last" carries the optimizer state so training can resume.
            self.ckpt.save("last", {
                "params": jax.device_get(self.state.params),
                "opt_state": jax.device_get(self.state.opt_state),
                "step": int(self.state.step),
                "epoch": history[-1]["epoch"] if history else 0,
            })
            self.ckpt.wait()
        if self.multiprocess:
            # co-exit: non-primary processes wait for the primary's writes
            # (the reference's barrier after eval, train-MaDe.py:634)
            dist.barrier("fit-end")
        return {"history": history, "best": self.tracker.best}
