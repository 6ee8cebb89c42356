"""Jit-compiled train / eval steps.

One fused XLA program per step: forward (both tasks), losses, Hungarian
matching, backward, per-group clipping, Adam update, and the train-time
span decode + IoU stats the reference computes on CPU per batch
(train-MaDe.py:342-367 — a GPU->host sync it pays every step; here it stays
on device and costs nothing).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from mgsv_tpu.config import Config
from mgsv_tpu.models.made import MaDe
from mgsv_tpu.ops.spans import eval_iou_batch, span_cw_to_se
from mgsv_tpu.train.objective import total_loss


class TrainState(train_state.TrainState):
    pass


def create_state(model: MaDe, cfg: Config, tx: optax.GradientTransformation,
                 rng, example_batch: Dict[str, Any]) -> TrainState:
    # jit the init: eager flax init dispatches each op individually — very
    # slow over a remote-TPU tunnel.
    init = jax.jit(functools.partial(model.init, deterministic=True))
    params = init(
        rng,
        example_batch["frame_feats"], example_batch["frame_mask"],
        example_batch["segment_feats"], example_batch["segment_mask"],
        v_duration=example_batch.get("v_duration"),
    )
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def decode_top_span(outputs: Dict[str, Any], cfg: Config) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-1 predicted span in seconds + its foreground score.

    train-MaDe.py:342-360: softmax fg score over queries, cw->se * 240,
    ranked by score, top-h (h=1).
    Returns (spans_sec [B, 2], score [B]).
    """
    logits = outputs["pred_logits_layers"][-1]          # [B, Q, 2]
    spans_cw = outputs["pred_spans_layers"][-1]         # [B, Q, 2]
    scores = jax.nn.softmax(logits, axis=-1)[..., cfg.loss.foreground_label]
    spans_se = span_cw_to_se(spans_cw) * cfg.data.max_m_duration
    best = jnp.argmax(scores, axis=-1)                  # [B]
    take = lambda x: jnp.take_along_axis(x, best[:, None, None], axis=1)[:, 0]
    return take(spans_se), jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]


def make_train_step(model: MaDe, cfg: Config):
    # agg_module="mlp" carries BatchNorm running buffers in a "batch_stats"
    # collection (models/embedding_net.py); the training step threads them
    # through mutably and writes the updated buffers back into the state's
    # variables dict (Adam never touches them — optimizer label FROZEN).
    has_bn = cfg.model.agg_module == "mlp"

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, Any], rng) -> Tuple[TrainState, Dict]:
        step_rng = jax.random.fold_in(rng, state.step)
        if cfg.train.dropout_rng == "rbg":
            # Dropout masks from the XLA RngBitGenerator instead of
            # threefry: key derivation (fold_in above) stays threefry; only
            # the per-site mask bits use the fast generator.  Measured on
            # v5e: tower fwd+bwd at paper dropout 0.8 drops 20.4 -> 14.8 ms
            # (scripts/bench_towers_tpu.py) — threefry mask generation was
            # ~9 ms of the step.  Deterministic in (rng, step) either way.
            step_rng = jax.random.wrap_key_data(
                jnp.tile(jax.random.key_data(step_rng), 2), impl="rbg")

        def loss_fn(params):
            apply_args = (
                batch["frame_feats"], batch["frame_mask"],
                batch["segment_feats"], batch["segment_mask"],
            )
            apply_kw = dict(v_duration=batch.get("v_duration"),
                            deterministic=False, rngs={"dropout": step_rng})
            if has_bn:
                out, updated = model.apply(params, *apply_args,
                                           mutable=["batch_stats"], **apply_kw)
            else:
                out = model.apply(params, *apply_args, **apply_kw)
                updated = None
            loss, log = total_loss(out, batch["spans_target"], cfg,
                                   music_codes=batch.get("music_codes"))
            return loss, (log, out, updated)

        (_, (log, out, updated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        if updated is not None:
            state = state.replace(
                params={**state.params, "batch_stats": updated["batch_stats"]})

        spans_sec, score = decode_top_span(out, cfg)
        log = dict(log)
        log["train_iou"] = eval_iou_batch(
            batch["gt_moment"][:, 0, :], batch["m_duration"], spans_sec,
            cfg.data.max_m_duration)
        log["grad_norm"] = optax.global_norm(grads)
        return state, log

    return train_step


def make_eval_step(model: MaDe, cfg: Config):
    @jax.jit
    def eval_step(params, batch: Dict[str, Any]) -> Dict[str, Any]:
        out = model.apply(
            params,
            batch["frame_feats"], batch["frame_mask"],
            batch["segment_feats"], batch["segment_mask"],
            v_duration=batch.get("v_duration"),
            deterministic=True,
        )
        loss, log = total_loss(out, batch["spans_target"], cfg)
        spans_sec, score = decode_top_span(out, cfg)
        return {
            "video_emb": out["video_emb"],
            "music_emb": out["music_emb"],
            "seg_tokens": out["seg_tokens"],
            "segment_mask": out["segment_mask"],
            "pred_spans_sec": spans_sec,
            "pred_score": score,
            "iou": eval_iou_batch(
                batch["gt_moment"][:, 0, :], batch["m_duration"], spans_sec,
                cfg.data.max_m_duration),
            "loss": loss,
            "retrieval_loss": log["retrieval_loss"],
            "localization_loss": log["localization_loss"],
        }

    return eval_step
