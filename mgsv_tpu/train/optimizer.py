"""Three-group optimizer mirroring the reference's param groups.

prep_optimizer (train-MaDe.py:252-286) builds Adam over three param groups —
temporal (projections + temporal transformers, lr=matching_lr), matching
(X-Pool + logit_scale, lr=matching_lr), detection (DETR + heads,
lr=detection_lr) — with per-group grad-norm clipping at 1.0
(train-MaDe.py:375-377).  Implemented as optax.multi_transform with one
clip+adam chain per label, so clipping is per-group exactly as upstream.

Faithful quirk: `decoder_query_embed` belongs to NO reference param group
(get_*_parameter, model_Uni.py:73-114) and therefore never updates; it is
routed to a zero-update label here unless train_query_embed=True.
"""

from __future__ import annotations

from typing import Any, Dict

import optax

from mgsv_tpu.config import Config
from mgsv_tpu.train.schedule import make_schedule

TEMPORAL = "temporal"
MATCHING = "matching"
DETECTION = "detection"
FROZEN = "frozen"

_GROUP_OF_MODULE = {
    # get_temporal_parameter = projections + temporal transformers
    "video_tower": TEMPORAL,
    "audio_tower": TEMPORAL,
    "shared_temporal": TEMPORAL,
    # get_matching_parameter
    "xpool_v2m": MATCHING,
    "xpool_m2v": MATCHING,
    "logit_scale": MATCHING,
    # get_detection_parameter
    "ca_fusion": DETECTION,
    "detr": DETECTION,
    "span_embed": DETECTION,
    "class_embed": DETECTION,
    "moment_embed": DETECTION,
    "contrastive_proj_query": DETECTION,
    "contrastive_proj_vid": DETECTION,
    "reg_mlp": DETECTION,
    # reference quirk: never optimized
    "query_embed": FROZEN,
}


def label_params(params: Dict[str, Any], train_query_embed: bool = False):
    """Map each top-level module of the params tree to its LR group."""

    def label_for(name: str) -> str:
        group = _GROUP_OF_MODULE.get(name)
        if group is None:
            raise KeyError(f"no optimizer group for param subtree: {name}")
        if name == "query_embed" and train_query_embed:
            return DETECTION
        return group

    inner = params["params"] if "params" in params else params
    labels = {name: label_for(name) for name in inner}
    if "params" not in params:
        return labels
    out = {"params": labels}
    # Non-param collections (e.g. EmbeddingNet's BatchNorm running buffers in
    # "batch_stats") are never optimized — label every leaf FROZEN.
    import jax

    for coll in params:
        if coll != "params":
            out[coll] = jax.tree.map(lambda _: FROZEN, params[coll])
    return out


def audit_param_groups(params: Dict[str, Any],
                       train_query_embed: bool = False) -> Dict[str, Any]:
    """Trainable/frozen audit of the param tree by optimizer group.

    The reference prints this at startup so the operator can eyeball that
    freezing and group assignment happened (count_parameters /
    show_model_architecture, train-MaDe.py:209-304).  Returns
    {group: {"params": N, "modules": {name: N}}} over ALL leaves — the four
    groups partition the tree exactly (asserted in tests/test_optim.py).
    """
    import jax

    labels = label_params(params, train_query_embed=train_query_embed)
    audit: Dict[str, Any] = {
        g: {"params": 0, "modules": {}}
        for g in (TEMPORAL, MATCHING, DETECTION, FROZEN)
    }

    def visit(label_sub, param_sub, name):
        if isinstance(label_sub, str):
            n = sum(x.size for x in jax.tree.leaves(param_sub))
            entry = audit[label_sub]
            entry["params"] += n
            entry["modules"][name] = entry["modules"].get(name, 0) + n
        else:
            for k in label_sub:
                visit(label_sub[k], param_sub[k],
                      k if name in ("params", "") else f"{name}/{k}")

    for coll in labels:
        visit(labels[coll], params[coll], coll if coll != "params" else "")
    return audit


def log_param_audit(logger, params: Dict[str, Any],
                    train_query_embed: bool = False) -> Dict[str, Any]:
    """Log the startup trainable/frozen audit (train-MaDe.py:209-304)."""
    audit = audit_param_groups(params, train_query_embed=train_query_embed)
    total = sum(g["params"] for g in audit.values())
    trainable = total - audit[FROZEN]["params"]
    logger.info("parameter audit: %.3fM total, %.3fM trainable, %.3fM frozen",
                total / 1e6, trainable / 1e6, audit[FROZEN]["params"] / 1e6)
    for group in (TEMPORAL, MATCHING, DETECTION, FROZEN):
        mods = ", ".join(
            f"{name} {n/1e6:.3f}M"
            for name, n in sorted(audit[group]["modules"].items()))
        logger.info("  group %-9s %8.3fM  [%s]", group,
                    audit[group]["params"] / 1e6, mods or "-")
    return audit


def make_optimizer(cfg: Config, total_steps: int,
                   train_query_embed: bool = False) -> optax.GradientTransformation:
    """total_steps: number of MICRO-batches over the run; with gradient
    accumulation the schedules advance once per k micro-batches, so their
    horizon is divided accordingly."""
    t = cfg.train
    k = max(1, t.gradient_accumulation_steps)
    total_steps = max(1, total_steps // k)
    warmup_steps = int(total_steps * t.warmup_rate)

    def group(lr: float):
        return optax.chain(
            optax.clip_by_global_norm(t.max_grad_norm),
            optax.adam(
                make_schedule(t.scheduler, lr, warmup_steps, total_steps,
                              decay_rate=t.decay_rate,
                              lr_update_rate=t.lr_update_rate),
                b1=t.adam_b1, b2=t.adam_b2, eps=t.adam_eps,
            ),
        )

    transforms = {
        TEMPORAL: group(t.matching_lr),
        MATCHING: group(t.matching_lr),
        DETECTION: group(t.detection_lr),
        FROZEN: optax.set_to_zero(),
    }

    def labeler(params):
        return label_params(params, train_query_embed=train_query_embed)

    tx = optax.multi_transform(transforms, labeler)
    if t.gradient_accumulation_steps > 1:
        # Proper grad accumulation (the reference's flag is inert —
        # train-MaDe.py:126 parses it but every batch still updates).
        tx = optax.MultiSteps(tx, every_k_schedule=t.gradient_accumulation_steps)
    return tx
