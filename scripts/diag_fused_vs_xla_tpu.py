"""Diagnose the implausible XLA-only anchor: loss + timing per flag combo."""
from __future__ import annotations
import dataclasses, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np
from __graft_entry__ import _example_batch
from mgsv_tpu.config import Config
from mgsv_tpu.core.cache import enable as enable_cache
from mgsv_tpu.models.made import MaDe
from mgsv_tpu.train.optimizer import make_optimizer
from mgsv_tpu.train.step import create_state, make_train_step

enable_cache()
bs = 512
base = Config()
rng = np.random.RandomState(0)

def run(tag, **flags):
    cfg = dataclasses.replace(base, model=dataclasses.replace(base.model, **flags))
    model = MaDe(cfg)
    batch = {k: jax.device_put(v) for k, v in _example_batch(rng, cfg, bs=bs).items()}
    tx = make_optimizer(cfg, total_steps=10_000)
    state = create_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, cfg)
    # bench.py timing discipline: block_until_ready is unreliable on the
    # remote platform — end the chained run with one scalar fetch.
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        state, log = step(state, batch, key)
        float(log["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, log = step(state, batch, key)
    float(log["loss"])
    dt = (time.perf_counter() - t0) / 10
    out = {"tag": tag, "ms": round(dt*1e3, 2),
           "loss": round(float(log["loss"]), 4),
           "ret": round(float(log["retrieval_loss"]), 4),
           "loc": round(float(log["localization_loss"]), 4)}
    print(json.dumps(out), flush=True)

run("fused_default")
run("xla_only", fused_detr_encoder=False, fused_xpool_sim=False, fused_temporal=False)
run("no_fused_encoder", fused_detr_encoder=False)
run("no_fused_xpool", fused_xpool_sim=False)
