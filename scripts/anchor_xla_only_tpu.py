"""Pure-XLA perf anchor: the identical train step with every Pallas kernel OFF.

The external lower bound VERDICT r3 (weak #2) asked for: the ceiling claim
in BASELINE.md is self-graded, so anchor it with a number any competing
implementation must beat — XLA's own compilation of the same model at the
same shapes (fused_detr_encoder / fused_xpool_sim / fused_temporal all
disabled; everything else, including rbg dropout masks and the 152-token
sequence padding, identical).  Our fused default must beat THIS, and the
gap is exactly what the hand-written kernels buy.

Measurement point being protected: /root/reference/train-MaDe.py:318,388.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from __graft_entry__ import _example_batch
from mgsv_tpu.config import Config
from mgsv_tpu.core.cache import enable as enable_cache
from mgsv_tpu.models.made import MaDe
from mgsv_tpu.train.optimizer import make_optimizer
from mgsv_tpu.train.step import create_state, make_train_step


def main(bs: int = 512, steps: int = 20, warmup: int = 2):
    enable_cache()
    cfg = Config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, fused_detr_encoder=False, fused_xpool_sim=False,
        fused_temporal=False))
    model = MaDe(cfg)
    rng = np.random.RandomState(0)
    batch = {k: jax.device_put(v)
             for k, v in _example_batch(rng, cfg, bs=bs).items()}
    tx = make_optimizer(cfg, total_steps=10_000)
    state = create_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(model, cfg)
    # Timing discipline from bench.py: on the remote-TPU platform
    # block_until_ready returns before execution completes — every timed
    # run must END WITH A SCALAR FETCH that the whole chain feeds.
    key = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, log = train_step(state, batch, key)
        float(log["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, log = train_step(state, batch, key)
    float(log["loss"])  # every step chains into this fetch
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "metric": "xla_only_train_clips_per_sec_bs512",
        "value": round(bs / dt, 2),
        "ms_per_step": round(dt * 1e3, 2),
        "device_kind": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
