"""Measure bf16 operand I/O into the fused encoder-layer kernel (VERDICT r2
lever (a)): the model head computes in bf16, but the kernel boundary casts
x/pos up to f32, materializing f32 copies in HBM (2x the activation read
traffic).  `operand_dtype="bf16"` ships the bf16 arrays straight into the
kernel and upcasts on load in VMEM — identical in-kernel math.

Roofline context (BASELINE.md): the layer's HBM time is ~0.5 ms of 8.5 ms
fwd+bwd, so the theoretical ceiling of this lever is ~0.25 ms/layer fwd —
this script prices it for real.

Timing discipline: chained dispatch, one scalar fetch (bench.py note).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, steps=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    from mgsv_tpu.core.cache import enable as enable_cache
    from mgsv_tpu.models.detr import DetrEncoderLayer
    from mgsv_tpu.ops.pallas.fused_encoder_layer import fused_encoder_layer

    enable_cache()
    B, L, D, H, F = 512, 152, 256, 8, 1024
    rng = np.random.RandomState(0)
    layer = DetrEncoderLayer(D, H, F, dropout=0.1, pre_norm=False)
    x32 = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    mask = jnp.ones((B, L), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x32, mask, x32,
                        deterministic=True)
    p = params["params"]
    seed = jnp.zeros((1,), jnp.int32)
    # realistic upstream: the head computes in bf16
    x16 = x32.astype(jnp.bfloat16)

    results = {}
    for rate in (0.0, 0.1):
        for od in ("f32", "bf16"):
            fn = jax.jit(lambda x, od=od, rate=rate: fused_encoder_layer(
                x, mask, x, p, heads=H, block_b=1, rate=rate, seed=seed,
                operand_dtype=od))
            results[f"rate{rate}_{od}_ms"] = round(timed(fn, x16), 3)
    # numerics check: bf16 operands vs f32 operands fed the same bf16 input
    a = jax.jit(lambda x: fused_encoder_layer(
        x, mask, x, p, heads=H, block_b=1, operand_dtype="f32"))(x16)
    b = jax.jit(lambda x: fused_encoder_layer(
        x, mask, x, p, heads=H, block_b=1, operand_dtype="bf16"))(x16)
    results["max_abs_diff"] = float(jnp.max(jnp.abs(a - b)))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
