"""Bench flash-attention v2 vs XLA fused attention at the AST shape, on TPU.

AST raw path: 96 snippets x 12 heads x 1214 tokens x 64 head-dim per music
track (SURVEY.md §3.5).  Compares the Pallas kernel against XLA's einsum
attention in f32 and bf16, and (if the kernel wins) the whole AST tower
with the kernel wired in via make_attention_fn.

Run: python scripts/bench_flash_attention_tpu.py
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mgsv_tpu.models.vit_common import default_attention  # noqa: E402
from mgsv_tpu.ops.pallas.flash_attention import flash_attention  # noqa: E402

B, H, L, D = 96, 12, 1214, 64
FLOPS = 4 * B * H * L * L * D


def timed(fn, args, steps=20, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / steps


def main():
    rng = np.random.RandomState(0)
    scale = 1.0 / np.sqrt(D)
    results = {}
    for dtype_name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        q = jnp.asarray(rng.randn(B, H, L, D), dtype)
        k = jnp.asarray(rng.randn(B, H, L, D), dtype)
        v = jnp.asarray(rng.randn(B, H, L, D), dtype)

        xla = jax.jit(lambda q_, k_, v_: default_attention(q_, k_, v_, scale))
        t = timed(xla, (q, k, v))
        results[f"xla_{dtype_name}_ms"] = t * 1e3
        results[f"xla_{dtype_name}_tflops"] = FLOPS / t / 1e12

        for bq in (256, 512):
            fl = jax.jit(lambda q_, k_, v_, bq=bq: flash_attention(
                q_, k_, v_, scale, None, block_q=bq, interpret=False))
            t = timed(fl, (q, k, v))
            results[f"flash_{dtype_name}_bq{bq}_ms"] = t * 1e3
            results[f"flash_{dtype_name}_bq{bq}_tflops"] = FLOPS / t / 1e12

        # numerical check vs XLA (f32 reference)
        want = jax.jit(lambda q_, k_, v_: default_attention(
            q_.astype(jnp.float32), k_.astype(jnp.float32),
            v_.astype(jnp.float32), scale))(q, k, v)
        got = jax.jit(lambda q_, k_, v_: flash_attention(
            q_, k_, v_, scale, None, block_q=256, interpret=False))(q, k, v)
        err = float(jnp.abs(got.astype(jnp.float32) - want).max())
        results[f"max_err_{dtype_name}"] = err

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
