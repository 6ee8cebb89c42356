"""On-chip validation of the fused temporal-tower layer (fwd + bwd).

Checks on the real TPU, at the paper tower shapes:
  1. rate=0: kernel fwd + grads vs the pure-JAX oracle
     (temporal_layer_fwd_with_masks with masks=None).
  2. rate=0.8 (the paper temporal dropout): the kernel's hardware-PRNG
     masks are re-drawn OUTSIDE the kernel with the same (seed, row, site)
     tags and fed to the mask-fixed differentiable oracle — kernel output
     and grads must match the oracle bit-for-bit up to float tolerance.
     (The kernel regenerates masks in backward; this proves fwd and bwd
     see identical streams.)
  3. timing: fused vs XLA tower layer fwd+bwd at bs=512.

Prints one JSON line; commit the numbers to BASELINE.md.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def draw_mask_grid(seed, rows, site, shape, rate):
    """Masks for rows 0..rows-1 at one site — same tags as the kernel
    (block_b=1: row_tag == program_id == row index)."""
    from mgsv_tpu.ops.pallas.fused_encoder_layer import _keep_mask

    def kern(seed_ref, out_ref):
        i = pl.program_id(0)
        out_ref[0] = _keep_mask(seed_ref[0], i, site, shape, rate)

    return pl.pallas_call(
        kern,
        grid=(rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows,) + shape, jnp.float32),
        interpret=False,
    )(jnp.asarray(seed, jnp.int32).reshape((1,)))


def timed(fn, *args, steps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["numerics", "timing", "both"],
                    default="both")
    args = ap.parse_args()
    if args.mode in ("numerics", "both"):
        # f32 MXU for the numeric comparison (same discipline as
        # validate_fused_dropout_tpu.py:27 — under the DEFAULT bf16 matmul
        # precision both sides round differently and the comparison only
        # bounds bf16 noise, not kernel correctness).  Timing runs use the
        # default precision: run with --mode timing for production numbers.
        jax.config.update("jax_default_matmul_precision", "highest")

    from mgsv_tpu.core.cache import enable as enable_cache
    from mgsv_tpu.models.temporal import (FusedTemporalTransformer,
                                          TemporalTransformer)
    from mgsv_tpu.ops.pallas.fused_temporal_layer import (
        fused_temporal_layer_train, temporal_layer_fwd_with_masks)

    enable_cache()
    results = {}
    rng = np.random.RandomState(0)

    # ---------- numerics at a mid-size shape ----------
    if args.mode == "timing":
        results["ok"] = True
        _timing(results, rng)
        print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                          for k, v in results.items()}))
        return
    b, L, d, heads, f = 8, 96, 256, 8, 1024
    x = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.5)
    mask = np.ones((b, L), np.float32)
    mask[0, 60:] = 0
    mask = jnp.asarray(mask)
    std = TemporalTransformer(d, 1, heads, f, d, dropout=0.8)
    params = std.init(jax.random.PRNGKey(0), x, mask, deterministic=True)
    p0 = params["params"]
    kp = {
        "self_attn": {k: p0["attn_0"][k]
                      for k in ("q_proj", "k_proj", "v_proj", "out_proj")},
        "norm1": p0["norm1_0"], "norm2": p0["norm2_0"],
        "linear1": p0["ff_fc1_0"], "linear2": p0["ff_fc2_0"],
    }
    g = jnp.asarray(rng.randn(b, L, d).astype(np.float32))

    # rate=0 parity
    zero_seed = jnp.zeros((1,), jnp.int32)
    out_k = jax.jit(lambda kp_, x_: fused_temporal_layer_train(
        kp_, x_, mask, zero_seed, heads, 1, False, 0.0))(kp, x)
    out_o = jax.jit(lambda kp_, x_: temporal_layer_fwd_with_masks(
        kp_, x_, mask, None, heads))(kp, x)
    results["fwd_err_rate0"] = float(jnp.abs(out_k - out_o).max())

    gk = jax.jit(jax.grad(lambda kp_, x_: (fused_temporal_layer_train(
        kp_, x_, mask, zero_seed, heads, 1, False, 0.0) * g).sum(),
        argnums=(0, 1)))(kp, x)
    go = jax.jit(jax.grad(lambda kp_, x_: (temporal_layer_fwd_with_masks(
        kp_, x_, mask, None, heads) * g).sum(), argnums=(0, 1)))(kp, x)
    results["grad_err_rate0"] = max(jax.tree.leaves(jax.tree.map(
        lambda a_, b_: float(jnp.abs(a_ - b_).max()), gk, go)))

    # rate=0.8: hardware masks -> mask-fixed oracle
    rate = 0.8
    seed = jnp.asarray([12345], jnp.int32)
    masks = {
        "attn": jnp.stack([draw_mask_grid(seed, b, h, (L, L), rate)
                           for h in range(heads)], axis=1),   # [b, H, L, L]
        "ffn1": draw_mask_grid(seed, b, heads, (L, f), rate),
        "ffn2": draw_mask_grid(seed, b, heads + 1, (L, d), rate),
    }
    out_k = jax.jit(lambda kp_, x_: fused_temporal_layer_train(
        kp_, x_, mask, seed, heads, 1, False, rate))(kp, x)
    out_o = jax.jit(lambda kp_, x_: temporal_layer_fwd_with_masks(
        kp_, x_, mask, masks, heads))(kp, x)
    results["fwd_err_rate0.8"] = float(jnp.abs(out_k - out_o).max())

    gk = jax.jit(jax.grad(lambda kp_, x_: (fused_temporal_layer_train(
        kp_, x_, mask, seed, heads, 1, False, rate) * g).sum(),
        argnums=(0, 1)))(kp, x)
    go = jax.jit(jax.grad(lambda kp_, x_: (temporal_layer_fwd_with_masks(
        kp_, x_, mask, masks, heads) * g).sum(), argnums=(0, 1)))(kp, x)
    results["grad_err_rate0.8"] = max(jax.tree.leaves(jax.tree.map(
        lambda a_, b_: float(jnp.abs(a_ - b_).max()), gk, go)))

    if args.mode == "both":
        _timing(results, rng)

    ok = (results["fwd_err_rate0"] < 1e-4 and results["grad_err_rate0"] < 1e-3
          and results["fwd_err_rate0.8"] < 1e-4
          and results["grad_err_rate0.8"] < 1e-3)
    results["ok"] = bool(ok)
    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in results.items()}))
    if not ok:
        sys.exit(1)


def _timing(results, rng):
    from mgsv_tpu.models.temporal import (FusedTemporalTransformer,
                                          TemporalTransformer)
    import jax.numpy as jnp

    d, heads, f = 256, 8, 1024
    for tag, (bb, LL) in (("video50", (512, 50)), ("audio96", (512, 96))):
        xx = jnp.asarray(rng.randn(bb, LL, d).astype(np.float32) * 0.5)
        mm = jnp.asarray((rng.rand(bb, LL) < 0.8).astype(np.float32))
        mm = mm.at[:, 0].set(1.0)
        gg = jnp.asarray(rng.randn(bb, LL, d).astype(np.float32))
        std_mod = TemporalTransformer(d, 1, heads, f, d, dropout=0.8,
                                      dtype=jnp.bfloat16)
        pp = std_mod.init(jax.random.PRNGKey(0), xx, mm, deterministic=True)
        key = jax.random.PRNGKey(3)
        rbg_key = jax.random.wrap_key_data(
            jnp.tile(jax.random.key_data(key), 2), impl="rbg")

        def loss(mod, k=key):
            return lambda p_, x_: (mod.apply(
                p_, x_, mm, deterministic=False,
                rngs={"dropout": k}) * gg).sum()

        results[f"{tag}_xla_fwdbwd_ms"] = timed(
            jax.jit(jax.grad(loss(std_mod), argnums=(0, 1))), pp, xx)
        results[f"{tag}_xla_rbg_fwdbwd_ms"] = timed(
            jax.jit(jax.grad(loss(std_mod, rbg_key), argnums=(0, 1))), pp, xx)
        for block_b in (1, 2, 4, 8):
            fused_mod = FusedTemporalTransformer(
                d, 1, heads, f, d, dropout=0.8, block_b=block_b)
            results[f"{tag}_fused_bb{block_b}_fwdbwd_ms"] = timed(
                jax.jit(jax.grad(loss(fused_mod), argnums=(0, 1))), pp, xx)



if __name__ == "__main__":
    main()
