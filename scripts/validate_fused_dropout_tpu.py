"""Validate in-kernel PRNG dropout of the fused encoder layer ON REAL TPU.

The CPU test suite cannot exercise the hardware PRNG (pltpu.prng_random_bits
is TPU-only; interpret mode returns zeros), so this script is the oracle run
for the rate>0 kernel path:

 1. forward: run the fused kernel with return_masks=True, then feed the
    emitted masks to the pure-JAX mask-fixed layer — outputs must match;
 2. backward: grads from the custom-VJP kernel (which REGENERATES the masks
    from the seed inside the backward kernel) must match jax.grad of the
    mask-fixed reference — proving the regenerated masks are bit-identical;
 3. statistics: keep-rate of every mask ~ (1 - rate); same seed reproduces,
    different seed differs;
 4. paper shape smoke (L=146, D=256, F=1024, heads=8).

Run: python scripts/validate_fused_dropout_tpu.py   (needs the TPU backend)
"""

import sys

import numpy as np

import jax

# The mask-fixed JAX reference must run f32 matmuls (TPU jit default is
# bf16) or the comparison floor is ~1e-2 instead of ~1e-5.
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp

sys.path.insert(0, ".")

from mgsv_tpu.models.detr import DetrEncoderLayer
from mgsv_tpu.ops.pallas.fused_encoder_layer import (
    fused_encoder_layer, layer_fwd_with_masks)
from mgsv_tpu.ops.pallas.fused_encoder_layer_vjp import fused_encoder_layer_train


def check(b, L, d, heads, ffn, block_b, rate, tol=2e-4):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.4)
    pos = jnp.asarray(rng.randn(b, L, d).astype(np.float32) * 0.4)
    mask = np.ones((b, L), np.float32)
    mask[0, L // 2:] = 0
    mask = jnp.asarray(mask)
    cot = jnp.asarray(rng.randn(b, L, d).astype(np.float32))
    seed = jnp.asarray([12345], jnp.int32)

    lay = DetrEncoderLayer(d, heads, ffn, dropout=rate)
    params = lay.init(jax.random.PRNGKey(0), x, mask, pos)
    p = params["params"]

    # 1. forward vs mask-fixed reference
    out_k, masks = jax.jit(
        lambda: fused_encoder_layer(x, mask, pos, p, heads=heads,
                                    block_b=block_b, interpret=False,
                                    rate=rate, seed=seed, return_masks=True))()
    ref_out = jax.jit(
        lambda m: layer_fwd_with_masks(p, x, mask, pos, m, heads))(masks)
    err = float(jnp.abs(out_k - ref_out).max())
    assert err < tol, f"forward mismatch: {err}"

    # 3. statistics
    inv = 1.0 / (1.0 - rate)
    for name, m in masks.items():
        m = np.asarray(m)
        assert set(np.unique(m.round(6))) <= {0.0, np.float32(inv).round(6)}, name
        keep = (m > 0).mean()
        sigma = (rate * (1 - rate) / m.size) ** 0.5
        assert abs(keep - (1 - rate)) < max(4 * sigma, 5e-3), (
            f"{name} keep-rate {keep} (expect {1-rate} +/- {4*sigma:.4f})")
    out_k2, masks2 = jax.jit(
        lambda: fused_encoder_layer(x, mask, pos, p, heads=heads,
                                    block_b=block_b, interpret=False,
                                    rate=rate, seed=seed, return_masks=True))()
    assert float(jnp.abs(out_k - out_k2).max()) == 0.0, "same seed must reproduce"
    out_k3 = jax.jit(
        lambda: fused_encoder_layer(x, mask, pos, p, heads=heads,
                                    block_b=block_b, interpret=False,
                                    rate=rate, seed=seed + 1))()
    assert float(jnp.abs(out_k - out_k3).max()) > 0, "new seed must change masks"

    # 2. backward: kernel-regenerated masks vs mask-fixed jax.grad
    def loss_fused(p_, x_, pos_):
        out = fused_encoder_layer_train(p_, x_, mask, pos_, seed,
                                        heads, block_b, False, rate)
        return jnp.sum(out * cot)

    def loss_ref(p_, x_, pos_):
        out = layer_fwd_with_masks(p_, x_, mask, pos_, masks, heads)
        return jnp.sum(out * cot)

    gv = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2)))
    rv = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2)))
    got_val, got_g = gv(p, x, pos)
    ref_val, ref_g = rv(p, x, pos)
    assert abs(float(got_val) - float(ref_val)) < tol * 100, (
        f"loss {float(got_val)} vs {float(ref_val)}")

    flat_ref = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(ref_g[0])[0]}
    flat_got = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(got_g[0])[0]}
    worst = 0.0
    for key in flat_ref:
        e = float(jnp.abs(flat_got[key] - flat_ref[key]).max())
        scale = max(1.0, float(jnp.abs(flat_ref[key]).max()))
        worst = max(worst, e / scale)
        assert e / scale < tol * 10, f"param grad mismatch {key}: {e}"
    for i in (1, 2):
        e = float(jnp.abs(got_g[i] - ref_g[i]).max())
        assert e < tol * 10, f"input grad {i} mismatch: {e}"
        worst = max(worst, e)
    print(f"  b={b} L={L} d={d} f={ffn} heads={heads} rate={rate}: "
          f"fwd_err={err:.2e} worst_grad_rel={worst:.2e} OK")


if __name__ == "__main__":
    assert jax.default_backend() != "cpu", "run on the TPU backend"
    print("fused encoder in-kernel dropout validation on", jax.devices()[0])
    check(4, 16, 32, 4, 128, 2, rate=0.3)
    check(5, 24, 64, 8, 256, 4, rate=0.1)   # unaligned batch w/ padding
    check(8, 146, 256, 8, 1024, 2, rate=0.1)  # paper shape
    print("ALL OK")
