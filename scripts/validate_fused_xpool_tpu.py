"""Validate + bench the custom-VJP fused X-Pool similarity ON REAL TPU.

The CPU suite (tests/test_xpool_sim_vjp.py) verifies the kernel in
interpret mode at rate=0 and the pure-JAX fallback at rate>0; the hardware
PRNG path is TPU-only, so this script is its oracle run:

 1. rate=0: kernel fwd + grads vs the XPoolTransformer module chain;
 2. rate>0: the keep masks depend only on (seed, pair_tag) — a trivial
    mask-emitting kernel regenerates them on-chip, the mask-fixed pure-JAX
    oracle consumes them, and fwd AND grads must match (proving the
    backward kernel regenerates the forward's masks bit-for-bit);
 3. same seed reproduces, different seed differs;
 4. bench at the paper shape (bs=512, S=96, D=256): XLA pooled chain vs
    fused kernel, fwd and grad, plus the full train step with
    fused_xpool_sim on/off.

Run: python scripts/validate_fused_xpool_tpu.py   (needs the TPU backend)
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from mgsv_tpu.models.xpool import (FusedXPoolSim, XPoolTransformer,  # noqa: E402
                                   sim_matrix_music_pooling)
from mgsv_tpu.ops.losses import clip_loss  # noqa: E402
from mgsv_tpu.ops.pallas.fused_encoder_layer import _keep_mask  # noqa: E402
from mgsv_tpu.ops.pallas.xpool_sim_vjp import (_core_jax,  # noqa: E402
                                               _xpool_core)


def emit_masks(seed, mp, vp, d, rate, block_v, block_m):
    """Regenerate the kernel's per-(music, v-tile) keep masks on-chip."""
    n_vj = vp // block_v

    def kern(seed_ref, out_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        for mi in range(out_ref.shape[0]):
            tag = (i * out_ref.shape[0] + mi) * n_vj + j
            out_ref[mi] = _keep_mask(seed_ref[0], tag, 0,
                                     out_ref.shape[1:], rate)

    return pl.pallas_call(
        kern,
        grid=(mp // block_m, n_vj),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((block_m, block_v, d),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, vp, d), jnp.float32),
    )(seed.astype(jnp.int32).reshape((1,)))


def spread(params, scale=0.05, seed=3):
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.RandomState(seed)
    return jax.tree.unflatten(
        treedef, [l + scale * rng.randn(*l.shape).astype(np.float32)
                  for l in leaves])


def flat_args(params, rate=0.0):
    p = params["params"]
    ca, lin = p["cross_attn"], p["linear_proj"]
    return (ca["out_proj"]["kernel"], ca["out_proj"]["bias"],
            p["layer_norm2"]["scale"], p["layer_norm2"]["bias"],
            lin["kernel"], lin["bias"],
            p["layer_norm3"]["scale"], p["layer_norm3"]["bias"])


def precompute(params, video, segs):
    p = params["params"]
    g1, b1 = p["layer_norm1"]["scale"], p["layer_norm1"]["bias"]
    ln = lambda x: ((x - x.mean(-1, keepdims=True))
                    * jax.lax.rsqrt(x.var(-1, keepdims=True) + 1e-5)
                    * g1 + b1)
    vn, sn = ln(video), ln(segs)
    ca = p["cross_attn"]
    q = vn @ ca["q_proj"]["kernel"] + ca["q_proj"]["bias"]
    k = sn @ ca["k_proj"]["kernel"] + ca["k_proj"]["bias"]
    v = sn @ ca["v_proj"]["kernel"] + ca["v_proj"]["bias"]
    vhat = video * jax.lax.rsqrt(
        jnp.maximum((video * video).sum(-1, keepdims=True), 1e-24))
    return q, k, v, vhat


def check_rate0(vc=96, m=64, s=24, d=64, block_v=128, block_m=8, tol=3e-4):
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(vc, d), jnp.float32)
    segs = jnp.asarray(rng.randn(m, s, d), jnp.float32)
    mask = jnp.asarray((rng.rand(m, s) < 0.8), jnp.float32).at[:, 0].set(1.0)
    ref = XPoolTransformer(d, dropout=0.0)
    params = spread(ref.init(jax.random.PRNGKey(0), video, segs, mask,
                             deterministic=True))
    fused = FusedXPoolSim(d, dropout=0.0, block_v=block_v, block_m=block_m)
    scale = jnp.float32(np.log(1 / 0.03))

    def loss_ref(p, vv, ss):
        pooled = ref.apply(p, vv, ss, mask, deterministic=True)
        return clip_loss(sim_matrix_music_pooling(vv, pooled), scale)

    def loss_fused(p, vv, ss):
        return clip_loss(fused.apply(p, vv, ss, mask, deterministic=True),
                         scale)

    want = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2)))(
        params, video, segs)
    got = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2)))(
        params, video, segs)
    err_l = abs(float(want[0]) - float(got[0]))
    errs = [float(jnp.abs(a - b).max()) for a, b in
            zip(jax.tree.leaves(want[1]), jax.tree.leaves(got[1]))]
    assert err_l < tol and max(errs) < tol, (err_l, max(errs))
    print(f"rate=0 OK: loss err {err_l:.2e}, max grad err {max(errs):.2e}")


def check_dropout(vc=64, m=32, s=24, d=64, block_v=128, block_m=8, rate=0.3,
                  tol=3e-4):
    rng = np.random.RandomState(1)
    video = jnp.asarray(rng.randn(vc, d), jnp.float32)
    segs = jnp.asarray(rng.randn(m, s, d), jnp.float32)
    mask = jnp.ones((m, s), jnp.float32)
    ref = XPoolTransformer(d, dropout=rate)
    params = spread(ref.init(jax.random.PRNGKey(0), video, segs, mask,
                             deterministic=True))
    seed = jnp.asarray([4242], jnp.int32)
    q, k, v, vhat = precompute(params, video, segs)
    w = flat_args(params)

    core = jax.jit(functools.partial(
        _xpool_core, rate=rate, block_v=block_v, block_m=block_m,
        interpret=False))
    got = core(q, k, v, mask, vhat, *w, seed)

    # the kernel tags pairs over the PADDED tile grid: emit there, then slice
    vp_pad = -(-vc // block_v) * block_v
    mp_pad = -(-m // block_m) * block_m
    dmask = emit_masks(seed, mp_pad, vp_pad, d, rate, block_v,
                       block_m)[:m, :vc]
    keep_rate = float((dmask > 0).mean())
    assert abs(keep_rate - (1 - rate)) < 0.02, keep_rate
    want = jax.jit(lambda *a: _core_jax(*a, dmask))(q, k, v, mask, vhat, *w)
    err = float(jnp.abs(got - want).max())
    assert err < tol, f"dropout fwd mismatch: {err}"

    # grads: kernel-regenerated masks vs the mask-fixed oracle
    def loss_core(q_, k_, v_, vhat_, *w_):
        return (_xpool_core(q_, k_, v_, mask, vhat_, *w_, seed, rate,
                            block_v, block_m, False) ** 2).sum()

    def loss_oracle(q_, k_, v_, vhat_, *w_):
        return (_core_jax(q_, k_, v_, mask, vhat_, *w_, dmask) ** 2).sum()

    gk = jax.jit(jax.grad(loss_core, argnums=tuple(range(12))))(
        q, k, v, vhat, *w)
    go = jax.jit(jax.grad(loss_oracle, argnums=tuple(range(12))))(
        q, k, v, vhat, *w)
    errs = [float(jnp.abs(a - b).max()) for a, b in zip(gk, go)]
    assert max(errs) < 5e-3, errs   # grads magnify; tol scaled to values O(10)
    print(f"rate>0 OK: keep {keep_rate:.3f}, fwd err {err:.2e}, "
          f"max grad err {max(errs):.2e}")

    got2 = core(q, k, v, mask, vhat, *w, seed)
    other = core(q, k, v, mask, vhat, *w, jnp.asarray([777], jnp.int32))
    assert float(jnp.abs(got2 - got).max()) == 0.0, "same seed must reproduce"
    assert float(jnp.abs(other - got).max()) > 1e-4, "different seed must differ"
    print("seed reproducibility OK")


def bench(bs=512, s=96, d=256, rate=0.3, steps=20):
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(bs, d), jnp.float32)
    segs = jnp.asarray(rng.randn(bs, s, d), jnp.float32)
    mask = jnp.asarray((rng.rand(bs, s) < 0.8), jnp.float32).at[:, 0].set(1.0)
    scale = jnp.float32(np.log(1 / 0.03))
    key = jax.random.PRNGKey(1)

    ref = XPoolTransformer(d, dropout=rate)
    params = ref.init(jax.random.PRNGKey(0), video, segs, mask,
                      deterministic=True)
    fused = FusedXPoolSim(d, dropout=rate)

    def loss_ref(p, vv, ss):
        pooled = ref.apply(p, vv, ss, mask, deterministic=False,
                           rngs={"dropout": key})
        return clip_loss(sim_matrix_music_pooling(vv, pooled), scale)

    def loss_fused(p, vv, ss):
        return clip_loss(fused.apply(p, vv, ss, mask, deterministic=False,
                                     rngs={"dropout": key}), scale)

    out = {}
    for name, fn in [("xla", loss_ref), ("fused", loss_fused)]:
        f = jax.jit(fn)
        g = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))
        for tag, callee, fetch in [
                ("fwd", f, float),
                ("grad", g, lambda r: float(jnp.sum(r[1])))]:
            r = None
            for _ in range(2):
                r = callee(params, video, segs)
                fetch(r)
            t0 = time.perf_counter()
            for _ in range(steps):
                r = callee(params, video, segs)
            fetch(r)
            out[f"{name}_{tag}_ms"] = (time.perf_counter() - t0) / steps * 1e3
    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    check_rate0()
    check_dropout()
    bench()
