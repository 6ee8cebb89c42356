"""Worker process for tests/test_multiprocess.py.

Simulates one host of a 2-process pod: 4 virtual CPU devices per process,
gloo cross-process collectives, a global (dp=8, mp=1) mesh, one SPMD train
step on a globally-sharded batch, then a barrier — the surface the
reference bootstraps with torch.distributed (train-MaDe.py:25, :634) and
the one piece the single-process CPU-mesh tests cannot reach.

Run:  python tests/mp_worker.py <process_id> <num_processes> <port>
Must NOT import through conftest (pytest spawns it as a plain subprocess),
and must NOT set JAX_PLATFORMS in the shell: platform forcing has to go
through jax.config inside dist.initialize (core/platform.py docstring).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from mgsv_tpu.core import dist

    dist.initialize(f"localhost:{port}", nprocs, pid,
                    platform="cpu", num_cpu_devices=4)

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * nprocs, jax.device_count()
    assert dist.is_primary() == (pid == 0)

    import dataclasses

    from mgsv_tpu.config import Config
    from mgsv_tpu.core import mesh as mesh_lib
    from mgsv_tpu.models.made import MaDe
    from mgsv_tpu.train.optimizer import make_optimizer
    from mgsv_tpu.train.step import create_state, make_train_step

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, vit_dim=16, ast_dim=24,
                                 max_v_frames=4, stride=60.0, filter_sec=60.0),
        model=dataclasses.replace(
            cfg.model, dim_input=8, temporal_mlp_dim=16, detr_ffn_dim=16,
            temporal_heads=2, detr_heads=2, detr_enc_layers=1,
            detr_dec_layers=2, contrastive_dim=8, video_pe_len=8,
            audio_pe_len=8),
    )

    mesh = mesh_lib.make_mesh((-1, 1))          # dp=8 over both processes
    assert mesh.devices.size == 4 * nprocs

    model = MaDe(cfg)
    # Global batch 16 -> 8 per process; every process draws the same seed so
    # shard i of the global batch is identical no matter who owns it.
    rng = np.random.RandomState(0)
    gbs, S = 16, cfg.data.max_snippet_num
    full = {
        "frame_feats": rng.randn(gbs, 4, 16).astype(np.float32),
        "frame_mask": np.ones((gbs, 4), np.float32),
        "segment_feats": rng.randn(gbs, S, 24).astype(np.float32),
        "segment_mask": np.ones((gbs, S), np.float32),
        "spans_target": np.tile(np.asarray([[0.5, 0.2]], np.float32),
                                (gbs, 1))[:, None, :],
        "gt_moment": np.tile(np.asarray([[96.0, 144.0]], np.float32),
                             (gbs, 1))[:, None, :],
        "m_duration": np.full((gbs,), 200.0, np.float32),
        "v_duration": np.full((gbs,), 30.0, np.float32),
    }
    sharding = mesh_lib.batch_sharding(mesh)
    local_rows = gbs // nprocs
    batch = {
        k: jax.make_array_from_process_local_data(
            sharding, v[pid * local_rows:(pid + 1) * local_rows])
        for k, v in full.items()
    }

    tx = make_optimizer(cfg, total_steps=100)
    state = create_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    state = mesh_lib.replicate(mesh, state)
    train_step = make_train_step(model, cfg)

    key = jax.random.PRNGKey(1)
    for _ in range(2):
        state, log = train_step(state, batch, key)
    # the loss is replicated: every process must hold the same value
    loss = float(jax.device_get(log["loss"].addressable_data(0)))
    dist.barrier("after-step")
    print(f"MP_OK pid={pid} loss={loss:.6f} step={int(state.step)}",
          flush=True)


if __name__ == "__main__":
    main()
