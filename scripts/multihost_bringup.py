#!/usr/bin/env python
"""Multi-host bring-up check: join the distributed runtime, build a global
mesh, run a cross-host psum and one sharded train-shaped step.

Run the SAME command on every host (process_id differing), e.g. 2 local
CPU processes:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=2 \
      python scripts/multihost_bringup.py \
        --coordinator localhost:12345 --num-processes 2 --process-id 0 &
    ... --process-id 1

On success every process prints one line:
    BRINGUP_OK procs=<n> devices=<d> psum=<d> loss=<float>

The "train-shaped step" is a tiny MLP + per-ray MSE whose ray batch is
'data'-sharded from per-host disjoint shards and whose gradients psum across
hosts — the same sharding contract as the real trainer
(parallel/sharding.py), so a pass here validates the full SPMD path.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--n-model", type=int, default=1)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu'); needed on hosts "
                        "whose site config pins a TPU plugin via env vars")
    p.add_argument("--cpu-devices", type=int, default=None,
                   help="virtual CPU device count per process")
    args = p.parse_args()

    import jax

    # config must be set before any backend initializes (the axon/TPU site
    # hook overrides JAX_PLATFORMS in the environment, so use jax.config)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.cpu_devices:
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    from hashmodnffbanks_idr_tpu.parallel import multihost

    pid, n = multihost.initialize(args.coordinator, args.num_processes,
                                  args.process_id)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    # main mesh: pure data-parallel (the psum check + ray-sharded step need
    # every process to own whole 'data' rows); --n-model drives the separate
    # interleaved table-sharding mesh below
    mesh = multihost.global_mesh(n_model=1)
    psum = multihost.all_hosts_psum_check(mesh)
    assert psum == mesh.size, (psum, mesh.size)

    # train-shaped step: data-sharded rays, replicated params, grad psum
    global_rays = 64
    local = multihost.host_batch_slice(global_rays)
    rng = multihost.host_fold_rng(jax.random.PRNGKey(0))
    x_local = np.asarray(jax.random.normal(rng, (local, 3)))
    y_local = np.asarray(jnp.sum(jnp.asarray(x_local) ** 2, -1, keepdims=True))
    x = multihost.make_global_ray_array(x_local, mesh)
    y = multihost.make_global_ray_array(y_local, mesh)

    w = jnp.zeros((3, 1))
    repl = NamedSharding(mesh, P())

    def loss_fn(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    step = jax.jit(
        lambda w, x, y: jax.value_and_grad(loss_fn)(w, x, y),
        out_shardings=(repl, repl),
    )
    loss, g = step(jax.device_put(w, repl), x, y)
    loss = float(loss)
    gnorm = float(jnp.linalg.norm(g))
    assert np.isfinite(loss) and gnorm > 0

    table_line = ""
    if args.n_model > 1:
        # Table-sharded step: an embedding table row-sharded over 'model'
        # (the hash-table TP slot, parallel/sharding.py), on a mesh whose
        # device layout interleaves processes along 'model' — with 4 procs
        # x 2 devices and n_model=4 every model group spans ALL processes,
        # so the per-ray row gather and the scatter-add gradient cross
        # process boundaries and XLA inserts the DCN collectives the real
        # trainer's table sharding relies on.
        from jax.sharding import Mesh

        devs = np.asarray(jax.devices()).reshape(args.n_model, -1).T
        mesh2 = Mesh(devs, ("data", "model"))
        span = {d.process_index for d in devs[0]}      # procs in model group 0
        assert len(span) > 1, (
            f"model axis does not span processes: {span} (need >1)")

        rows, C = 64, 4
        n_rays = 32
        tab = jax.random.normal(jax.random.PRNGKey(3), (rows, C))
        idx_full = np.asarray(jax.random.randint(
            jax.random.PRNGKey(4), (n_rays,), 0, rows), dtype=np.int32)
        y_full = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (n_rays, 1)))

        tab_shard = NamedSharding(mesh2, P("model", None))
        repl2 = NamedSharding(mesh2, P())
        mk = lambda a: jax.make_array_from_process_local_data(repl2, a)

        def tab_loss(tab, idx, y):
            emb = jnp.take(tab, idx, axis=0)          # cross-shard gather
            return jnp.mean((jnp.sum(emb, -1, keepdims=True) - y) ** 2)

        tstep = jax.jit(
            lambda t, i, y: jax.value_and_grad(tab_loss)(t, i, y),
            out_shardings=(repl2, tab_shard),
        )
        tloss, tg = tstep(jax.device_put(tab, tab_shard),
                          mk(idx_full), mk(y_full))
        tloss = float(tloss)
        from jax.experimental import multihost_utils
        tg_host = np.asarray(multihost_utils.process_allgather(tg, tiled=True))
        assert np.isfinite(tloss) and np.isfinite(tg_host).all()
        assert np.abs(tg_host).sum() > 0
        # oracle: the sharded-gradient scatter must equal the single-process
        # dense computation
        want = np.zeros((rows, C), np.float32)
        emb = np.asarray(tab)[idx_full]
        r = (emb.sum(-1, keepdims=True) - y_full) * (2.0 / n_rays)
        np.add.at(want, idx_full, np.repeat(r, C, axis=1))
        assert np.allclose(tg_host, want, rtol=1e-4, atol=1e-6)
        table_line = f" tableshard_loss={tloss:.6f} span={len(span)}"

    print(f"BRINGUP_OK procs={n} devices={mesh.size} psum={psum:.0f} "
          f"loss={loss:.6f}{table_line}", flush=True)


if __name__ == "__main__":
    main()
