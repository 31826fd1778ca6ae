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

    mesh = multihost.global_mesh(n_model=args.n_model)
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
    print(f"BRINGUP_OK procs={n} devices={mesh.size} psum={psum:.0f} "
          f"loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
