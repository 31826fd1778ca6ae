#!/usr/bin/env python
"""Ray-sharded scaling benchmark: rays/s and efficiency at 1..N devices.

The BASELINE.json north star asks for rays/s scaling efficiency at 1 chip /
1 host / >=2 hosts (target >=80%).  This harness runs the full sharded train
step on a ('data','model') mesh of increasing size and reports throughput +
efficiency vs the 1-device run.  On a single-chip box it can be exercised
with virtual CPU devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --devices 1 2 4 8 --num-pixels 512

On a real pod slice it measures actual ICI-scaled throughput.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    # virtual-device mode: this environment's sitecustomize pre-imports jax
    # with the TPU plugin, so force the CPU backend the way tests/conftest.py
    # does (env alone is consumed too early).
    sys.argv.remove("--cpu")
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--num-pixels", type=int, default=2048)
    p.add_argument("--n-model", type=int, default=1)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--small", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from hashmodnffbanks_idr_tpu.models.loss import IDRLossConfig
    from hashmodnffbanks_idr_tpu.models.renderer import IDRNetwork
    from hashmodnffbanks_idr_tpu.parallel.sharding import (
        make_mesh, param_sharding, ray_sharding, replicated)
    from hashmodnffbanks_idr_tpu.testing import flagship_conf, synthetic_scene
    from hashmodnffbanks_idr_tpu.train.trainer import build_train_step
    from hashmodnffbanks_idr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    conf = flagship_conf(num_pixels=args.num_pixels, small=args.small)
    model = IDRNetwork(conf.get_config("model"))
    loss_cfg = IDRLossConfig(0.1, 200.0, 50.0)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))

    scene_np = synthetic_scene(2, (1200, 1600))
    results = []
    base_rps = None
    for nd in args.devices:
        if nd > len(jax.devices()):
            print(f"skip {nd} devices (only {len(jax.devices())})")
            continue
        mesh = make_mesh(n_data=nd // args.n_model, n_model=args.n_model,
                         devices=jax.devices()[:nd])
        params = model.init(jax.random.PRNGKey(0))
        state = {
            "params": jax.device_put(params, param_sharding(params, mesh)),
            "opt_state": jax.device_put(optimizer.init(params), replicated(mesh)),
        }
        scene = {k: jax.device_put(jnp.asarray(v), replicated(mesh))
                 for k, v in scene_np.items()}
        step = build_train_step(model, loss_cfg, optimizer, mesh=mesh)
        img_idx = jax.device_put(jnp.asarray([0], dtype=jnp.int32), replicated(mesh))
        alpha = jnp.asarray(50.0)
        rng = jax.random.PRNGKey(1)

        def pix(k):
            return jax.device_put(
                jax.random.choice(k, 1200 * 1600, (args.num_pixels,), replace=False),
                ray_sharding(mesh))

        with mesh:
            k = jax.random.fold_in(rng, 0)
            state, losses = step(state, scene, img_idx, pix(k), k, alpha)
            float(losses["loss"])
            t0 = time.time()
            for i in range(1, args.steps + 1):
                k = jax.random.fold_in(rng, i)
                state, losses = step(state, scene, img_idx, pix(k), k, alpha)
                if i % 5 == 0:
                    float(losses["loss"])
            float(losses["loss"])
            dt = time.time() - t0
        rps = args.steps * args.num_pixels / dt
        if base_rps is None:
            base_rps = rps
        eff = rps / (base_rps * nd)
        results.append({"devices": nd, "rays_per_s": round(rps, 1),
                        "efficiency": round(eff, 3)})
        print(json.dumps(results[-1]))
    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
