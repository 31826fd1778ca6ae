"""Per-encoder train-step benchmark (same workload shape as bench.py).

Usage:
    python scripts/encoder_bench.py --embed_type HashGridTcnn --log2 15
    python scripts/encoder_bench.py --embed_type StyleModNFFB           # flagship

Measures the full jitted train step (fwd + bwd + clipped Adam) at 2048
rays/step with the chosen point encoder, using the same windowed wall-clock
protocol as bench.py. This is the harness behind the large-table (ngp
preset) numbers in RESULTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--embed_type", default="HashGridTcnn")
    p.add_argument("--viewdirs_embed_type", default="NerfPos")
    p.add_argument("--log2", type=int, default=15,
                   help="log2_max_hash_size (reference Tcnn presets: 15; "
                        "historical CUDA runconf: 19; NFFB flagship: 5)")
    p.add_argument("--num_pixels", type=int, default=2048)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from hashmodnffbanks_idr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from hashmodnffbanks_idr_tpu.models.loss import IDRLossConfig
    from hashmodnffbanks_idr_tpu.models.renderer import IDRNetwork
    from hashmodnffbanks_idr_tpu.testing import flagship_conf, synthetic_scene
    from hashmodnffbanks_idr_tpu.train.trainer import build_train_step
    from hashmodnffbanks_idr_tpu.utils.sampling import sample_pixels

    conf = flagship_conf(num_pixels=args.num_pixels,
                         embed_type=args.embed_type,
                         viewdirs_embed_type=args.viewdirs_embed_type)
    conf.put("model.embedding_network.log2_max_hash_size", args.log2)
    model = IDRNetwork(conf.get_config("model"))
    loss_cfg = IDRLossConfig(eikonal_weight=0.1, mask_weight=200.0, alpha=50.0)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))

    params = model.init(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    state = {"params": params, "opt_state": optimizer.init(params)}

    scene_np = synthetic_scene(n_views=2, img_res=(1200, 1600), seed=0)
    scene = {k: jnp.asarray(v) for k, v in scene_np.items()}

    step = build_train_step(model, loss_cfg, optimizer)
    img_idx = jnp.asarray([0], dtype=jnp.int32)
    alpha = jnp.asarray(50.0, dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    pix_fn = jax.jit(lambda k: sample_pixels(k, 1200 * 1600, args.num_pixels))

    t0 = time.time()
    i = 0
    for _ in range(2):
        k = jax.random.fold_in(rng, i)
        state, losses = step(state, scene, img_idx, pix_fn(k), k, alpha)
        i += 1
    float(losses["loss"])
    compile_time = time.time() - t0

    for _ in range(3):  # flush the post-compile transient
        k = jax.random.fold_in(rng, i)
        state, losses = step(state, scene, img_idx, pix_fn(k), k, alpha)
        float(losses["loss"])
        i += 1

    window_times = []
    for _ in range(args.windows):
        t0 = time.time()
        for _ in range(args.steps):
            k = jax.random.fold_in(rng, i)
            state, losses = step(state, scene, img_idx, pix_fn(k), k, alpha)
            i += 1
        loss = float(losses["loss"])
        window_times.append(time.time() - t0)
    dt = float(np.median(window_times))
    print("# windows ms/step: "
          + " ".join(f"{t / args.steps * 1000:.1f}" for t in window_times),
          file=sys.stderr)
    print(json.dumps({
        "embed_type": args.embed_type,
        "log2_max_hash_size": args.log2,
        "params": n_params,
        "step_ms": round(dt / args.steps * 1000, 2),
        "rays_per_s": round(args.steps * args.num_pixels / dt, 1),
        "compile_s": round(compile_time, 1),
        "loss": round(loss, 4),
    }))


if __name__ == "__main__":
    main()
