#!/usr/bin/env python
"""Time the training step's components on the current device.

Splits the flagship workload (bench.py shape) into: tracer, fused-sweep SDF,
AD forward, eikonal double-grad, rendering, loss+grad, optimizer — so perf
work can target the dominant stage instead of guessing.

    python scripts/step_breakdown.py [--num-pixels 2048] [--reps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(out):
    """Host readback of one element — block_until_ready under-reports on the
    remote-TPU runtime (see bench.py), a D2H readback does not."""
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def timeit(fn, *args, reps=20, warmup=2):
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.time() - t0) / reps * 1000.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-pixels", type=int, default=2048)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--embed_type", default="StyleModNFFB")
    p.add_argument("--log2", type=int, default=5)
    p.add_argument("--prune_march", type=int, default=0,
                   help="level-pruned guidance: K levels for the march")
    p.add_argument("--prune_coarse", type=int, default=0,
                   help="level-pruned guidance: K levels for sweep coarse probes")
    p.add_argument("--prune_secant", type=int, default=0,
                   help="first m secant iters on the guidance SDF")
    p.add_argument("--no_prune_floor", action="store_true",
                   help="disable floor-corner guidance interp")
    p.add_argument("--tracer", default=None, choices=["mixed", "fast", "exact"],
                   help="override model.tracer_fast")
    p.add_argument("--json", default=None, help="also write the rows here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from hashmodnffbanks_idr_tpu.geometry.cameras import get_camera_params
    from hashmodnffbanks_idr_tpu.models.loss import IDRLossConfig, idr_loss
    from hashmodnffbanks_idr_tpu.models.ray_tracing import ray_trace
    from hashmodnffbanks_idr_tpu.models.renderer import IDRNetwork
    from hashmodnffbanks_idr_tpu.testing import flagship_conf, synthetic_scene
    from hashmodnffbanks_idr_tpu.train.trainer import build_train_step
    from hashmodnffbanks_idr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    R = args.num_pixels
    conf = flagship_conf(num_pixels=R, small=False, embed_type=args.embed_type)
    conf.put("model.embedding_network.log2_max_hash_size", args.log2)
    if args.prune_march:
        conf.put("model.ray_tracer.prune_levels_march", args.prune_march)
    if args.prune_coarse:
        conf.put("model.ray_tracer.prune_levels_coarse", args.prune_coarse)
    if args.prune_secant:
        conf.put("model.ray_tracer.prune_secant_iters", args.prune_secant)
    if args.no_prune_floor:
        conf.put("model.ray_tracer.prune_floor_interp", False)
    if args.tracer:
        conf.put("model.tracer_fast", args.tracer)
    model = IDRNetwork(conf.get_config("model"))
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    state = {"params": params, "opt_state": optimizer.init(params)}
    scene_np = synthetic_scene(n_views=2, img_res=(1200, 1600), seed=0)
    scene = {k: jnp.asarray(v) for k, v in scene_np.items()}
    rng = jax.random.PRNGKey(1)
    pix = jax.random.choice(rng, 1200 * 1600, (R,), replace=False)

    # build the model inputs exactly as the trainer does
    uv_full = scene["uv"]
    inputs = {
        "intrinsics": scene["intrinsics"][0:1],
        "uv": uv_full[pix][None],
        "pose": scene["pose"][0:1],
        "object_mask": scene["mask"][0][pix][None],
    }
    rgb_gt = scene["rgb"][0][pix][None]

    reps = args.reps
    rows = []

    # 1. full train step
    step = build_train_step(model, IDRLossConfig(0.1, 200.0, 50.0), optimizer)
    img_idx = jnp.asarray([0], dtype=jnp.int32)
    alpha = jnp.asarray(50.0)
    holder = {"state": state}

    def f_step():
        holder["state"], losses = step(holder["state"], scene, img_idx, pix, rng, alpha)
        return losses["loss"]

    rows.append(("full train step", timeit(f_step, reps=reps)))
    params = holder["state"]["params"]  # re-point: original params were donated

    # 2. loss fwd only (no grad)
    loss_cfg = IDRLossConfig(0.1, 200.0, 50.0)

    def fwd_loss(params, inputs, rgb_gt, rng, alpha):
        out = model.apply(params, inputs, rng, training=True)
        losses = idr_loss(loss_cfg, out, rgb_gt, alpha)
        return losses["loss"]

    f_fwd = jax.jit(fwd_loss)
    rows.append(("forward+loss (no bwd)",
                 timeit(f_fwd, params, inputs, rgb_gt, rng, alpha, reps=reps)))

    # 3. value_and_grad (no optimizer).  NOTE: the grads pytree must be a jit
    # OUTPUT — returning only the value lets XLA dead-code-eliminate the whole
    # backward pass (this bug made r3/r4 breakdowns report fwd+bwd ~= fwd and
    # misattribute the backward to the "optimizer phase", VERDICT r4 weak #2).
    f_vg = jax.jit(lambda p, i, g, r, a: jax.value_and_grad(fwd_loss)(p, i, g, r, a))
    rows.append(("fwd+bwd (no opt)",
                 timeit(f_vg, params, inputs, rgb_gt, rng, alpha, reps=reps)))

    # 3b. optimizer phase alone: clipped-Adam update on precomputed grads.
    _, grads = f_vg(params, inputs, rgb_gt, rng, alpha)

    def f_opt(params, grads, opt_state):
        updates, new_opt = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    f_opt_j = jax.jit(f_opt)
    rows.append(("optimizer only (clip+adam)",
                 timeit(f_opt_j, params, grads, holder["state"]["opt_state"], reps=reps)))

    # 4. tracer only (stop-grad), honoring the model's tracer mode: 'exact'
    # measures the f32 implementation (fused Pallas kernel when
    # tracer_exact_fused, else the XLA path) — same selection as
    # IDRNetwork.apply
    p_ng = jax.lax.stop_gradient(params["implicit_network"])
    on_tpu = jax.default_backend() == "tpu"
    if model.tracer_mode == "exact":
        if on_tpu and model.tracer_exact_fused:
            sdf_fast = model.implicit_network.make_fast_sdf(p_ng, precision="f32")
        else:
            sdf_fast = lambda x: model.implicit_network.sdf(p_ng, x)
    elif on_tpu:
        sdf_fast = model.implicit_network.make_fast_sdf(p_ng)
    else:
        sdf_fast = lambda x: model.implicit_network.apply(p_ng, x, fast=True)[..., 0]

    # guidance SDFs (mirrors IDRNetwork.apply)
    rt_cfg = model.ray_tracer
    guide = None
    if ((rt_cfg.prune_levels_march or rt_cfg.prune_levels_coarse)
            and model.implicit_network.supports_level_pruning()):
        def _pruned(K):
            if jax.default_backend() == "tpu":
                return model.implicit_network.make_fast_sdf(
                    p_ng, max_level=K, floor_interp=rt_cfg.prune_floor_interp)
            return lambda x: model.implicit_network.apply(
                p_ng, x, fast=True, max_level=K,
                floor_interp=rt_cfg.prune_floor_interp)[..., 0]
        fns, guide = {}, {}
        for key, K in (("march", rt_cfg.prune_levels_march),
                       ("coarse", rt_cfg.prune_levels_coarse)):
            if K > 0:
                guide[key] = fns.setdefault(K, _pruned(K))

    @jax.jit
    def tracer_only(inputs, rng):
        ray_dirs, cam_loc = get_camera_params(
            inputs["uv"], inputs["pose"], inputs["intrinsics"])
        mask = inputs["object_mask"].reshape(-1).astype(bool)
        tr = ray_trace(model.ray_tracer, sdf_fast, cam_loc, mask, ray_dirs, rng,
                       training=True, sdf_guidance=guide)
        return tr.points

    rows.append(("tracer total", timeit(tracer_only, inputs, rng, reps=reps)))

    # 5. fused sweep SDF alone (R*100 points, fast path)
    pts_sweep = jax.random.normal(rng, (R * 100, 3)) * 0.3
    f_sweep = jax.jit(lambda x: sdf_fast(x))
    rows.append((f"sweep sdf_fast ({R*100} pts)", timeit(f_sweep, pts_sweep, reps=reps)))

    # 6. sphere-trace loop proxy: 2*R-point fast SDF x ~13 sequential calls
    pts_small = pts_sweep[: 2 * R]
    rows.append((f"sdf_fast ({2*R} pts) x1", timeit(f_sweep, pts_small, reps=reps)))

    # 7. AD forward (full f32 apply) at R points
    pts_r = pts_sweep[:R]
    f_ad = jax.jit(lambda x: model.implicit_network.apply(params["implicit_network"], x))
    rows.append((f"implicit AD fwd ({R})", timeit(f_ad, pts_r, reps=reps)))

    # 8. gradient (vjp) at 1.5*R points
    pts_g = pts_sweep[: R + R // 2]
    f_g = jax.jit(lambda x: model.implicit_network.gradient(params["implicit_network"], x))
    rows.append((f"implicit vjp grad ({R + R//2})", timeit(f_g, pts_g, reps=reps)))

    # 9. eikonal double grad: d/dparams of sum(|grad|) at 1.5*R
    def eik(p, x):
        g = model.implicit_network.gradient(p, x)
        return jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    f_eik = jax.jit(lambda p, x: jax.tree_util.tree_leaves(jax.grad(eik)(p, x))[0].ravel()[0])
    rows.append((f"eikonal 2nd-order bwd ({R + R//2})", timeit(f_eik, params["implicit_network"], pts_g, reps=reps)))

    # 10. rendering net at R points
    f_rgb = jax.jit(lambda x: model.rendering_network.apply(
        params["rendering_network"], x, x, x, jnp.zeros((R, 256))))
    rows.append((f"rendering fwd ({R})", timeit(f_rgb, pts_r, reps=reps)))

    w = max(len(r[0]) for r in rows)
    for name, ms in rows:
        print(f"{name:<{w}}  {ms:8.2f} ms")
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump({
                "embed_type": args.embed_type,
                "log2_max_hash_size": args.log2,
                "num_pixels": R,
                "device": str(jax.devices()[0].device_kind),
                "rows_ms": {name: round(ms, 3) for name, ms in rows},
            }, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
