"""Benchmark: training throughput (rays/s) on the reference workload.

Workload = the reference's training step shape (BASELINE.md): 2048 rays/step,
1 image/step, StyleModNFFB encoder, 8x512 SDF MLP + 4x512 rendering MLP,
sphere tracing (<=10 iters, 3 line-search) + 100-sample fallback + 8 secant
steps, second-order eikonal — full fwd+bwd+Adam, jitted, on whatever device
JAX provides (the driver runs this on one real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is reported against this repo's own recorded round-1 number when available
(BENCH_BASELINE.json), else 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _measure(conf, num_pixels, scene, n_windows, win_steps, label):
    """Train-step throughput for one conf: median of n_windows x win_steps
    wall-clock windows with a dependent host readback at each window end
    (per-step block_until_ready under-reports on this platform; very deep
    unsynced queues degrade it).  The first post-compile steps can run
    pathologically slowly on this remote-TPU runtime (observed ~38 s/step
    before snapping to steady state), so a short flush window absorbs that
    transient.  Median over >= 3 windows keeps the number statistically
    boring (round-1's min-window read as a regression; VERDICT r1 Weak #1)."""
    import jax
    import jax.numpy as jnp
    import optax

    from hashmodnffbanks_idr_tpu.models.loss import IDRLossConfig
    from hashmodnffbanks_idr_tpu.models.renderer import IDRNetwork
    from hashmodnffbanks_idr_tpu.train.trainer import build_train_step
    from hashmodnffbanks_idr_tpu.utils.sampling import sample_pixels

    model = IDRNetwork(conf.get_config("model"))
    loss_cfg = IDRLossConfig(eikonal_weight=0.1, mask_weight=200.0, alpha=50.0)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    params = model.init(jax.random.PRNGKey(0))
    state = {"params": params, "opt_state": optimizer.init(params)}

    step = build_train_step(model, loss_cfg, optimizer)
    img_idx = jnp.asarray([0], dtype=jnp.int32)
    alpha = jnp.asarray(50.0, dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    pix_fn = jax.jit(lambda k: sample_pixels(k, 1200 * 1600, num_pixels))

    t0 = time.time()
    for i in range(2):
        k = jax.random.fold_in(rng, i)
        state, losses = step(state, scene, img_idx, pix_fn(k), k, alpha)
    jax.block_until_ready(state["params"])
    compile_time = time.time() - t0

    i = 2
    for _ in range(int(os.environ.get("BENCH_FLUSH_STEPS", "4"))):
        k = jax.random.fold_in(rng, i)
        state, losses = step(state, scene, img_idx, pix_fn(k), k, alpha)
        float(losses["loss"])
        i += 1

    window_times = []
    for _ in range(n_windows):
        t0 = time.time()
        for _ in range(win_steps):
            k = jax.random.fold_in(rng, i)
            state, losses = step(state, scene, img_idx, pix_fn(k), k, alpha)
            i += 1
        loss = float(losses["loss"])  # device->host readback forces completion
        window_times.append(time.time() - t0)
    dt = float(np.median(window_times))
    spread = (max(window_times) - min(window_times)) / dt

    print(f"# {label} windows ms/step: "
          + " ".join(f"{t / win_steps * 1000:.1f}" for t in window_times)
          + f"  (median {dt / win_steps * 1000:.1f}, spread {spread:.1%})",
          file=sys.stderr)
    print(f"# {label}: device={jax.devices()[0].device_kind} "
          f"steps={win_steps} step_time={dt/win_steps*1000:.1f}ms "
          f"compile={compile_time:.1f}s loss={loss:.4f}", file=sys.stderr)
    return win_steps * num_pixels / dt, dt / win_steps * 1000.0


def main():
    import jax.numpy as jnp

    from hashmodnffbanks_idr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from hashmodnffbanks_idr_tpu.testing import flagship_conf, synthetic_scene

    num_pixels = 2048
    # DTU-shaped scene (1600x1200), 2 views is enough for the step shape
    scene_np = synthetic_scene(n_views=2, img_res=(1200, 1600), seed=0)
    scene = {k: jnp.asarray(v) for k, v in scene_np.items()}

    n_windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    win_steps = int(os.environ.get("BENCH_STEPS", "40"))

    conf = flagship_conf(num_pixels=num_pixels, small=False)
    rays_per_s, _ = _measure(conf, num_pixels, scene, n_windows, win_steps,
                             "flagship StyleModNFFB")

    # the documented fast mode (bf16 guidance, f32 decisions) — the shipped
    # default flipped to 'exact' in r5 on quality data (RESULTS.md); this row
    # keeps the throughput capability visible and regression-guarded
    mixed_rays = None
    if os.environ.get("BENCH_SKIP_MIXED", "0") != "1":
        conf_m = flagship_conf(num_pixels=num_pixels, small=False)
        conf_m.put("model.tracer_fast", "mixed")
        mixed_rays, _ = _measure(conf_m, num_pixels, scene,
                                 max(3, n_windows - 2), win_steps,
                                 "flagship StyleModNFFB (mixed tracer)")

    # production large-table preset (the reference's Tcnn/CUDA confs use
    # log2_max_hash_size=15): regression-guards the page-packed gather path
    # + the level-pruned tracer guidance each round (VERDICT r3 item 7)
    ngp_ms = None
    if os.environ.get("BENCH_SKIP_NGP", "0") != "1":
        conf_ngp = flagship_conf(num_pixels=num_pixels, small=False,
                                 embed_type="HashGridTcnn")
        conf_ngp.put("model.embedding_network.log2_max_hash_size", 15)
        conf_ngp.put("model.ray_tracer.prune_levels_march", 16)
        conf_ngp.put("model.ray_tracer.prune_levels_coarse", 16)
        conf_ngp.put("model.ray_tracer.prune_secant_iters", 4)
        _, ngp_ms = _measure(conf_ngp, num_pixels, scene, max(3, n_windows - 2),
                             max(20, win_steps // 2), "ngp log2=15")

    # largest reference preset (log2=19, the historical runconf in
    # trained_models/MultiresHashgrid3D): regression-guards the page-image
    # table parameter — its step went 61 -> 37 ms when the per-step
    # (rows,C)->(P,128) relayout was eliminated (SCATTER_r05.json)
    ngp19_ms = None
    if os.environ.get("BENCH_SKIP_NGP19", "0") != "1":
        conf_n19 = flagship_conf(num_pixels=num_pixels, small=False,
                                 embed_type="HashGridTcnn")
        conf_n19.put("model.embedding_network.log2_max_hash_size", 19)
        conf_n19.put("model.ray_tracer.prune_levels_march", 6)
        conf_n19.put("model.ray_tracer.prune_levels_coarse", 6)
        conf_n19.put("model.ray_tracer.prune_secant_iters", 4)
        _, ngp19_ms = _measure(conf_n19, num_pixels, scene, 3,
                               max(20, win_steps // 2), "ngp log2=19")

    baseline = 1.0
    vs = 1.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        try:
            baseline = float(json.load(open(base_path))["value"])
            vs = rays_per_s / baseline
        except Exception:
            pass

    out = {
        "metric": "train_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
    }
    presets = {}
    if mixed_rays is not None:
        presets["flagship_mixed_rays_per_s"] = round(mixed_rays, 1)
    if ngp_ms is not None:
        presets["ngp_log2_15_step_ms"] = round(ngp_ms, 2)
    if ngp19_ms is not None:
        presets["ngp_log2_19_step_ms"] = round(ngp19_ms, 2)
    if presets:
        out["presets"] = presets
    print(json.dumps(out))


if __name__ == "__main__":
    main()
