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


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from hashmodnffbanks_idr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from hashmodnffbanks_idr_tpu.models.loss import IDRLossConfig
    from hashmodnffbanks_idr_tpu.models.renderer import IDRNetwork
    from hashmodnffbanks_idr_tpu.testing import flagship_conf, synthetic_scene
    from hashmodnffbanks_idr_tpu.train.trainer import build_train_step

    num_pixels = 2048
    conf = flagship_conf(num_pixels=num_pixels, small=False)
    model = IDRNetwork(conf.get_config("model"))
    loss_cfg = IDRLossConfig(eikonal_weight=0.1, mask_weight=200.0, alpha=50.0)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))

    params = model.init(jax.random.PRNGKey(0))
    state = {"params": params, "opt_state": optimizer.init(params)}

    # DTU-shaped scene (1600x1200), 2 views is enough for the step shape
    scene_np = synthetic_scene(n_views=2, img_res=(1200, 1600), seed=0)
    scene = {k: jnp.asarray(v) for k, v in scene_np.items()}

    step = build_train_step(model, loss_cfg, optimizer)
    img_idx = jnp.asarray([0], dtype=jnp.int32)
    alpha = jnp.asarray(50.0, dtype=jnp.float32)

    from hashmodnffbanks_idr_tpu.utils.sampling import sample_pixels

    rng = jax.random.PRNGKey(1)
    pix_fn = jax.jit(lambda k: sample_pixels(k, 1200 * 1600, num_pixels))

    # warmup (compile)
    t0 = time.time()
    for i in range(2):
        k = jax.random.fold_in(rng, i)
        state, losses = step(state, scene, img_idx, pix_fn(k), k, alpha)
    jax.block_until_ready(state["params"])
    compile_time = time.time() - t0

    # wall-clock windows with a dependent host readback at each window end
    # (per-step block_until_ready under-reports on this platform; very deep
    # unsynced queues degrade it).  The first post-compile steps can run
    # pathologically slowly on this remote-TPU runtime (observed ~38 s/step
    # before snapping to steady state), so a short flush window absorbs that
    # transient; the best timed window — the device's steady-state capability
    # — is reported, per-window numbers go to stderr.
    i = 2
    for _ in range(int(os.environ.get("BENCH_FLUSH_STEPS", "4"))):
        k = jax.random.fold_in(rng, i)
        state, losses = step(state, scene, img_idx, pix_fn(k), k, alpha)
        float(losses["loss"])
        i += 1

    # Statistically boring timing: >=5 windows x >=40 steps, report the
    # MEDIAN window (round-1's 3x20-step min-window was noisy enough to
    # read as a regression; see VERDICT.md Weak #1).
    n_windows = int(os.environ.get("BENCH_WINDOWS", "5"))
    win_steps = int(os.environ.get("BENCH_STEPS", "40"))
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
    n_steps = win_steps

    print("# windows ms/step: "
          + " ".join(f"{t / win_steps * 1000:.1f}" for t in window_times)
          + f"  (median {dt / win_steps * 1000:.1f}, spread {spread:.1%})",
          file=sys.stderr)
    rays_per_s = n_steps * num_pixels / dt

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

    print(json.dumps({
        "metric": "train_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
    }))
    print(f"# device={jax.devices()[0].device_kind} steps={n_steps} "
          f"step_time={dt/n_steps*1000:.1f}ms compile={compile_time:.1f}s "
          f"loss={loss:.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
