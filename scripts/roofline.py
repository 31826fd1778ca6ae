#!/usr/bin/env python
"""Roofline report for the training step: measured rays/s vs speed-of-light.

Uses the SAME methodology as bench.py (sample_pixels hot-path sampler, flush
window for the post-compile transient, >=5 x 40-step chained windows with one
end-of-window readback, median) so its step time agrees with the bench within
noise, then prints the analytic FLOP model (utils/profiling.py) against the
device peak.  Pass --json to also write a ROOFLINE_r*.json artifact.

    python scripts/roofline.py [--num-pixels 2048] [--peak-tflops 197] \
        [--json ROOFLINE_r03.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-pixels", type=int, default=2048)
    p.add_argument("--windows", type=int, default=5)
    p.add_argument("--steps", type=int, default=40, help="steps per window")
    p.add_argument("--flush-steps", type=int, default=4)
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="bf16 peak of the chip (v5e=197, v4=275, v5p=459)")
    p.add_argument("--small", action="store_true")
    p.add_argument("--json", default=None, help="also write the report here")
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from hashmodnffbanks_idr_tpu.models.loss import IDRLossConfig
    from hashmodnffbanks_idr_tpu.models.renderer import IDRNetwork
    from hashmodnffbanks_idr_tpu.testing import flagship_conf, synthetic_scene
    from hashmodnffbanks_idr_tpu.train.trainer import build_train_step
    from hashmodnffbanks_idr_tpu.utils.compile_cache import enable_compile_cache
    from hashmodnffbanks_idr_tpu.utils.profiling import roofline_report
    from hashmodnffbanks_idr_tpu.utils.sampling import sample_pixels

    enable_compile_cache()
    conf = flagship_conf(num_pixels=args.num_pixels, small=args.small)
    model = IDRNetwork(conf.get_config("model"))
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    params = model.init(jax.random.PRNGKey(0))
    state = {"params": params, "opt_state": optimizer.init(params)}
    scene = {k: jnp.asarray(v) for k, v in synthetic_scene(2, (1200, 1600)).items()}
    step = build_train_step(model, IDRLossConfig(0.1, 200.0, 50.0), optimizer)
    img_idx = jnp.asarray([0], dtype=jnp.int32)
    alpha = jnp.asarray(50.0)
    rng = jax.random.PRNGKey(1)
    pix_fn = jax.jit(lambda k: sample_pixels(k, 1200 * 1600, args.num_pixels))

    def run(i0, n):
        losses = None
        for i in range(i0, i0 + n):
            k = jax.random.fold_in(rng, i)
            nonlocal_state[0], losses = step(
                nonlocal_state[0], scene, img_idx, pix_fn(k), k, alpha)
        float(losses["loss"])  # one dependent readback closes the window
        return i0 + n

    nonlocal_state = [state]
    i = run(0, 2)                       # compile
    i = run(i, args.flush_steps)        # flush the post-compile transient

    window_times = []
    for _ in range(args.windows):
        t0 = time.time()
        i = run(i, args.steps)
        window_times.append(time.time() - t0)
    dt = float(np.median(window_times)) / args.steps
    spread = (max(window_times) - min(window_times)) / (dt * args.steps)

    print("# windows ms/step: "
          + " ".join(f"{t / args.steps * 1000:.1f}" for t in window_times)
          + f"  (median {dt * 1000:.1f}, spread {spread:.1%})", file=sys.stderr)

    rep = roofline_report(dt, args.num_pixels, peak_tflops=args.peak_tflops)
    rep["device"] = jax.devices()[0].device_kind
    rep["windows_ms"] = [round(t / args.steps * 1e3, 2) for t in window_times]
    out = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in rep.items()}
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
