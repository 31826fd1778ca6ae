#!/usr/bin/env python
"""Roofline report for the training step: measured rays/s vs speed-of-light.

Runs a few train steps on the current device, then prints the analytic
FLOP model (utils/profiling.py) against the device peak.

    python scripts/roofline.py [--num-pixels 2048] [--peak-tflops 197]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-pixels", type=int, default=2048)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="bf16 peak of the chip (v5e=197, v4=275, v5p=459)")
    p.add_argument("--small", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from hashmodnffbanks_idr_tpu.models.loss import IDRLossConfig
    from hashmodnffbanks_idr_tpu.models.renderer import IDRNetwork
    from hashmodnffbanks_idr_tpu.testing import flagship_conf, synthetic_scene
    from hashmodnffbanks_idr_tpu.train.trainer import build_train_step
    from hashmodnffbanks_idr_tpu.utils.compile_cache import enable_compile_cache
    from hashmodnffbanks_idr_tpu.utils.profiling import roofline_report

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
    pix_fn = jax.jit(lambda k: jax.random.choice(
        k, 1200 * 1600, (args.num_pixels,), replace=False))

    k = jax.random.fold_in(rng, 0)
    state, losses = step(state, scene, img_idx, pix_fn(k), k, alpha)
    float(losses["loss"])
    t0 = time.time()
    for i in range(1, args.steps + 1):
        k = jax.random.fold_in(rng, i)
        state, losses = step(state, scene, img_idx, pix_fn(k), k, alpha)
    float(losses["loss"])
    dt = (time.time() - t0) / args.steps

    rep = roofline_report(dt, args.num_pixels, peak_tflops=args.peak_tflops)
    print(json.dumps({k: round(v, 4) for k, v in rep.items()}, indent=2))


if __name__ == "__main__":
    main()
