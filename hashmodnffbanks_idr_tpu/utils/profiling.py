"""Profiling / roofline accounting — the observability subsystem the
reference lacks (SURVEY.md §5: "TPU build needs real profiling").

  * :func:`trace` — context manager around jax.profiler traces (view in
    TensorBoard's profile plugin or xprof).
  * :func:`step_flops` — analytic FLOP model of one train step for the IDR
    workload, used to report achieved vs peak utilization.
  * :func:`roofline_report` — measured step time -> TFLOP/s + fraction of
    peak (defaults to TPU v5e bf16 peak).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def mlp_flops(dims, n_points: int) -> float:
    f = 0.0
    for i in range(len(dims) - 1):
        f += 2.0 * dims[i] * dims[i + 1] * n_points
    return f


def step_flops(num_pixels: int, n_steps: int = 100, sphere_iters: int = 10,
               secant_steps: int = 8, hidden: int = 512, n_hidden: int = 8,
               embed_dim: int = 59, feature: int = 256,
               hierarchical_sweep: bool = True) -> Dict[str, float]:
    """Rough forward-FLOP model of one training step (R rays)."""
    from ..models.ray_tracing import _sweep_stride

    dims = [embed_dim] + [hidden] * n_hidden + [1 + feature]
    per_pt = mlp_flops(dims, 1)
    # ONE fused sweep serves both the sampler and the min-SDF fallback
    # (models/ray_tracing.py fuses them into a single evaluation per ray) —
    # counted once, not per consumer.  With the hierarchical sweep the grid
    # is probed at n_c coarse + 3(s-1) refined points instead of densely.
    stride = _sweep_stride(n_steps) if hierarchical_sweep else None
    if stride is not None:
        sweep_evals = (n_steps - 1) // stride + 1 + 3 * (stride - 1)
    else:
        sweep_evals = n_steps
    sweep_pts = num_pixels * sweep_evals
    trace_pts = num_pixels * (2 * sphere_iters + secant_steps + 8)
    train_pts = num_pixels * 2 + num_pixels // 2  # sdf+grad sites
    fwd = per_pt * (sweep_pts + trace_pts)
    train = per_pt * train_pts * 6              # fwd+bwd+2nd order ~6x
    return {
        "tracer_fwd_flops": fwd,
        "train_path_flops": train,
        "total_flops": fwd + train,
    }


def roofline_report(step_time_s: float, num_pixels: int,
                    peak_tflops: float = 197.0, **kw) -> Dict[str, float]:
    f = step_flops(num_pixels, **kw)
    achieved = f["total_flops"] / step_time_s / 1e12
    return {
        "step_time_ms": step_time_s * 1e3,
        "rays_per_s": num_pixels / step_time_s,
        "achieved_tflops": achieved,
        "peak_fraction": achieved / peak_tflops,
        **{k: v / 1e9 for k, v in f.items()},
    }
