#!/usr/bin/env python
"""On-chip microbenchmarks behind the hash-grid design (ops/hashgrid.py).

Measures the primitives that bound any TPU hash-grid implementation —
XLA gather at several row widths/dtypes, sort, scatter-add variants, and the
page-gather + fused one-hot lane-select used by the large-table path —
with chained-iteration timing and host-readback sync (block_until_ready
under-reports on remote runtimes; see RESULTS.md).

    python scripts/gather_roofline.py [--lookups 3250000] [--iters 8]

Conclusions current as of round 2 (TPU v5e): gather cost is per-lookup
(~2.6 ns at 512 B rows, ~4.4 ns narrow), table-size independent, linear in
count; 26M-lookup sweeps are therefore gather-floor-bound and a Pallas
kernel cannot help (no VMEM row gather on this backend).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lookups", type=int, default=3_250_000)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hashmodnffbanks_idr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    M, K = args.lookups, args.iters
    R = 1 << 22
    idx = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, R - 2, jnp.int32)

    def measure(fn, name, *fargs):
        def mk(iters):
            @jax.jit
            def run(seed, *a):
                def body(i, carry):
                    return carry ^ (fn(carry, *a) + i)
                return jax.lax.fori_loop(0, iters, body, seed)
            return run
        r1, rK = mk(1), mk(K + 1)
        s0 = jnp.int32(1)
        np.asarray(r1(s0, *fargs)); np.asarray(rK(s0, *fargs))
        best = []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(r1(s0, *fargs))
            t1 = time.perf_counter(); np.asarray(rK(s0, *fargs))
            t2 = time.perf_counter()
            best.append(((t2 - t1) - (t1 - t0)) / K * 1e3)
        print(f"{name}: {min(best):.2f} ms  ({min(best)*1e6/M:.2f} ns/lookup)")

    def perturb(seed, mod):
        return (idx + seed) % mod

    # gather vs row width
    for W, dt in [(2, jnp.float32), (128, jnp.float32), (128, jnp.bfloat16)]:
        Rw = min(R, (1 << 23) // W)
        tbl = jnp.zeros((Rw, W), dt)
        def f(seed, t, Rw=Rw):
            v = jnp.take(t, perturb(seed, Rw), axis=0)
            return jnp.sum(v.astype(jnp.float32)).astype(jnp.int32)
        measure(f, f"take ({Rw},{W}) {dt.__name__}", tbl)

    # page gather + fused one-hot lane select (the shipped large-table path)
    P = R // 64
    iota128 = jnp.arange(128, dtype=jnp.int32)
    for dt in (jnp.float32, jnp.bfloat16):
        pages = jnp.zeros((P, 128), dt)
        def f_page(seed, pg):
            i = perturb(seed, R - 2)
            g = jnp.take(pg, i >> 6, axis=0)
            oh = (iota128[None, :] == ((i & 63) * 2)[:, None]).astype(pg.dtype)
            return jnp.sum((g * oh).astype(jnp.float32)).astype(jnp.int32)
        measure(f_page, f"page-gather+select {dt.__name__}", pages)

    # sort / scatter (backward-path primitives)
    flat = jnp.zeros((R,), jnp.float32)
    measure(lambda s: jnp.sort(perturb(s, R))[0].astype(jnp.int32),
            "sort int32")
    def f_scat(seed, t):
        out = jnp.zeros((R,), jnp.float32).at[perturb(seed, R)].add(1.0)
        return out[0].astype(jnp.int32) + seed
    measure(f_scat, "scatter-add unsorted", flat)


if __name__ == "__main__":
    main()
