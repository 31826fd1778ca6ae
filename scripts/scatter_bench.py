#!/usr/bin/env python
"""Micro-benchmark: hash-table gradient scatter strategies on the ngp presets.

The train step's backward scatters ~N*L*2^D weighted contributions into the
packed table (the CUDA reference's atomicAdd, hashencoder.cu:324-339).  This
measures the candidates on-chip:

  A. autodiff of the page-gather forward (current: XLA scatter-add on the
     (P, 128) page image)
  B. direct scatter-add into the (R, C) table (jnp .at[].add)
  C. sort-by-row + segment_sum with indices_are_sorted
  D. (reference point) forward-only encode

    python scripts/scatter_bench.py [--log2 19] [--n 3072]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(out):
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.time() - t0) / reps * 1000.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log2", type=int, default=19)
    p.add_argument("--n", type=int, default=3072)
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from hashmodnffbanks_idr_tpu.ops import hashgrid as hg

    spec = hg.HashGridSpec(
        input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=args.log2, desired_resolution=512, variant="ngp",
    )
    key = jax.random.PRNGKey(0)
    table = hg.init_table(key, spec)
    N = args.n
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    cot = jax.random.normal(jax.random.PRNGKey(2), (N, spec.output_dim()))
    L, C, D = spec.num_levels, spec.level_dim, spec.input_dim
    K = 1 << D

    rows_ms = {}

    # D. forward only
    f_fwd = jax.jit(lambda t: hg.hash_encode(x, t, spec))
    rows_ms["fwd encode"] = timeit(f_fwd, table, reps=args.reps)

    # A. autodiff backward (current path)
    f_grad = jax.jit(jax.grad(lambda t: jnp.vdot(hg.hash_encode(x, t, spec), cot)))
    rows_ms["A: autodiff (page scatter)"] = timeit(f_grad, table, reps=args.reps)

    # shared precomputation for manual backwards: rows + weights
    floor, frac = hg._positions(spec, x)
    bits = jnp.asarray(hg._corner_bits(D), dtype=jnp.int32)
    corners = floor[:, :, None, :] + bits[None, None, :, :]
    rows = hg._level_indices(spec, corners)          # (N, L, K)
    w = hg._interp_weights(spec, frac)               # (N, L, K)
    gout = cot.reshape(N, L, C)                      # (N, L, C)
    contrib = (w[..., None] * gout[:, :, None, :])   # (N, L, K, C)

    # B. direct scatter-add into (R, C)
    narrow = jax.jit(lambda t: hg.as_rows(t, spec))(table)

    def back_b(contrib, rows):
        return jnp.zeros_like(narrow).at[rows.reshape(-1)].add(
            contrib.reshape(-1, C))
    f_b = jax.jit(back_b)
    rows_ms["B: direct .at[].add"] = timeit(f_b, contrib, rows, reps=args.reps)

    # C. sort + segment_sum(indices_are_sorted)
    def back_c(contrib, rows):
        flat_rows = rows.reshape(-1)
        order = jnp.argsort(flat_rows)
        sorted_rows = flat_rows[order]
        sorted_contrib = contrib.reshape(-1, C)[order]
        return jax.ops.segment_sum(
            sorted_contrib, sorted_rows, num_segments=narrow.shape[0],
            indices_are_sorted=True)
    f_c = jax.jit(back_c)
    rows_ms["C: sort + segment_sum"] = timeit(f_c, contrib, rows, reps=args.reps)

    contribs = N * L * K
    w_name = max(len(k) for k in rows_ms)
    for k, ms in rows_ms.items():
        print(f"{k:<{w_name}}  {ms:8.3f} ms   ({ms*1e6/contribs:6.2f} ns/contrib)")


if __name__ == "__main__":
    main()
