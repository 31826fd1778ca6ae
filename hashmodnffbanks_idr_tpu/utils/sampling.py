"""Fast uniform without-replacement pixel sampling.

Role of the reference's per-step ``torch.randperm(total_pixels)[:n]``
(scene_dataset.py:113-117): a uniformly random n-subset of the pixel grid in
uniformly random order.  ``jax.random.choice(..., replace=False)`` implements
that by sorting keys for ALL ``total`` pixels — ~7.4 ms/step for a 1200x1600
image on TPU v5e, 31% of the whole training step.

This module uses oversample + first-occurrence dedupe instead: draw
``oversample*n`` iid uniform indices and keep the first ``n`` distinct values
in draw order.  The sequence of distinct values of an iid uniform stream is
distributed exactly as sampling without replacement, so the result is an
unbiased uniform n-subset in uniform random order — same distribution as the
reference, at O(oversample*n log(oversample*n)) cost (~0.1 ms): the sort
touches 3n keys instead of ``total``.

With n=2048 of 1.92M pixels and oversample=3, the expected number of
duplicate draws is m^2/(2*total) ~ 10; the probability that fewer than n
distinct values appear is astronomically small.  If it ever happens, the
missing tail slots keep their fill value (index 0) — detectable but
practically unreachable (P < 1e-300 for the DTU shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pixels(key: jax.Array, total: int, n: int,
                  oversample: int = 3) -> jnp.ndarray:
    """Uniform random n-subset of range(total), in uniform random order."""
    if n >= total:
        return jax.random.permutation(key, total)[:n]
    m = oversample * n
    draws = jax.random.randint(key, (m,), 0, total, dtype=jnp.int32)

    # mark first occurrences: stable argsort groups equal values with draw
    # order preserved, so the group head is the earliest draw of that value
    order = jnp.argsort(draws)
    sorted_d = draws[order]
    head = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_d[1:] != sorted_d[:-1]])
    keep = jnp.zeros((m,), jnp.bool_).at[order].set(head)

    # compact the first n kept draws (in draw order) into the output
    rank = jnp.cumsum(keep) - 1                       # rank among kept
    slot = jnp.where(keep & (rank < n), rank, n)      # n = discard slot
    out = jnp.zeros((n + 1,), draws.dtype).at[slot].set(draws)
    return out[:n]
