"""Pixel-subset sampler: distribution + exactness properties.

The sampler replaces jax.random.choice(replace=False) (the reference's
torch.randperm[:n], scene_dataset.py:113-117) — it must be a uniform random
n-subset in uniform random order.
"""

import numpy as np

import jax
import jax.numpy as jnp

from hashmodnffbanks_idr_tpu.utils.sampling import sample_pixels


def test_no_duplicates_and_in_range():
    for seed in range(5):
        idx = np.asarray(sample_pixels(jax.random.PRNGKey(seed), 1200 * 1600, 2048))
        assert idx.shape == (2048,)
        assert len(np.unique(idx)) == 2048
        assert idx.min() >= 0 and idx.max() < 1200 * 1600


def test_uniform_marginals():
    """Each element of range(total) appears with probability n/total."""
    total, n, trials = 64, 16, 1200
    counts = np.zeros(total)
    for seed in range(trials):
        idx = np.asarray(sample_pixels(jax.random.PRNGKey(seed), total, n))
        assert len(np.unique(idx)) == n
        counts[idx] += 1
    p = counts / trials
    expect = n / total
    # binomial std for p=0.25 over 1200 trials ~ 0.0125; allow 5 sigma
    assert np.all(np.abs(p - expect) < 5 * np.sqrt(expect * (1 - expect) / trials)), p


def test_order_is_random():
    """First element is uniform over the range (order not sorted)."""
    total, trials = 64, 1200
    firsts = np.array([
        int(sample_pixels(jax.random.PRNGKey(s), total, 8)[0]) for s in range(trials)
    ])
    # each value should appear as the first element ~ trials/total times
    counts = np.bincount(firsts, minlength=total)
    assert counts.max() < 4 * trials / total
    assert (counts > 0).sum() > total * 0.8


def test_n_equals_total_is_permutation():
    idx = np.asarray(sample_pixels(jax.random.PRNGKey(0), 32, 32))
    assert sorted(idx.tolist()) == list(range(32))
