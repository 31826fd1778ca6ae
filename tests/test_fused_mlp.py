"""Fused SDF-MLP Pallas kernel vs the reference jnp path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hashmodnffbanks_idr_tpu.models.networks import ImplicitNetwork
from hashmodnffbanks_idr_tpu.ops import fused_mlp as fm


def make_net(embed_type="FourierFeatures"):
    return ImplicitNetwork(
        feature_vector_size=256, d_in=3, d_out=1,
        dims=[512] * 8, geometric_init=True, bias=0.6, skip_in=[4],
        weight_norm=True, multires=6, embed_type=embed_type,
        log2_max_hash_size=5, max_points_per_entry=2, base_resolution=16,
        desired_resolution=64, bound=0.45,
    )


def test_supports_fusion_detection():
    net = make_net()
    assert fm.supports_fusion(net.dims, net.skip_in)
    assert not fm.supports_fusion([3, 64, 64, 17], (4,))


def test_fused_matches_reference_path():
    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (96, 3), minval=-0.4, maxval=0.4)

    want = np.asarray(net.sdf(params, x))
    fast = net.make_fast_sdf(params, interpret=True)
    got = np.asarray(fast(x))
    # bf16 matmuls vs f32: tolerance at bf16 resolution
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-2)
    # sign agreement is what the tracer actually consumes
    big = np.abs(want) > 5e-2
    assert (np.sign(got[big]) == np.sign(want[big])).all()


def test_fused_f32_matches_exact_sdf():
    """precision='f32' is the 'exact' tracer mode's TPU implementation: it
    must reproduce ImplicitNetwork.sdf at f32 tolerance (the r5 3-seed
    quality A/B was run against the XLA exact path)."""
    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (200, 3), minval=-0.4, maxval=0.4)

    want = np.asarray(net.sdf(params, x))
    fast = net.make_fast_sdf(params, interpret=True, precision="f32")
    got = np.asarray(fast(x))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_fused_f32_matches_pruned_guidance():
    """f32 fused kernel under level pruning == the jnp pruned-guidance path
    (renderer _pruned_f32 uses the kernel on TPU)."""
    net = make_net(embed_type="HashGridTcnn")
    if not net.supports_level_pruning():
        pytest.skip("embedder has no level pruning")
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(3), (64, 3), minval=-0.4, maxval=0.4)

    want = np.asarray(net.apply(params, x, fast=False, max_level=2,
                                floor_interp=True)[..., 0])
    fast = net.make_fast_sdf(params, interpret=True, max_level=2,
                             floor_interp=True, precision="f32")
    got = np.asarray(fast(x))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_fused_padding_edges():
    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    fast = net.make_fast_sdf(params, interpret=True)
    for n in (1, 513):
        x = jax.random.uniform(jax.random.PRNGKey(n), (n, 3), minval=-0.3, maxval=0.3)
        out = np.asarray(fast(x))
        assert out.shape == (n,)
        assert np.isfinite(out).all()
