import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hashmodnffbanks_idr_tpu.models.embedders import build_embedder

NETWORK_DIMS = [3, 512, 512, 512, 512, 512, 512, 512, 512, 257]

CASES = [
    # embed_type, kwargs, expected_dim
    ("NerfPos", dict(multires=16, log2_max_hash_size=5), 3 * (1 + 2 * 16) + 3),
    ("FourierFeatures", dict(multires=6, log2_max_hash_size=5), 2 * 3 + 3),
    ("HashGrid", dict(multires=6, log2_max_hash_size=5, base_resolution=8), 3 + 4 * 6),
    ("HashGridTcnn", dict(multires=6, log2_max_hash_size=15), 3 + 6 * 2),
    ("HashGridCUDA", dict(multires=6, log2_max_hash_size=15), 3 + 6 * 2),
    ("FFB", dict(multires=6, log2_max_hash_size=5), 2 * 28 + 3),
    ("StyleModNFFB", dict(multires=6, log2_max_hash_size=5), 2 * 28 + 3),
    ("FFBTcnn", dict(multires=6, log2_max_hash_size=15), 28 + 3),
    ("SHEncoder", dict(multires=4, log2_max_hash_size=3), 16),
]


@pytest.mark.parametrize("embed_type,kw,expected_dim", CASES)
def test_embedder_output_dim(embed_type, kw, expected_dim):
    e = build_embedder(
        embed_type, input_dims=3, network_dims=NETWORK_DIMS,
        max_points_per_entry=2, base_resolution=kw.pop("base_resolution", 16),
        desired_resolution=512, bound=0.45, **kw,
    )
    assert e.embeddings_dim == expected_dim
    params = e.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3), minval=-0.4, maxval=0.4)
    out = e.apply(params, x)
    assert out.shape == (17, expected_dim), f"{embed_type}: {out.shape}"
    assert np.isfinite(np.asarray(out)).all()


def test_nffb_second_order_grad():
    e = build_embedder(
        "StyleModNFFB", input_dims=3, network_dims=NETWORK_DIMS, multires=4,
        log2_max_hash_size=5, max_points_per_entry=2, base_resolution=16,
        desired_resolution=128, bound=0.45,
    )
    params = e.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 3), minval=-0.3, maxval=0.3)

    def eik(p):
        def s(xx):
            return jnp.sum(e.apply(p, xx))
        g = jax.grad(s)(x)
        return jnp.sum(g**2)

    g = jax.grad(eik)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)


def test_style_attention_is_row_normalized():
    from hashmodnffbanks_idr_tpu.models.embedders import StyleAttentionBlock

    blk = StyleAttentionBlock(3, 8)
    p = blk.init(jax.random.PRNGKey(0))
    content = jax.random.normal(jax.random.PRNGKey(1), (12, 3))
    style = jax.random.normal(jax.random.PRNGKey(2), (12, 8))
    out = np.asarray(blk.apply(p, content, style))
    np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(-1), 1.0, atol=1e-2)
