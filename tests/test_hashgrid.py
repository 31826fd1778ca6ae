import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hashmodnffbanks_idr_tpu.ops import hashgrid as hg


def make_spec(**kw):
    base = dict(
        input_dim=3, num_levels=4, level_dim=2, base_resolution=4,
        log2_hashmap_size=7, desired_resolution=32, variant="ngp",
    )
    base.update(kw)
    return hg.HashGridSpec(**base)


@pytest.mark.parametrize("variant,interp", [
    ("ngp", "linear"),
    ("ngp", "smoothstep"),
    ("torch", "floor"),
    ("torch", "linear"),
])
def test_matches_numpy_oracle(variant, interp):
    spec = make_spec(variant=variant, interpolation=interp)
    key = jax.random.PRNGKey(0)
    table = hg.init_table(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (37, 3))
    got = np.asarray(hg.hash_encode(x, table, spec))
    want = hg.hash_encode_numpy(np.asarray(x), np.asarray(table), spec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_tiled_matches_oracle():
    spec = make_spec(gridtype="tiled")
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
    got = np.asarray(hg.hash_encode(x, table, spec))
    want = hg.hash_encode_numpy(np.asarray(x), np.asarray(table), spec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_oob_zeroed_ngp():
    spec = make_spec()
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jnp.asarray([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]])
    out = np.asarray(hg.hash_encode(x, table, spec))
    assert np.all(out == 0.0)


def test_offsets_round8_and_dense_levels():
    spec = make_spec(base_resolution=4, desired_resolution=64, num_levels=4,
                     log2_hashmap_size=9)
    sizes = spec.level_sizes()
    assert np.all(sizes % 8 == 0)
    dense = spec.dense_mask()
    # coarsest level 5^3=125 <= 128(round8) fits; finest 65^3 does not
    assert dense[0]
    assert not dense[-1]


def test_grad_and_second_order():
    spec = make_spec()
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=0.1, maxval=0.9)

    def f(t, x):
        return jnp.sum(hg.hash_encode(x, t, spec) ** 2)

    gt = jax.grad(f, argnums=0)(table, x)
    assert gt.shape == table.shape
    assert np.isfinite(np.asarray(gt)).all()

    # grad w.r.t. inputs exists (trilinear interp is piecewise linear in x)
    gx = jax.grad(f, argnums=1)(table, x)
    assert gx.shape == x.shape

    # second order: d/dtable of ||d sdf/dx|| — the eikonal pattern
    def eik(t):
        def s(xx):
            return jnp.sum(hg.hash_encode(xx, t, spec))
        g = jax.grad(s)(x)
        return jnp.sum(g**2)

    h = jax.grad(eik)(table)
    assert h.shape == table.shape
    assert np.isfinite(np.asarray(h)).all()


def test_input_grad_matches_fd():
    spec = make_spec(interpolation="smoothstep")  # smooth derivative
    table = hg.init_table(jax.random.PRNGKey(0), spec) * 100.0
    x = jnp.asarray([[0.33, 0.41, 0.57]])

    def f(x):
        return jnp.sum(hg.hash_encode(x, table, spec))

    g = np.asarray(jax.grad(lambda x: f(x))(x))
    eps = 1e-4
    for d in range(3):
        xp = x.at[0, d].add(eps)
        xm = x.at[0, d].add(-eps)
        fd = (f(xp) - f(xm)) / (2 * eps)
        np.testing.assert_allclose(g[0, d], fd, rtol=2e-2, atol=1e-4)


def test_torch_floor_is_nearest_corner():
    """The reference pure-torch 'interpolation bug': output == table row of the
    hashed floor corner (hashGridEmbedding.py:86)."""
    spec = make_spec(variant="torch", interpolation="floor", num_levels=2,
                     base_resolution=4, desired_resolution=8)
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jnp.asarray([[0.3, 0.6, 0.9]])
    out = np.asarray(hg.hash_encode(x, table, spec)).reshape(2, 2)
    # manually compute for level 0: res=4, coords floor(x*4)
    res = spec.level_resolutions()
    sizes = spec.level_sizes()
    offs = spec.offsets()
    for l in range(2):
        c = np.floor(np.array([0.3, 0.6, 0.9]) * res[l]).astype(np.int64)
        idx = 0
        for d in range(3):
            idx ^= (int(c[d]) * hg.TORCH_PRIMES[d]) & 0xFFFFFFFF
        idx = (idx & 0xFFFFFFFF) % int(sizes[l])
        np.testing.assert_allclose(out[l], np.asarray(table)[offs[l] + idx])


def test_total_variation_loss_finite():
    spec = make_spec()
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    tv = hg.total_variation_loss(x, table, spec)
    assert np.isfinite(float(tv))
    g = jax.grad(lambda t: hg.total_variation_loss(x, t, spec))(table)
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------------------
# page-packed large-table fast path (production-size specs, VERDICT item 2)
# ---------------------------------------------------------------------------

def big_spec(**kw):
    """log2=15 — the reference Tcnn presets' production size
    (confs/embedder_conf_var/FFB_TCNN/dtu_fixed_cameras.conf)."""
    base = dict(input_dim=3, num_levels=8, level_dim=2, base_resolution=16,
                log2_hashmap_size=15, desired_resolution=512, variant="ngp")
    base.update(kw)
    return hg.HashGridSpec(**base)


def test_page_path_engages_and_matches_oracle():
    spec = big_spec()
    assert int(spec.level_sizes().max()) > hg.ONEHOT_MAX_ROWS  # page path on
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (23, 3))
    got = np.asarray(hg.hash_encode(x, table, spec))
    want = hg.hash_encode_numpy(np.asarray(x), np.asarray(table), spec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_page_path_floor_interp_matches_oracle():
    spec = big_spec(variant="torch", interpolation="floor",
                    base_resolution=8)
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3))
    got = np.asarray(hg.hash_encode(x, table, spec))
    want = hg.hash_encode_numpy(np.asarray(x), np.asarray(table), spec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_pack_pages_roundtrip():
    spec = big_spec()
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    pages = hg.pack_pages(table)
    R, C = table.shape
    flat = np.asarray(pages).reshape(-1)[: R * C]
    np.testing.assert_array_equal(flat.reshape(R, C), np.asarray(table))


def test_page_path_second_order_grads():
    spec = big_spec(num_levels=4)
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (12, 3))

    def f(t, xx):
        return jnp.sum(hg.hash_encode(xx, t, spec) ** 2)

    gt = jax.grad(f, argnums=0)(table, x)
    assert np.isfinite(np.asarray(gt)).any()
    # table grad matches the narrow-path (one-hot-free) reference formulation;
    # the canonical param is the (P, 128) page image, so project both grads
    # to the narrow row view before comparing
    narrow = hg.as_rows(table, spec)

    def f_narrow(t, xx):
        floor, frac = hg._positions(spec, xx)
        bits = jnp.asarray(hg._corner_bits(3), dtype=jnp.int32)
        corners = floor[:, :, None, :] + bits[None, None, :, :]
        rows = hg._level_indices(spec, corners)
        w = hg._interp_weights(spec, frac)
        vals = jnp.take(t, rows, axis=0)
        return jnp.sum(jnp.sum(vals * w[..., None], axis=2) ** 2)

    gt2 = jax.grad(f_narrow, argnums=0)(narrow, x)
    np.testing.assert_allclose(np.asarray(hg.as_rows(gt, spec)),
                               np.asarray(gt2), rtol=1e-4, atol=1e-8)

    # eikonal-shaped mixed second derivative: d/dtable of ||d encode/dx||
    def eik(t):
        def s(xx):
            return jnp.sum(hg.hash_encode(xx[None], t, spec))
        g = jax.vmap(jax.grad(s))(x)
        return jnp.sum(g**2)

    h = jax.grad(eik)(table)
    assert np.isfinite(np.asarray(h)).all()
    assert np.abs(np.asarray(h)).sum() > 0


def test_inference_bf16_close_to_fp32():
    spec = big_spec()
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    exact = np.asarray(hg.hash_encode(x, table, spec))
    approx = np.asarray(hg.hash_encode(x, table, spec, inference=True))
    # bf16 has ~8 mantissa bits; interp of U(-1e-4,1e-4) values
    np.testing.assert_allclose(approx, exact, rtol=2e-2, atol=2e-6)


# ---------------------------------------------------------------------------
# level-pruned / floor-corner guidance encode (RayTracerConfig.prune_*)
# ---------------------------------------------------------------------------

def test_max_level_prunes_and_fills():
    """max_level=K: levels < K exactly match the full encode; levels >= K
    carry the per-level table means (level_means)."""
    spec = make_spec(num_levels=6, desired_resolution=64)
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (23, 3))
    C = spec.level_dim
    full = np.asarray(hg.hash_encode(x, table, spec)).reshape(23, 6, C)
    fill = hg.level_means(table, spec)
    for K in (2, 4):
        pr = np.asarray(hg.hash_encode(x, table, spec, max_level=K,
                                       fill=fill)).reshape(23, 6, C)
        np.testing.assert_allclose(pr[:, :K], full[:, :K], rtol=1e-6, atol=1e-8)
        want_fill = np.broadcast_to(np.asarray(fill)[K:][None], (23, 6 - K, C))
        np.testing.assert_allclose(pr[:, K:], want_fill, rtol=1e-6, atol=1e-8)


def test_max_level_zero_fill_and_oob():
    spec = make_spec(num_levels=5)
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (9, 3))
    pr = np.asarray(hg.hash_encode(x, table, spec, max_level=3)).reshape(9, 5, 2)
    assert np.all(pr[:, 3:] == 0.0)
    fill = hg.level_means(table, spec)
    xo = x.at[0, 1].set(1.25)
    pro = np.asarray(hg.hash_encode(xo, table, spec, max_level=3, fill=fill))
    assert np.all(pro[0] == 0.0), "OOB row must zero computed AND fill levels"


def test_max_level_respects_desired_resolution_geometry():
    """Truncation must keep the full spec's per-level scales (regression:
    scale_factor() re-derives the growth factor from num_levels when
    desired_resolution is set)."""
    spec = make_spec(num_levels=8, desired_resolution=128)
    table = hg.init_table(jax.random.PRNGKey(2), spec)
    x = jax.random.uniform(jax.random.PRNGKey(3), (11, 3))
    full = np.asarray(hg.hash_encode(x, table, spec)).reshape(11, 8, 2)
    pr = np.asarray(hg.hash_encode(x, table, spec, max_level=5)).reshape(11, 8, 2)
    np.testing.assert_allclose(pr[:, :5], full[:, :5], rtol=1e-6, atol=1e-8)


def test_floor_interp_guidance_matches_oracle():
    """floor-corner guidance = the same encode with interpolation='floor'
    (1 gather per level) — pin against the NumPy oracle."""
    import dataclasses
    spec = make_spec(num_levels=4)
    fspec = dataclasses.replace(spec, interpolation="floor")
    table = hg.init_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (19, 3))
    got = np.asarray(hg.hash_encode(x, table, fspec))
    want = hg.hash_encode_numpy(np.asarray(x), np.asarray(table), fspec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
