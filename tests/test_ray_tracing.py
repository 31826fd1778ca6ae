"""Ray tracer correctness on an analytic sphere SDF."""

import numpy as np
import jax
import jax.numpy as jnp

from hashmodnffbanks_idr_tpu.models.ray_tracing import RayTracerConfig, ray_trace


def make_rays(n=64, radius=2.0):
    """Camera at (0,0,radius) looking at origin; fan of rays, some hitting a
    centered sphere and some missing."""
    cam = jnp.asarray([[0.0, 0.0, radius]])
    ang = np.linspace(-0.5, 0.5, n)
    dirs = np.stack([np.sin(ang), np.zeros(n), -np.cos(ang)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return cam, jnp.asarray(dirs[None], dtype=jnp.float32)


def test_tracer_finds_sphere_intersections():
    r_obj = 0.5
    sdf = lambda x: jnp.linalg.norm(x, axis=-1) - r_obj
    cfg = RayTracerConfig(sphere_tracing_iters=20, n_steps=64, n_secant_steps=8,
                          line_step_iters=3)
    cam, dirs = make_rays(64)
    obj_mask = jnp.ones(64, dtype=bool)
    res = ray_trace(cfg, sdf, cam, obj_mask, dirs, jax.random.PRNGKey(0),
                    training=False)

    d = np.asarray(dirs[0])
    c = np.asarray(cam[0])
    # analytic first intersection with the r=0.5 sphere
    b = d @ c
    disc = b**2 - (c @ c - r_obj**2)
    hits = disc > 0
    t_hit = -b - np.sqrt(np.maximum(disc, 0))

    got_mask = np.asarray(res.network_object_mask)
    np.testing.assert_array_equal(got_mask, hits)
    np.testing.assert_allclose(np.asarray(res.dists)[hits], t_hit[hits],
                               rtol=1e-3, atol=2e-3)
    pts = np.asarray(res.points)[hits]
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), r_obj, atol=3e-3)


def test_tracer_training_fallbacks():
    """Missing rays must get fallback points (min-SDF / sphere projection)."""
    sdf = lambda x: jnp.linalg.norm(x, axis=-1) - 0.5
    cfg = RayTracerConfig(sphere_tracing_iters=20, n_steps=64, n_secant_steps=8)
    cam, dirs = make_rays(64)
    obj_mask = jnp.zeros(64, dtype=bool)  # no ray is an object pixel
    res = ray_trace(cfg, sdf, cam, obj_mask, dirs, jax.random.PRNGKey(0),
                    training=True)
    assert np.isfinite(np.asarray(res.points)).all()
    assert np.isfinite(np.asarray(res.dists)).all()


def test_tracer_nonconvex_uses_sampler():
    """A thin shell SDF that sphere tracing overshoots -> sampler+secant path."""
    def sdf(x):
        r = jnp.linalg.norm(x, axis=-1)
        return jnp.abs(r - 0.6) - 0.05  # shell at r in [0.55, 0.65]

    cfg = RayTracerConfig(sphere_tracing_iters=5, n_steps=100, n_secant_steps=8)
    cam, dirs = make_rays(32)
    obj_mask = jnp.ones(32, dtype=bool)
    res = ray_trace(cfg, sdf, cam, obj_mask, dirs, jax.random.PRNGKey(0),
                    training=False)
    hits = np.asarray(res.network_object_mask)
    assert hits.sum() > 0
    pts = np.asarray(res.points)[hits]
    r = np.linalg.norm(pts, axis=-1)
    # intersections on the outer shell boundary
    np.testing.assert_allclose(r, 0.65, atol=5e-3)


def test_guided_trace_exact_surface_despite_biased_guidance():
    """Level-pruned guidance mode (RayTracerConfig.prune_*): the march and
    coarse sweep probes run a deliberately *biased* approximate SDF, yet the
    found intersections must satisfy the EXACT SDF — the decision queries
    (flip-endpoint re-evals, fine probes, secant) stay exact."""
    r_obj = 0.5
    sdf = lambda x: jnp.linalg.norm(x, axis=-1) - r_obj
    sdf_guide = lambda x: jnp.linalg.norm(x, axis=-1) - r_obj - 0.02  # biased
    cfg = RayTracerConfig(sphere_tracing_iters=20, n_steps=100,
                          n_secant_steps=8, line_step_iters=3,
                          prune_levels_march=1, prune_levels_coarse=1,
                          prune_secant_iters=4, prune_march_tau=5e-3,
                          prune_march_polish_iters=3)
    cam, dirs = make_rays(64)
    obj_mask = jnp.ones(64, dtype=bool)
    res = ray_trace(cfg, sdf, cam, obj_mask, dirs, jax.random.PRNGKey(0),
                    training=False,
                    sdf_guidance={"march": sdf_guide, "coarse": sdf_guide})

    d = np.asarray(dirs[0]); c = np.asarray(cam[0])
    b = d @ c
    disc = b**2 - (c @ c - r_obj**2)
    # near-tangent rays are ambiguous under the 5e-5 convergence threshold
    # (the exact surface is within threshold at tangency) — exclude them from
    # the mask check; grazing hits additionally see the documented
    # one-coarse-interval slack in refined-interval choice under a biased
    # guide, so the tight distance check uses solid-incidence rays only
    clear = np.abs(disc) > 1e-3
    solid = disc > 0.03
    hits = disc > 0
    t_hit = -b - np.sqrt(np.maximum(disc, 0))
    got_mask = np.asarray(res.network_object_mask)
    np.testing.assert_array_equal(got_mask[clear], hits[clear])
    np.testing.assert_allclose(np.asarray(res.dists)[solid], t_hit[solid],
                               rtol=1e-3, atol=5e-3)
    pts = np.asarray(res.points)[solid]
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), r_obj, atol=5e-3)
    assert solid.sum() >= 20  # the tight check must cover real rays


def test_guided_trace_none_guidance_identical():
    """Empty / None-entry guidance dicts must be inert (exact path).  A
    present 'secant' entry is also inert while prune_secant_iters == 0."""
    sdf = lambda x: jnp.linalg.norm(x, axis=-1) - 0.5
    cfg = RayTracerConfig(sphere_tracing_iters=10, n_steps=100, n_secant_steps=8)
    cam, dirs = make_rays(32)
    obj_mask = jnp.ones(32, dtype=bool)
    a = ray_trace(cfg, sdf, cam, obj_mask, dirs, jax.random.PRNGKey(0),
                  training=True)
    for guide in (None, {}, {"march": None, "coarse": None},
                  {"secant": lambda x: 0 * sdf(x)}):
        b = ray_trace(cfg, sdf, cam, obj_mask, dirs, jax.random.PRNGKey(0),
                      training=True, sdf_guidance=guide)
        np.testing.assert_array_equal(np.asarray(a.points), np.asarray(b.points))
        np.testing.assert_array_equal(np.asarray(a.dists), np.asarray(b.dists))


def test_guided_trace_same_sdf_guidance_matches_exact():
    """Guidance == the exact SDF (the 'mixed' wiring with a perfect guide)
    must find the same surface within tracer tolerance."""
    r_obj = 0.5
    sdf = lambda x: jnp.linalg.norm(x, axis=-1) - r_obj
    cfg = RayTracerConfig(sphere_tracing_iters=10, n_steps=100,
                          n_secant_steps=8, line_step_iters=3,
                          prune_secant_iters=4)
    cam, dirs = make_rays(48)
    obj_mask = jnp.ones(48, dtype=bool)
    res = ray_trace(cfg, sdf, cam, obj_mask, dirs, jax.random.PRNGKey(0),
                    training=False,
                    sdf_guidance={"march": sdf, "coarse": sdf, "secant": sdf})
    d = np.asarray(dirs[0]); c = np.asarray(cam[0])
    b = d @ c
    disc = b**2 - (c @ c - r_obj**2)
    solid = disc > 0.03
    t_hit = -b - np.sqrt(np.maximum(disc, 0))
    np.testing.assert_allclose(np.asarray(res.dists)[solid], t_hit[solid],
                               rtol=1e-3, atol=2e-3)


def test_guided_secant_survives_adversarial_guide():
    """The guided secant's first m iterations run on the guide; a WRONG-SIGN
    guide can walk the bracket past the true root.  The phase-boundary exact
    re-validation (ray_tracing.py:_secant, ADVICE r4) must recover: the
    final z_pred still converges to the exact crossing."""
    from hashmodnffbanks_idr_tpu.models.ray_tracing import _secant

    r_obj = 0.5
    sdf = lambda x: jnp.linalg.norm(x, axis=-1) - r_obj
    # adversarial guide: sign FLIPPED near the root — guided iterations
    # actively corrupt the bracket
    guide = lambda x: -(jnp.linalg.norm(x, axis=-1) - r_obj) - 0.01

    cfg = RayTracerConfig(n_secant_steps=8, prune_secant_iters=4)
    R = 16
    cam, dirs = make_rays(R)
    cam_f = jnp.broadcast_to(cam[0], (R, 3))
    d = np.asarray(dirs[0])
    c = np.asarray(cam[0])
    b = d @ c
    disc = b**2 - (c @ c - r_obj**2)
    hits = disc > 1e-3
    t_hit = -b - np.sqrt(np.maximum(disc, 0.0))

    z_low = jnp.asarray(np.maximum(t_hit - 0.15, 0.0), jnp.float32)
    z_high = jnp.asarray(t_hit + 0.15, jnp.float32)
    p_low = cam_f + z_low[:, None] * dirs[0]
    p_high = cam_f + z_high[:, None] * dirs[0]
    active = jnp.asarray(hits)

    z = _secant(cfg, sdf, sdf(p_low), sdf(p_high), z_low, z_high,
                cam_f, dirs[0], active, sdf_guide=guide)
    np.testing.assert_allclose(np.asarray(z)[hits], t_hit[hits],
                               rtol=1e-3, atol=2e-3)

    # sanity: identical call WITHOUT the guide also converges (no regression)
    z0 = _secant(cfg, sdf, sdf(p_low), sdf(p_high), z_low, z_high,
                 cam_f, dirs[0], active, sdf_guide=None)
    np.testing.assert_allclose(np.asarray(z0)[hits], t_hit[hits],
                               rtol=1e-3, atol=2e-3)
