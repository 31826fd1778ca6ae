"""Golden ray-tracer test vs the reference RayTracing (VERDICT item 4).

Copies one SDF (the reference's own ImplicitNetwork weights) into both
tracers and compares points / network_object_mask / dists side by side for
the eval and train branches (code/model/ray_tracing.py:26-95).  The
convergence semantics (bidirectional trace + line search + sampler handoff +
secant) are the subtlest porting surface in the repo — this pins them
numerically, not just self-consistently.

The train branch's minimal-SDF fallback uses *random* sweep steps in both
implementations (ray_tracing.py:277), so train-branch comparisons are
restricted to rays that hit the surface (deterministic); the eval branch is
compared on every ray.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference checkout")

torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)

for _mod in ("imageio", "skimage"):
    if _mod not in sys.modules:
        try:
            __import__(_mod)
        except ImportError:
            sys.modules[_mod] = types.ModuleType(_mod)
if "tinycudann" not in sys.modules:
    try:
        import tinycudann  # noqa: F401
    except ImportError:
        _tcnn = types.ModuleType("tinycudann")
        _tcnn.Encoding = object
        sys.modules["tinycudann"] = _tcnn

# the reference tracer hardcodes .cuda() (ray_tracing.py:43-136); run on CPU
torch.Tensor.cuda = lambda self, *a, **k: self

import jax
import jax.numpy as jnp

from hashmodnffbanks_idr_tpu.models.networks import ImplicitNetwork as OursImplicit
from hashmodnffbanks_idr_tpu.models.ray_tracing import RayTracerConfig, ray_trace


def _make_sdf_pair(seed=0):
    from model.implicit_differentiable_renderer import ImplicitNetwork as RefImplicit

    from test_golden_vs_reference import _copy_linear

    torch.manual_seed(seed)
    kw = dict(feature_vector_size=8, d_in=3, d_out=1,
              dims=[32, 32, 32, 32, 32, 32], geometric_init=True, bias=0.6,
              skip_in=[4], weight_norm=True, multires=0)
    ref = RefImplicit(**kw)
    ours = OursImplicit(**kw)
    params = ours.init(jax.random.PRNGKey(0))
    for l in range(ours.num_layers - 1):
        params["lin"][l] = _copy_linear(getattr(ref, f"lin{l}"), params["lin"][l])
    params["density"]["beta"] = jnp.asarray(float(ref.dencity_net.beta.detach()))

    ref_sdf = lambda x: ref(x)[:, 0]
    our_sdf = lambda x: ours.sdf(params, x)
    return ref_sdf, our_sdf


def _rays(n=20):
    """n x n ray grid from a camera at z=+2 toward the origin sphere."""
    uv = np.stack(np.meshgrid(np.arange(n, dtype=np.float32),
                              np.arange(n, dtype=np.float32)), -1).reshape(-1, 2)
    f, c = 2.2 * n, n / 2
    d = np.stack([(uv[:, 0] - c) / f, (uv[:, 1] - c) / f, np.ones(len(uv))], -1)
    R = np.diag([-1.0, 1.0, -1.0])
    dirs = (d @ R.T)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    cam = np.array([[0.0, 0.0, 2.0]], dtype=np.float32)
    rng = np.random.default_rng(5)
    mask = rng.uniform(size=(len(uv),)) > 0.25
    return cam, dirs.astype(np.float32)[None], mask


CFG = dict(object_bounding_sphere=1.0, sdf_threshold=5.0e-5,
           line_search_step=0.5, line_step_iters=3, sphere_tracing_iters=10,
           n_steps=100, n_secant_steps=8)


# iters=10 exercises the sampler+secant handoff on every ray (the IGR-init
# SDF under-marches); iters=50 lets sphere tracing converge most rays,
# pinning the trace loop + line-search + early-stop semantics as well.
@pytest.mark.parametrize("training", [False, True])
@pytest.mark.parametrize("iters", [10, 50])
def test_tracer_matches_reference(training, iters):
    from model.ray_tracing import RayTracing

    ref_sdf, our_sdf = _make_sdf_pair()
    cam, dirs, mask = _rays()

    cfg = dict(CFG, sphere_tracing_iters=iters)
    tracer = RayTracing(**cfg)
    tracer.train(training)
    with torch.no_grad():
        pts_ref, mask_ref, dists_ref = tracer(
            sdf=ref_sdf, cam_loc=torch.from_numpy(cam),
            object_mask=torch.from_numpy(mask),
            ray_directions=torch.from_numpy(dirs))
    pts_ref = pts_ref.numpy().reshape(-1, 3)
    mask_ref = mask_ref.numpy().astype(bool)
    dists_ref = dists_ref.numpy()

    out = ray_trace(RayTracerConfig(**cfg), our_sdf, jnp.asarray(cam),
                    jnp.asarray(mask), jnp.asarray(dirs),
                    jax.random.PRNGKey(0), training=training)
    pts = np.asarray(out.points)
    net_mask = np.asarray(out.network_object_mask).astype(bool)
    dists = np.asarray(out.dists)

    # convergence classification must agree (allow <1% fp-grazing flips)
    assert (net_mask != mask_ref).mean() < 0.01, (net_mask.sum(), mask_ref.sum())
    both = net_mask & mask_ref
    if training:
        # converged rays OUTSIDE the GT mask are overwritten by the random
        # min-SDF fallback in training (ray_tracing.py:84-92) — exclude them
        # from exact comparison
        both = both & mask
    assert both.sum() > 100

    np.testing.assert_allclose(dists[both], dists_ref[both], rtol=0, atol=2e-4)
    np.testing.assert_allclose(pts[both], pts_ref[both], rtol=0, atol=2e-4)

    if not training:
        # eval branch is fully deterministic: every ray's outputs must match
        np.testing.assert_allclose(dists, dists_ref, rtol=0, atol=2e-4)
        np.testing.assert_allclose(pts, pts_ref, rtol=0, atol=2e-4)
    else:
        # train-branch extras (ray_tracing.py:71-92): sphere-projection rays
        # are deterministic; min-SDF rays use random sweeps in both — check
        # the deterministic invariants instead of exact values
        miss = ~net_mask & mask_ref * 0 + ~net_mask  # all non-surface rays
        assert np.isfinite(pts[miss]).all()
        assert np.isfinite(dists[miss]).all()
