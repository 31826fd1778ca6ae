"""DTU-shaped synthetic quality benchmark scene (VERDICT round-1 item 7).

DTU data is not downloadable in this environment, so this generator renders a
scene with a DTU scan's exact shape — 49 views at 1200x1600 with masks and
unit-sphere-normalized cameras in the repo's npz convention
(DATA_CONVENTION.md, mirroring the reference's
code/datasets/scene_dataset.py:8-160 contract) — from a *known analytic SDF*,
which yields both ground-truth images (for PSNR/SSIM/LPIPS) and a
ground-truth mesh (for the Chamfer harness, eval/dtu_chamfer.py).

Scene: a tilted torus, two spheres and a rotated rounded box, polynomial
smooth-min blended, shaded with a high-frequency procedural 3D texture —
deliberately hard for low-frequency encoders so the benchmark separates the
encoder families the same way DTU does for the reference
(code/evaluation/eval.py:132-205 protocol).

Everything is rendered with JAX (sphere tracing the analytic SDF), so the
49 x 1.92M-pixel render runs in seconds on the TPU and minutes on CPU.

CLI:  python -m hashmodnffbanks_idr_tpu.data.dtu_shaped --out data
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# analytic SDF (unit-sphere scene, object radius ~0.5)
# ---------------------------------------------------------------------------

def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float32)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)


_TORUS_R = np.asarray(_rot_x(0.52), dtype=np.float32)       # ~30 deg tilt
_BOX_R = np.asarray(_rot_y(0.65) @ _rot_x(0.35), dtype=np.float32)


def _smin(a, b, k=0.06):
    """Polynomial smooth min (quadratic)."""
    h = jnp.clip(0.5 + 0.5 * (b - a) / k, 0.0, 1.0)
    return b + h * (a - b) - k * h * (1.0 - h)


def _scan0_sdf(p: jnp.ndarray) -> jnp.ndarray:
    # tilted torus, major 0.30 / minor 0.11, centered slightly above origin
    q = (p - jnp.array([0.0, 0.05, 0.0])) @ _TORUS_R.T
    ring = jnp.sqrt(q[..., 0] ** 2 + q[..., 2] ** 2) - 0.30
    d_torus = jnp.sqrt(ring**2 + q[..., 1] ** 2) - 0.11

    # sphere A
    d_sph_a = jnp.linalg.norm(p - jnp.array([0.24, 0.14, -0.06]), axis=-1) - 0.17

    # rotated rounded box
    b = (p - jnp.array([-0.20, -0.10, 0.06])) @ _BOX_R.T
    half = jnp.array([0.15, 0.10, 0.12])
    outer = jnp.abs(b) - half
    d_box = (
        jnp.linalg.norm(jnp.maximum(outer, 0.0), axis=-1)
        + jnp.minimum(jnp.max(outer, axis=-1), 0.0)
        - 0.02
    )

    # sphere B (bottom)
    d_sph_b = jnp.linalg.norm(p - jnp.array([0.02, -0.24, -0.16]), axis=-1) - 0.13

    d = _smin(d_torus, d_sph_a)
    d = _smin(d, d_box)
    d = _smin(d, d_sph_b)
    return d


_S1_TORUS_R = np.asarray(_rot_y(1.2) @ _rot_x(1.0), dtype=np.float32)


def _scan1_sdf(p: jnp.ndarray) -> jnp.ndarray:
    """Scan 1: vertical capsule + near-vertical torus + ellipsoid + sphere —
    elongated shapes and a thin handle, a different geometry class than
    scan 0's compact blob (scene-diversity axis, VERDICT r4 missing #2)."""
    # vertical capsule
    a = jnp.array([-0.05, -0.25, 0.0])
    ab = jnp.array([0.0, 0.53, 0.0])          # to (-0.05, 0.28, 0)
    t = jnp.clip(jnp.einsum("...d,d->...", p - a, ab) / jnp.dot(ab, ab), 0.0, 1.0)
    d_cap = jnp.linalg.norm(p - a - t[..., None] * ab[None, :], axis=-1) - 0.12

    # near-vertical thin torus (the handle)
    q = (p - jnp.array([0.17, 0.0, 0.10])) @ _S1_TORUS_R.T
    ring = jnp.sqrt(q[..., 0] ** 2 + q[..., 2] ** 2) - 0.27
    d_torus = jnp.sqrt(ring**2 + q[..., 1] ** 2) - 0.09

    # ellipsoid (bound-accurate approximation)
    r = jnp.array([0.20, 0.11, 0.14])
    e = (p - jnp.array([0.05, -0.18, -0.18])) / r
    d_ell = (jnp.linalg.norm(e, axis=-1) - 1.0) * jnp.min(r)

    d_sph = jnp.linalg.norm(p - jnp.array([-0.25, 0.10, -0.15]), axis=-1) - 0.12

    d = _smin(d_cap, d_torus, k=0.05)
    d = _smin(d, d_ell, k=0.05)
    d = _smin(d, d_sph, k=0.05)
    return d


_S2_BOX_R = np.asarray(_rot_y(0.4), dtype=np.float32)


def _scan2_sdf(p: jnp.ndarray) -> jnp.ndarray:
    """Scan 2: displacement-bumped blob on a flat slab — high-frequency
    GEOMETRY (not just texture), the regime where hash grids separate
    hardest from low-frequency encoders."""
    d_blob = jnp.linalg.norm(p - jnp.array([0.0, 0.06, 0.0]), axis=-1) - 0.34
    bump = (jnp.sin(18.0 * p[..., 0]) * jnp.sin(18.0 * p[..., 1])
            * jnp.sin(18.0 * p[..., 2]))
    d_blob = d_blob + 0.030 * bump

    b = (p - jnp.array([0.0, -0.33, 0.0])) @ _S2_BOX_R.T
    half = jnp.array([0.30, 0.05, 0.30])
    outer = jnp.abs(b) - half
    d_slab = (
        jnp.linalg.norm(jnp.maximum(outer, 0.0), axis=-1)
        + jnp.minimum(jnp.max(outer, axis=-1), 0.0)
        - 0.02
    )
    return _smin(d_blob, d_slab, k=0.07)


_SCENE_SDFS = {0: _scan0_sdf, 1: _scan1_sdf, 2: _scan2_sdf}


def scene_sdf(p: jnp.ndarray, scene_id: int = 0) -> jnp.ndarray:
    """p: (..., 3) -> (...,) signed distance of benchmark scene ``scene_id``."""
    p = jnp.asarray(p, jnp.float32)
    return _SCENE_SDFS[int(scene_id)](p)


def scene_color(p: jnp.ndarray, n: jnp.ndarray, view: jnp.ndarray,
                scene_id: int = 0) -> jnp.ndarray:
    """High-frequency procedural albedo + two-light lambert + weak specular.

    p: (..., 3) surface points, n: (..., 3) unit normals, view: (..., 3) unit
    directions surface->camera.  Returns (..., 3) in [0, 1].  Per-scene
    texture frequencies/palettes so the quality benchmark's appearance
    difficulty varies alongside its geometry (scan 1: lower-frequency broad
    bands; scan 2: very high frequency checker-like field)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    if scene_id == 1:
        f1, f2, f3, fs = 23.0, 19.0, 27.0, 34.0
    elif scene_id == 2:
        f1, f2, f3, fs = 55.0, 49.0, 61.0, 80.0
    else:
        f1, f2, f3, fs = 41.0, 37.0, 45.0, 60.0
    # three mixing fields at different (high) frequencies
    m1 = 0.5 + 0.5 * jnp.sin(f1 * x + 3.0 * jnp.sin(13.0 * y))
    m2 = 0.5 + 0.5 * jnp.sin(f2 * y + 2.0 * jnp.sin(17.0 * z) + 1.7)
    m3 = 0.5 + 0.5 * jnp.sin(f3 * z + 2.5 * jnp.sin(11.0 * x) + 0.6)
    c_a = jnp.stack([m1, m2, m3], axis=-1)
    if scene_id == 2:
        c_b = jnp.stack([0.2 + 0.7 * m1, 0.9 - 0.6 * m3, 0.3 + 0.6 * m2], axis=-1)
    else:
        c_b = jnp.stack([0.9 - 0.6 * m2, 0.2 + 0.7 * m3, 0.3 + 0.6 * m1], axis=-1)
    stripe = 0.5 + 0.5 * jnp.sin(fs * (x + y + z))
    albedo = 0.15 + 0.7 * (stripe[..., None] * c_a + (1 - stripe[..., None]) * c_b)

    l1 = jnp.array([0.45, 0.75, 0.49]) / np.linalg.norm([0.45, 0.75, 0.49])
    l2 = jnp.array([-0.6, 0.2, -0.77]) / np.linalg.norm([-0.6, 0.2, -0.77])
    lam = (
        0.30
        + 0.55 * jnp.clip(jnp.einsum("...d,d->...", n, l1), 0.0, 1.0)
        + 0.25 * jnp.clip(jnp.einsum("...d,d->...", n, l2), 0.0, 1.0)
    )
    h = l1[None, :] + view
    h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-9)
    spec = 0.15 * jnp.clip(jnp.einsum("...d,...d->...", n, h), 0.0, 1.0) ** 32
    return jnp.clip(albedo * lam[..., None] + spec[..., None], 0.0, 1.0)


# ---------------------------------------------------------------------------
# renderer: sphere tracing the analytic SDF
# ---------------------------------------------------------------------------

def _trace_chunk(cam_pos: jnp.ndarray, dirs: jnp.ndarray, n_iters: int = 192,
                 scene_id: int = 0):
    """cam_pos (3,), dirs (N, 3) -> (rgb (N, 3), hit (N,))."""
    sdf = lambda p: scene_sdf(p, scene_id)
    t = jnp.full(dirs.shape[:1], 1.0, jnp.float32)  # start inside [cam, scene]

    def body(_, t):
        p = cam_pos[None, :] + t[:, None] * dirs
        d = sdf(p)
        return t + 0.9 * d  # slight under-relaxation for the smooth-min field

    t = jax.lax.fori_loop(0, n_iters, body, t)
    p = cam_pos[None, :] + t[:, None] * dirs
    d = sdf(p)
    hit = (jnp.abs(d) < 1e-3) & (t < 3.5)

    n = jax.vmap(jax.grad(lambda q: sdf(q[None])[0]))(p)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    rgb = scene_color(p, n, -dirs, scene_id)
    rgb = jnp.where(hit[:, None], rgb, 0.0)
    return rgb, hit


_trace_chunk_jit = jax.jit(_trace_chunk, static_argnums=(2, 3))


def render_view(cam_pos: np.ndarray, R_w2c: np.ndarray, K: np.ndarray,
                img_res, chunk: int = 1 << 19, scene_id: int = 0):
    """Render one (H, W) view; returns (rgb uint8 (H, W, 3), mask bool (H, W))."""
    H, W = img_res
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    d_cam = np.stack(
        [(xs - K[0, 2]) / K[0, 0], (ys - K[1, 2]) / K[1, 1], np.ones_like(xs)],
        axis=-1,
    ).reshape(-1, 3)
    d_world = d_cam @ R_w2c  # R^T d
    d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)

    n = d_world.shape[0]
    pad = (-n) % chunk
    d_pad = np.concatenate([d_world, np.zeros((pad, 3), np.float32)]).astype(np.float32)
    rgbs, hits = [], []
    cam = jnp.asarray(cam_pos, jnp.float32)
    for i in range(0, n + pad, chunk):
        rgb, hit = _trace_chunk_jit(cam, jnp.asarray(d_pad[i : i + chunk]), 192,
                                    scene_id)
        rgbs.append(np.asarray(rgb))
        hits.append(np.asarray(hit))
    rgb = np.concatenate(rgbs)[:n].reshape(H, W, 3)
    hit = np.concatenate(hits)[:n].reshape(H, W)
    return (rgb * 255.0 + 0.5).astype(np.uint8), hit


# ---------------------------------------------------------------------------
# cameras: DTU-like upper-hemisphere arc of 49 views
# ---------------------------------------------------------------------------

def make_cameras(n_views: int = 49, radius: float = 2.2, seed: int = 0):
    """Positions on a DTU-like partial spherical cap looking at the origin."""
    from .dummy import _look_at  # same OpenCV look-at convention

    rng = np.random.default_rng(seed)
    cams = []
    golden = np.pi * (3.0 - np.sqrt(5.0))
    for i in range(n_views):
        # spiral over elevation band [15deg, 65deg] like a DTU robot arm path
        u = (i + 0.5) / n_views
        elev = np.deg2rad(15.0 + 50.0 * u)
        azim = golden * i + rng.uniform(-0.03, 0.03)
        pos = radius * np.array(
            [np.cos(elev) * np.cos(azim), np.sin(elev), np.cos(elev) * np.sin(azim)]
        )
        R = _look_at(pos)
        t = -R @ pos
        cams.append((pos, R, t))
    return cams


# ---------------------------------------------------------------------------
# generator entry
# ---------------------------------------------------------------------------

def generate_dtu_shaped_scene(
    out_dir: str,
    n_views: int = 49,
    img_res=(1200, 1600),
    mesh_resolution: int = 320,
    seed: int = 0,
    noise_rot: float = 0.015,
    noise_trans: float = 0.012,
    scene_id: int = 0,
):
    """Write image/ mask/ cameras.npz cameras_linear_init.npz gt_mesh.ply."""
    from .dummy import _rotvec_to_mat, _write_png

    rng = np.random.default_rng(seed + 1)
    os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)

    H, W = img_res
    K = np.eye(3, dtype=np.float64)
    K[0, 0] = K[1, 1] = 2200.0 * (W / 1600.0)
    K[0, 2], K[1, 2] = W / 2.0, H / 2.0

    cameras, cameras_noisy = {}, {}
    for i, (pos, R, t) in enumerate(make_cameras(n_views, seed=seed + scene_id)):
        img, mask = render_view(pos, R, K, img_res, scene_id=scene_id)
        _write_png(os.path.join(out_dir, "image", f"{i:03d}.png"), img)
        _write_png(os.path.join(out_dir, "mask", f"{i:03d}.png"),
                   (mask * 255).astype(np.uint8))

        wm = np.eye(4)
        wm[:3, :3] = K @ R
        wm[:3, 3] = K @ t
        cameras[f"world_mat_{i}"] = wm
        cameras[f"scale_mat_{i}"] = np.eye(4)  # scene is unit-sphere native

        ang = rng.normal(scale=noise_rot, size=3)
        Rn = _rotvec_to_mat(ang) @ R
        tn = t + rng.normal(scale=noise_trans, size=3)
        wmn = np.eye(4)
        wmn[:3, :3] = K @ Rn
        wmn[:3, 3] = K @ tn
        cameras_noisy[f"world_mat_{i}"] = wmn
        cameras_noisy[f"scale_mat_{i}"] = np.eye(4)
        print(f"view {i + 1}/{n_views} rendered (mask px: {int(mask.sum())})",
              flush=True)

    np.savez(os.path.join(out_dir, "cameras.npz"), **cameras)
    np.savez(os.path.join(out_dir, "cameras_linear_init.npz"), **cameras_noisy)

    write_gt_mesh(os.path.join(out_dir, "gt_mesh.ply"), mesh_resolution,
                  scene_id=scene_id)
    return out_dir


def write_gt_mesh(path: str, resolution: int = 320, bound: float = 0.62,
                  scene_id: int = 0):
    """Marching-tets mesh of the analytic SDF (Chamfer ground truth)."""
    from ..ops.mesh_extract import largest_component, marching_tetrahedra
    from ..utils.ply import write_ply

    axis = np.linspace(-bound, bound, resolution, dtype=np.float32)
    sdf_plane = jax.jit(lambda pl: scene_sdf(pl, scene_id))
    vals = np.empty((resolution,) * 3, np.float32)
    gy, gz = np.meshgrid(axis, axis, indexing="ij")
    for ix, x in enumerate(axis):
        plane = np.stack([np.full_like(gy, x), gy, gz], axis=-1)
        vals[ix] = np.asarray(sdf_plane(jnp.asarray(plane)))
    verts, faces = marching_tetrahedra(vals)
    # grid coords -> world coords
    step = (2 * bound) / (resolution - 1)
    verts = verts * step - bound
    verts, faces = largest_component(verts, faces)
    write_ply(path, verts, faces)
    print(f"gt mesh: {len(verts)} verts / {len(faces)} faces -> {path}", flush=True)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="data", help="data root (scene goes to <out>/dtu_shaped/scan0)")
    p.add_argument("--n_views", type=int, default=49)
    p.add_argument("--img_res", type=int, nargs=2, default=[1200, 1600])
    p.add_argument("--mesh_resolution", type=int, default=320)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scan_id", type=int, default=0,
                   help="scene variant (0: torus+box blob, 1: capsule+handle, "
                        "2: bumpy blob on slab); writes <out>/dtu_shaped/scan<N>")
    args = p.parse_args(argv)

    out_dir = os.path.join(args.out, "dtu_shaped", f"scan{args.scan_id}")
    generate_dtu_shaped_scene(
        out_dir, n_views=args.n_views, img_res=tuple(args.img_res),
        mesh_resolution=args.mesh_resolution, seed=args.seed,
        scene_id=args.scan_id,
    )
    print(f"dtu_shaped scene written to {out_dir}")


if __name__ == "__main__":
    main()
