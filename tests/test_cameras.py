import numpy as np
import jax.numpy as jnp

from hashmodnffbanks_idr_tpu.geometry import cameras as cam


def random_projection(rng):
    # build K [R|t] with known components
    fx, fy = rng.uniform(300, 1500, 2)
    cx, cy = rng.uniform(100, 800, 2)
    K = np.array([[fx, 0.0, cx], [0, fy, cy], [0, 0, 1.0]])
    # random rotation via QR
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3) * 2 + np.array([0, 0, 4.0])
    P = K @ np.concatenate([Q, t[:, None]], axis=1)
    return P, K, Q, t


def test_decompose_projection_matches_construction():
    rng = np.random.default_rng(0)
    for _ in range(10):
        P, K, R, t = random_projection(rng)
        intr, pose = cam.decompose_projection(P)
        np.testing.assert_allclose(intr[:3, :3], K, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(pose[:3, :3], R.T, rtol=1e-4, atol=1e-5)
        center = -R.T @ t
        np.testing.assert_allclose(pose[:3, 3], center, rtol=1e-4, atol=1e-4)


def test_decompose_matches_cv2():
    try:
        import cv2
    except ImportError:
        return
    rng = np.random.default_rng(1)
    P, _, _, _ = random_projection(rng)
    intr, pose = cam.decompose_projection(P)
    out = cv2.decomposeProjectionMatrix(P)
    K2 = out[0] / out[0][2, 2]
    np.testing.assert_allclose(intr[:3, :3], K2, rtol=1e-4, atol=1e-3)


def test_rays_project_back():
    rng = np.random.default_rng(2)
    P, K, R, t = random_projection(rng)
    intr, pose = cam.decompose_projection(P)
    uv = np.array([[[100.0, 200.0], [321.0, 99.0], [64.0, 64.0]]], dtype=np.float32)
    ray_dirs, cam_loc = cam.get_camera_params(
        jnp.asarray(uv), jnp.asarray(pose[None]), jnp.asarray(intr[None])
    )
    # points along the rays must project to the original pixels
    pts = np.asarray(cam_loc)[:, None, :] + 3.0 * np.asarray(ray_dirs)
    for i in range(uv.shape[1]):
        proj = P @ np.append(pts[0, i], 1.0)
        xy = proj[:2] / proj[2]
        np.testing.assert_allclose(xy, uv[0, i], rtol=1e-3, atol=0.2)


def test_quat_roundtrip():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(4, 3, 3))
    Qs = []
    for a in A:
        q, _ = np.linalg.qr(a)
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        Qs.append(q)
    Rm = np.stack(Qs)
    quat = cam.rot_to_quat(Rm)
    back = np.asarray(cam.quat_to_rot(jnp.asarray(quat)))
    np.testing.assert_allclose(back, Rm, rtol=1e-4, atol=1e-4)


def test_sphere_intersection_analytic():
    cam_loc = jnp.asarray([[0.0, 0.0, 3.0]])
    dirs = jnp.asarray([[[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]]])
    si, mask = cam.get_sphere_intersection(cam_loc, dirs, r=1.0)
    si = np.asarray(si)
    mask = np.asarray(mask)
    assert mask[0, 0] and not mask[0, 1]
    np.testing.assert_allclose(si[0, 0], [2.0, 4.0], atol=1e-5)
    np.testing.assert_allclose(si[0, 1], [0.0, 0.0], atol=1e-6)


def test_uv_grid_layout():
    g = cam.uv_grid((2, 3))
    # row-major over (H, W); uv[:,0]=x (col), uv[:,1]=y (row)
    np.testing.assert_allclose(g[0], [0, 0])
    np.testing.assert_allclose(g[1], [1, 0])
    np.testing.assert_allclose(g[3], [0, 1])
