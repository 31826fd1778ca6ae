import numpy as np
import pytest

from hashmodnffbanks_idr_tpu.ops.mesh_extract import (largest_component,
                                                      marching_tetrahedra)
from hashmodnffbanks_idr_tpu.models.metrics import (chamfer_distance,
                                                    masked_psnr, ssim)


def sphere_field(res, r=0.6):
    ax = np.linspace(-1, 1, res)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(X**2 + Y**2 + Z**2) - r, ax


def test_marching_tets_sphere():
    vals, ax = sphere_field(48)
    verts, faces = marching_tetrahedra(vals)
    assert len(verts) > 100 and len(faces) > 100
    # vertices lie on the r=0.6 sphere (in grid coords -> convert)
    scale = ax[1] - ax[0]
    world = verts * scale - 1.0
    radii = np.linalg.norm(world, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.02)
    assert radii.std() < 0.02
    # faces index valid vertices
    assert faces.max() < len(verts)


def test_marching_tets_empty():
    vals = np.ones((8, 8, 8))
    verts, faces = marching_tetrahedra(vals)
    assert len(verts) == 0 and len(faces) == 0


def test_largest_component():
    # two separated spheres; keep the bigger one
    ax = np.linspace(-2, 2, 64)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    d1 = np.sqrt((X + 1) ** 2 + Y**2 + Z**2) - 0.8
    d2 = np.sqrt((X - 1.2) ** 2 + Y**2 + Z**2) - 0.3
    vals = np.minimum(d1, d2)
    verts, faces = marching_tetrahedra(vals)
    v2, f2 = largest_component(verts, faces)
    assert len(v2) < len(verts)
    scale = ax[1] - ax[0]
    world = v2 * scale - 2.0
    # all remaining verts belong to the big sphere (center -1,0,0)
    assert (np.linalg.norm(world - np.array([-1, 0, 0]), axis=-1) < 1.0).all()


def test_surface_mesh_from_sdf():
    import jax.numpy as jnp

    from hashmodnffbanks_idr_tpu.eval.surface import get_surface_mesh

    sdf = lambda x: jnp.linalg.norm(x, axis=-1) - 0.5
    verts, faces = get_surface_mesh(sdf, resolution=40, chunk=2048)
    radii = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.02)


def test_chamfer_identity_and_offset():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(500, 3))
    res = chamfer_distance(p, p)
    assert res["overall"] < 1e-9
    res2 = chamfer_distance(p, p + np.array([0.1, 0, 0]))
    assert 0.0 < res2["overall"] <= 0.1 + 1e-6


def test_psnr_ssim():
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    mask = np.ones((32, 32), dtype=bool)
    assert masked_psnr(img, img, mask) == float("inf")
    noisy = img + 0.01 * rng.normal(size=img.shape).astype(np.float32)
    p = masked_psnr(noisy, img, mask)
    assert 40 < p < 60
    s = ssim(img, img)
    np.testing.assert_allclose(s, 1.0, atol=1e-6)
    assert ssim(noisy, img) < 1.0


def test_ply_roundtrip(tmp_path):
    from hashmodnffbanks_idr_tpu.utils.ply import read_ply, write_ply

    verts = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int64)
    path = str(tmp_path / "m.ply")
    write_ply(path, verts, faces)
    v2, f2 = read_ply(path)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_dtu_chamfer_harness():
    from hashmodnffbanks_idr_tpu.eval.dtu_chamfer import dtu_chamfer

    vals, ax = sphere_field(32)
    verts, faces = marching_tetrahedra(vals)
    scale = ax[1] - ax[0]
    verts = verts * scale - 1.0
    # gt = points on the same sphere
    rng = np.random.default_rng(0)
    d = rng.normal(size=(2000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    gt = 0.6 * d
    res = dtu_chamfer(verts, faces, gt, downsample_density=0.05)
    assert res["over_all"] < 0.05


def test_camera_alignment_recovers_transform():
    from hashmodnffbanks_idr_tpu.eval.evaluator import camera_alignment

    rng = np.random.default_rng(2)
    n = 12
    Rs, ts = [], []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        Rs.append(q)
        ts.append(rng.normal(size=3) * 2)
    Rs = np.stack(Rs)
    ts = np.stack(ts)
    # predicted = gt rotated by Q0 and scaled/translated
    q0, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q0) < 0:
        q0[:, 0] *= -1
    pred_R = np.einsum("nij,jk->nik", Rs, q0)
    pred_t = (ts - np.array([1.0, 2.0, 3.0])) @ q0 / 2.0
    res = camera_alignment(pred_R, Rs, pred_t, ts)
    assert res["rot_err_mean"] < 1e-4
    assert res["t_err_mean"] < 1e-6


def test_scene_html_viewer(tmp_path):
    """The standalone HTML scene artifact embeds the exact geometry."""
    import base64
    import json
    import re

    from hashmodnffbanks_idr_tpu.eval.html_viewer import write_scene_html

    rng = np.random.default_rng(0)
    verts = rng.random((50, 3)).astype(np.float32)
    faces = rng.integers(0, 50, (80, 3))
    poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    path = str(tmp_path / "scene.html")
    write_scene_html(path, verts, faces, poses, title="test scene")

    html = open(path).read()
    assert "webgl" in html and "test scene" in html
    scene = json.loads(re.search(r"const SCENE = (\{.*?\});\n", html, re.S).group(1))
    v = np.frombuffer(base64.b64decode(scene["verts"]), np.float32).reshape(-1, 3)
    f = np.frombuffer(base64.b64decode(scene["faces"]), np.uint32).reshape(-1, 3)
    segs = np.frombuffer(base64.b64decode(scene["cam_segs"]), np.float32)
    assert np.allclose(v, verts) and (f == faces).all()
    assert segs.shape == (4 * 8 * 2 * 3,)  # 4 frusta x 8 segments x 2 pts
    assert scene["radius"] > 0


def test_masked_metric_convention():
    """Reference convention (eval.py:164-185): SSIM/LPIPS on mask-multiplied
    [0,1] images. A white-miss render vs a black-background GT must still
    score high when the foreground matches (regression: unmasked SSIM was
    -0.86 on the DTU-shaped benchmark)."""
    rng = np.random.default_rng(0)
    H = W = 48
    fg = np.zeros((H, W), bool)
    fg[12:36, 12:36] = True
    obj = rng.random((H, W, 3)).astype(np.float32)
    gt01 = np.where(fg[..., None], obj, 0.0)     # black background
    render01 = np.where(fg[..., None], obj, 1.0)  # white miss convention

    m3 = fg[..., None].astype(np.float32)
    s_masked = ssim(render01 * m3, gt01 * m3, data_range=1.0)
    s_unmasked = ssim(render01, gt01, data_range=1.0)
    assert s_masked > 0.95
    assert s_unmasked < s_masked  # the convention matters

    p = masked_psnr(render01 * m3, gt01 * m3, fg, data_range=1.0)
    assert p > 40  # identical foreground
