"""Camera normalization: compute scale_mat so the visual hull fits the unit
sphere.

Role-parity with code/preprocess_cameras.py:10-239.  The reference estimates
per-silhouette-point depth bounds from fundamental-matrix epipolar transfer
and optionally refines with a visual hull on a 100^3 grid (>=45 views).  Here
the visual-hull voxel carving *is* the primary method (it is the reference's
refined branch and strictly more robust): carve a grid against every mask,
then fit the minimal enclosing sphere of surviving voxels -> scale_mat =
diag(r, r, r) + center.  Writes cameras_new.npz alongside the input.

CLI:
    python -m hashmodnffbanks_idr_tpu.data.preprocess_cameras \
        --source_dir <dir with image/ mask/ cameras.npz> [--grid 100]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .scene_dataset import glob_imgs, load_mask


def visual_hull_scale(masks: np.ndarray, Ps: np.ndarray, img_res,
                      grid: int = 100, extent: float = 6.0,
                      min_views_frac: float = 1.0):
    """masks: (V, H, W) bool; Ps: (V, 3, 4) projection matrices.

    Returns (center (3,), radius float) of the visual hull.
    """
    V, H, W = masks.shape
    axs = np.linspace(-extent, extent, grid)
    X, Y, Z = np.meshgrid(axs, axs, axs, indexing="ij")
    pts = np.stack([X, Y, Z, np.ones_like(X)], axis=-1).reshape(-1, 4)  # (G, 4)

    votes = np.zeros(len(pts), dtype=np.int32)
    for v in range(V):
        proj = pts @ Ps[v].T  # (G, 3)
        z = proj[:, 2]
        x = proj[:, 0] / np.where(np.abs(z) < 1e-9, 1e-9, z)
        y = proj[:, 1] / np.where(np.abs(z) < 1e-9, 1e-9, z)
        inside = (z > 0) & (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
        xi = np.clip(x.astype(np.int64), 0, W - 1)
        yi = np.clip(y.astype(np.int64), 0, H - 1)
        votes += (inside & masks[v, yi, xi]).astype(np.int32)

    need = int(np.ceil(min_views_frac * V))
    hull = pts[votes >= need, :3]
    if len(hull) == 0:  # relax: majority of views
        hull = pts[votes >= max(V // 2, 1), :3]
    if len(hull) == 0:
        raise RuntimeError("visual hull empty — check masks/cameras")
    center = hull.mean(axis=0)
    radius = np.linalg.norm(hull - center, axis=-1).max() * 1.1
    return center, radius


def compute_scale_mats(source_dir: str, grid: int = 100,
                       use_linear_init: bool = False) -> str:
    cam_name = "cameras_linear_init.npz" if use_linear_init else "cameras.npz"
    cam_path = os.path.join(source_dir, cam_name)
    cameras = dict(np.load(cam_path))
    mask_paths = glob_imgs(os.path.join(source_dir, "mask"))
    masks = np.stack([load_mask(p) for p in mask_paths])
    V = len(mask_paths)
    Ps = np.stack([cameras[f"world_mat_{i}"][:3, :4] for i in range(V)])

    center, radius = visual_hull_scale(masks, Ps, masks.shape[1:], grid=grid)

    scale_mat = np.eye(4, dtype=np.float64)
    scale_mat[:3, :3] *= radius
    scale_mat[:3, 3] = center

    out = {}
    for i in range(V):
        out[f"world_mat_{i}"] = cameras[f"world_mat_{i}"]
        out[f"scale_mat_{i}"] = scale_mat
    out_path = os.path.join(source_dir, cam_name.replace(".npz", "_new.npz"))
    np.savez(out_path, **out)
    print(f"wrote {out_path} (center={center.round(3)}, radius={radius:.3f})")
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--source_dir", required=True)
    p.add_argument("--grid", type=int, default=100)
    p.add_argument("--use_linear_init", action="store_true")
    args = p.parse_args(argv)
    compute_scale_mats(args.source_dir, args.grid, args.use_linear_init)


if __name__ == "__main__":
    main()
