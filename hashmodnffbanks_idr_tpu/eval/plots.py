"""Training-time plot artifacts (renders, depth maps, meshes).

Role-parity with utils/plots.py:11-308: every plot_freq epochs dump
rendered-vs-GT image grids, depth maps, and a marching-tets mesh snapshot.
The plotly 3D HTML scene of the reference is replaced by a PLY mesh +
camera-frustum PLY (viewable in any mesh viewer) — same information, no
plotly dependency.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..utils.ply import write_ply
from .html_viewer import write_scene_html
from .surface import get_surface_mesh


def save_image_grid(path: str, rendered: np.ndarray, gt: np.ndarray,
                    mask: np.ndarray):
    """side-by-side [render | gt | mask] (plots.py:287-304 role)."""
    import cv2

    H, W = rendered.shape[:2]
    r = ((rendered + 1) * 127.5).clip(0, 255).astype(np.uint8)
    g = ((gt + 1) * 127.5).clip(0, 255).astype(np.uint8)
    m = np.repeat((mask[..., None] * 255).astype(np.uint8), 3, axis=-1)
    grid = np.concatenate([r, g, m], axis=1)
    cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))


def save_depth_map(path: str, dists: np.ndarray, mask: np.ndarray,
                   max_depth: float = 3.0):
    """normalized depth visualization (plots.py:273-285 role)."""
    import cv2

    d = np.where(mask, dists, max_depth)
    d = (d - d.min()) / max(d.max() - d.min(), 1e-6)
    img = (255 * (1.0 - d)).astype(np.uint8)
    cv2.imwrite(path, cv2.applyColorMap(img, cv2.COLORMAP_VIRIDIS))


def camera_frustum_ply(path: str, poses: np.ndarray, scale: float = 0.1):
    """Camera positions + viewing direction segments as a point/edge cloud."""
    pts = []
    for p in poses:
        c = p[:3, 3]
        z = p[:3, 2]
        pts.append(c)
        for t in np.linspace(0, scale, 5):
            pts.append(c + t * z)
    pts = np.asarray(pts)
    write_ply(path, pts, np.zeros((0, 3), dtype=np.int64))


def plot_epoch(
    plots_dir: str,
    epoch: int,
    view: Dict[str, np.ndarray],
    sdf_fn,
    poses: np.ndarray,
    resolution: int = 100,
):
    """The per-plot-epoch artifact dump (idr_train.py:231-273 role)."""
    os.makedirs(plots_dir, exist_ok=True)
    save_image_grid(os.path.join(plots_dir, f"rendering_{epoch}.png"),
                    view["rgb"], view["gt_rgb"], view["mask"])
    save_depth_map(os.path.join(plots_dir, f"depth_{epoch}.png"),
                   view["dists"], view["mask"])
    verts, faces = get_surface_mesh(sdf_fn, resolution=resolution)
    if len(verts):
        write_ply(os.path.join(plots_dir, f"surface_{epoch}.ply"), verts, faces)
        # standalone interactive HTML scene (reference: plotly offline HTML)
        write_scene_html(os.path.join(plots_dir, f"surface_{epoch}.html"),
                         verts, faces, poses, title=f"epoch {epoch}")
    camera_frustum_ply(os.path.join(plots_dir, f"cameras_{epoch}.ply"), poses)
