"""Evaluation: mesh export + per-view rendering metrics (PSNR/SSIM/LPIPS).

Re-design of code/evaluation/eval.py:17-304:
  * mesh: high-res two-pass surface extraction, transformed to world
    coordinates by scale_mat (or the aligned trained-camera transform),
    largest component, exported as surface_world_coordinates_{epoch}.ply
    (eval.py:108-123);
  * rendering: every train view re-rendered in fixed-size ray tiles through
    the jitted eval forward, masked PSNR + SSIM (+ LPIPS when weights are
    available) per view written to CSVs under evals/<exp>/metrics/
    (eval.py:132-205);
  * cameras: Procrustes rotation + least-squares scale/translation alignment
    replaces the reference's SVD + cvxpy LP (eval.py:208-251).
"""

from __future__ import annotations

import csv
import os
from functools import partial
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config.hocon import Config
from ..data.scene_dataset import SceneDataset
from ..models.metrics import lpips_or_none, masked_psnr, ssim
from ..models.renderer import IDRNetwork
from ..utils.ply import write_ply
from .surface import get_surface_high_res_mesh


class Evaluator:
    def __init__(self, conf: Config, params, train_cameras: bool = False,
                 pose_vecs: Optional[np.ndarray] = None,
                 data_root: Optional[str] = None, scan_id: int = -1,
                 tile: int = 32768, dataset: Optional[SceneDataset] = None):
        self.conf = conf
        self.model = IDRNetwork(conf.get_config("model"))
        self.params = params
        self.train_cameras = train_cameras
        self.pose_vecs = pose_vecs
        self.tile = tile

        if dataset is not None:
            self.dataset = dataset
        else:
            dataset_conf = dict(conf.get_config("dataset").data)
            if scan_id != -1:
                dataset_conf["scan_id"] = scan_id
            self.dataset = SceneDataset(train_cameras, data_root=data_root, **dataset_conf)

        self._render_tile = jax.jit(partial(self._render_tile_impl))

    # -- jitted per-tile eval forward -------------------------------------
    def _render_tile_impl(self, params, inputs):
        out = self.model.apply(params, inputs, jax.random.PRNGKey(0), training=False)
        return {
            "rgb_values": out["rgb_values"],
            "network_object_mask": out["network_object_mask"],
            "dists": out["dists"],
            "points": out["points"],
        }

    def render_view(self, idx: int) -> Dict[str, np.ndarray]:
        sample, gt = self.dataset.full_image_inputs(idx)
        if self.train_cameras and self.pose_vecs is not None:
            pose = np.asarray(self.pose_vecs[idx])[None]
        else:
            pose = sample["pose"]
        total = self.dataset.total_pixels
        tile = self.tile
        # Dispatch all tiles asynchronously, read back ONCE at the end: this
        # runtime's device<->host round trip is ~hundreds of ms, so per-tile
        # np.asarray readbacks dominated full-image rendering (observed
        # ~9 min/view at tile=4096 with 3 readbacks/tile on 1200x1600).
        outs = []
        for s in range(0, total, tile):
            e = min(s + tile, total)
            uv = sample["uv"][:, s:e]
            om = sample["object_mask"][:, s:e]
            if e - s < tile:
                pad = tile - (e - s)
                uv = np.concatenate([uv, np.repeat(uv[:, -1:], pad, axis=1)], axis=1)
                om = np.concatenate([om, np.repeat(om[:, -1:], pad, axis=1)], axis=1)
            inputs = {
                "uv": jnp.asarray(uv),
                "intrinsics": jnp.asarray(sample["intrinsics"]),
                "pose": jnp.asarray(pose),
                "object_mask": jnp.asarray(om),
            }
            outs.append(self._render_tile(self.params, inputs))
        rgb_out = np.asarray(
            jnp.concatenate([o["rgb_values"] for o in outs], axis=0))[:total]
        mask_out = np.asarray(
            jnp.concatenate([o["network_object_mask"] for o in outs], axis=0))[:total]
        dist_out = np.asarray(
            jnp.concatenate([o["dists"] for o in outs], axis=0))[:total]
        H, W = self.dataset.img_res
        return {
            "rgb": rgb_out.reshape(H, W, 3),
            "mask": mask_out.reshape(H, W),
            "dists": dist_out.reshape(H, W),
            "gt_rgb": gt["rgb"].reshape(H, W, 3),
            "gt_mask": sample["object_mask"].reshape(H, W),
        }

    # -- mesh -------------------------------------------------------------
    def extract_mesh(self, resolution: int = 400, transform: Optional[np.ndarray] = None):
        p_impl = self.params["implicit_network"]
        sdf_fn = lambda x: self.model.implicit_network.sdf(p_impl, x)
        verts, faces = get_surface_high_res_mesh(sdf_fn, resolution=resolution)
        if transform is None:
            transform = self.dataset.get_scale_mat()
        if len(verts):
            verts = verts @ transform[:3, :3].T + transform[:3, 3]
        return verts, faces

    def export_mesh(self, out_path: str, epoch: int = 0, resolution: int = 400,
                    transform: Optional[np.ndarray] = None):
        verts, faces = self.extract_mesh(resolution, transform)
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        write_ply(out_path, verts, faces)
        return out_path

    # -- rendering metrics -------------------------------------------------
    def eval_rendering(self, out_dir: str, save_images: bool = True,
                       views=None) -> Dict[str, float]:
        os.makedirs(os.path.join(out_dir, "metrics"), exist_ok=True)
        if save_images:
            os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
        psnrs, ssims, lpipss = [], [], []
        view_ids = list(views) if views else list(range(len(self.dataset)))
        for idx in view_ids:
            view = self.render_view(idx)
            mask = view["gt_mask"]
            # reference metric convention (eval.py:164-185): images mapped to
            # [0,1] and MULTIPLIED by the object mask before every metric —
            # SSIM/LPIPS run on the masked images (metrics.py:26-55), PSNR's
            # MSE is renormalized by the mask count.
            m3 = mask[..., None].astype(np.float32)
            rgb01 = (view["rgb"] + 1.0) / 2.0 * m3
            gt01 = (view["gt_rgb"] + 1.0) / 2.0 * m3
            p = masked_psnr(rgb01, gt01, mask, data_range=1.0)
            s = ssim(rgb01, gt01, data_range=1.0)
            l = lpips_or_none(rgb01, gt01)
            psnrs.append(p)
            ssims.append(s)
            lpipss.append(l if l is not None else float("nan"))
            if save_images:
                self._save_view_png(os.path.join(out_dir, "renders", f"{idx:03d}.png"), view)
        for name, vals in [("psnrs", psnrs), ("ssims", ssims), ("lpips", lpipss)]:
            with open(os.path.join(out_dir, "metrics", f"{name}.csv"), "w", newline="") as f:
                w = csv.writer(f)
                for i, v in zip(view_ids, vals):
                    w.writerow([i, v])
        from ..models.lpips import weights_source

        return {
            "psnr_mean": float(np.nanmean(psnrs)),
            "ssim_mean": float(np.nanmean(ssims)),
            "lpips_mean": float(np.nanmean(lpipss)),
            # 'official' or 'fallback' — fallback LPIPS values are not
            # comparable to published AlexNet-LPIPS numbers (models/lpips.py)
            "lpips_weights": weights_source(),
        }

    def _save_view_png(self, path: str, view):
        import cv2

        rgb = ((view["rgb"] + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        gt = ((view["gt_rgb"] + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        grid = np.concatenate([rgb, gt], axis=1)
        cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))


# ---------------------------------------------------------------------------
# camera accuracy (eval.py:208-251, cvxpy replaced by least squares)
# ---------------------------------------------------------------------------

def camera_alignment(pred_Rs: np.ndarray, gt_Rs: np.ndarray,
                     pred_ts: np.ndarray, gt_ts: np.ndarray):
    """Align predicted cameras to GT: Procrustes rotation (SVD) + similarity
    (scale, translation) by least squares; returns per-camera rotation errors
    (deg) and translation errors after alignment."""
    # rotation alignment: find Q minimizing sum ||pred_R_i Q - gt_R_i||
    M = sum(p.T @ g for p, g in zip(pred_Rs, gt_Rs))
    U, _, Vt = np.linalg.svd(M)
    Q = U @ Vt
    if np.linalg.det(Q) < 0:
        U[:, -1] *= -1
        Q = U @ Vt
    rot_errs = []
    for p, g in zip(pred_Rs, gt_Rs):
        dR = (p @ Q).T @ g
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        rot_errs.append(ang)

    # similarity on camera centers: gt ~ s * (pred @ Q') + t
    pred_c = pred_ts @ Q
    # solve per-axis scale+shift jointly: gt = s*pred + t (shared s, per-axis t)
    n = len(pred_c)
    X = np.zeros((3 * n, 4))
    y = gt_ts.reshape(-1)
    for ax in range(3):
        X[ax::3, 0] = pred_c[:, ax]
        X[ax::3, 1 + ax] = 1.0
    sol, *_ = np.linalg.lstsq(X, y, rcond=None)
    s, t = sol[0], sol[1:]
    aligned = s * pred_c + t
    t_errs = np.linalg.norm(aligned - gt_ts, axis=-1)
    return {
        "rot_err_mean": float(np.mean(rot_errs)),
        "rot_err_median": float(np.median(rot_errs)),
        "t_err_mean": float(np.mean(t_errs)),
        "t_err_median": float(np.median(t_errs)),
        "rotation": Q, "scale": float(s), "translation": t,
    }
