"""Scene dataset: multi-view masked images + cameras.npz.

TPU-native re-design of code/datasets/scene_dataset.py:8-160.  Instead of a
torch DataLoader feeding per-step CPU tensors, all pixels live on device once
(RGB as uint8 to keep HBM small — a DTU scan is ~280 MB as uint8 vs ~4.4 GB as
[-1,1] float32) and the per-step random-pixel minibatch is gathered *inside*
the jitted train step from a JAX PRNG key.  That removes the host->device copy
from the step critical path entirely — the TPU equivalent of a data loader.

Camera decomposition matches the reference: P = world_mat @ scale_mat,
intrinsics/pose via RQ decomposition (scene_dataset.py:46-51).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Optional

import numpy as np

from ..geometry.cameras import decompose_projection, rot_to_quat, uv_grid


def glob_imgs(path: str):
    imgs = []
    for ext in ["*.png", "*.jpg", "*.JPEG", "*.JPG"]:
        imgs.extend(glob(os.path.join(path, ext)))
    return sorted(imgs)


def load_rgb_uint8(path: str) -> np.ndarray:
    """(H, W, 3) uint8 RGB."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def load_mask(path: str) -> np.ndarray:
    import cv2

    alpha = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if alpha is None:
        raise FileNotFoundError(path)
    return alpha > 127.5  # rend_util.py:18-23


def rgb_to_pm1(rgb_uint8: np.ndarray) -> np.ndarray:
    """uint8 -> [-1, 1] float32 (rend_util.py:8-16)."""
    return (rgb_uint8.astype(np.float32) / 255.0 - 0.5) * 2.0


class SceneDataset:
    """Loads a scan directory: image/, mask/, cameras.npz."""

    def __init__(
        self,
        train_cameras: bool,
        data_dir: str,
        img_res,
        scan_id: int = 0,
        cam_file: Optional[str] = None,
        data_root: Optional[str] = None,
    ):
        root = data_root or os.environ.get("HMNFFB_DATA_ROOT", "data")
        self.instance_dir = os.path.join(root, data_dir, f"scan{scan_id}")
        assert os.path.exists(self.instance_dir), f"Data directory is empty: {self.instance_dir}"

        self.img_res = tuple(img_res)
        self.total_pixels = img_res[0] * img_res[1]
        self.train_cameras = train_cameras

        image_paths = glob_imgs(os.path.join(self.instance_dir, "image"))
        mask_paths = glob_imgs(os.path.join(self.instance_dir, "mask"))
        self.n_images = len(image_paths)

        self.cam_file = os.path.join(self.instance_dir, cam_file or "cameras.npz")
        camera_dict = np.load(self.cam_file)
        scale_mats = [camera_dict[f"scale_mat_{i}"].astype(np.float32) for i in range(self.n_images)]
        world_mats = [camera_dict[f"world_mat_{i}"].astype(np.float32) for i in range(self.n_images)]

        intr, poses = [], []
        for scale_mat, world_mat in zip(scale_mats, world_mats):
            P = (world_mat @ scale_mat)[:3, :4]
            intrinsics, pose = decompose_projection(P)
            intr.append(intrinsics)
            poses.append(pose)
        self.intrinsics_all = np.stack(intr).astype(np.float32)  # (V, 4, 4)
        self.pose_all = np.stack(poses).astype(np.float32)       # (V, 4, 4)

        # native multithreaded decode when built (native/scene_loader.cpp);
        # serial cv2 fallback otherwise
        from .native_loader import load_scene_native

        native = load_scene_native(image_paths, mask_paths, self.img_res)
        if native is not None:
            self.rgb_images, self.object_masks = native
        else:
            self.rgb_images = np.stack(
                [load_rgb_uint8(p).reshape(-1, 3) for p in image_paths]
            )  # (V, H*W, 3) uint8
            self.object_masks = np.stack(
                [load_mask(p).reshape(-1) for p in mask_paths]
            )  # (V, H*W) bool

        self.uv = uv_grid(self.img_res)  # (H*W, 2) float32

    def __len__(self):
        return self.n_images

    # -- full-image access (plot / eval path) -----------------------------
    def full_image_inputs(self, idx: int):
        sample = {
            "object_mask": self.object_masks[idx][None],
            "uv": self.uv[None],
            "intrinsics": self.intrinsics_all[idx][None],
            "pose": self.pose_all[idx][None],
        }
        ground_truth = {"rgb": rgb_to_pm1(self.rgb_images[idx])[None]}
        return sample, ground_truth

    # -- camera initializations -------------------------------------------
    def get_scale_mat(self):
        return np.load(self.cam_file)["scale_mat_0"]

    def get_gt_pose(self, scaled: bool = False):
        camera_dict = np.load(self.cam_file)
        poses = []
        for i in range(self.n_images):
            P = camera_dict[f"world_mat_{i}"].astype(np.float32)
            if scaled:
                P = P @ camera_dict[f"scale_mat_{i}"].astype(np.float32)
            _, pose = decompose_projection(P[:3, :4])
            poses.append(pose)
        return np.stack(poses)

    def get_pose_init(self) -> np.ndarray:
        """Noisy linear-init poses as (V, 7) quaternion+translation
        (scene_dataset.py:139-156)."""
        cam_file = os.path.join(self.instance_dir, "cameras_linear_init.npz")
        camera_dict = np.load(cam_file)
        poses = []
        for i in range(self.n_images):
            P = (
                camera_dict[f"world_mat_{i}"].astype(np.float32)
                @ camera_dict[f"scale_mat_{i}"].astype(np.float32)
            )[:3, :4]
            _, pose = decompose_projection(P)
            poses.append(pose)
        poses = np.stack(poses)
        quat = rot_to_quat(poses[:, :3, :3])
        return np.concatenate([quat, poses[:, :3, 3]], axis=1).astype(np.float32)

    # -- device-resident tensors for the jitted sampler -------------------
    def device_arrays(self):
        """Everything the jitted train step needs, as numpy (jit will move it)."""
        return {
            "rgb": self.rgb_images,            # (V, HW, 3) uint8
            "mask": self.object_masks,         # (V, HW) bool
            "uv": self.uv,                     # (HW, 2) f32
            "intrinsics": self.intrinsics_all,  # (V, 4, 4)
            "pose": self.pose_all,             # (V, 4, 4)
        }
