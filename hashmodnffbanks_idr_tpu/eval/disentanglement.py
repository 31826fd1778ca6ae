"""Geometry/appearance disentanglement evaluation.

Re-design of code/evaluation/eval_disentanglement.py:16-195: load a geometry
checkpoint into model A and an appearance checkpoint into model B, swap the
rendering-network params (the entire mechanism — eval_disentanglement.py:85),
generate a cubic-spline camera orbit in quaternion space, and render novel
views with empty object masks.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..config.hocon import Config
from ..geometry.cameras import rot_to_quat
from .evaluator import Evaluator


def swap_appearance(params_geometry: Dict, params_appearance: Dict) -> Dict:
    """The appearance-transfer mechanism (eval_disentanglement.py:85)."""
    out = dict(params_geometry)
    out["rendering_network"] = params_appearance["rendering_network"]
    return out


def spline_camera_orbit(poses: np.ndarray, n_frames: int = 30) -> np.ndarray:
    """Cubic-spline interpolation through the train poses in quat+t space
    (eval_disentanglement.py:108-123). poses: (V, 4, 4) -> (n_frames, 4, 4)."""
    from scipy.interpolate import CubicSpline

    quats = rot_to_quat(poses[:, :3, :3])
    trans = poses[:, :3, 3]
    vec = np.concatenate([quats, trans], axis=1)  # (V, 7)
    t = np.arange(len(vec))
    cs = CubicSpline(t, vec, axis=0, bc_type="periodic" if np.allclose(vec[0], vec[-1]) else "not-a-knot")
    ts = np.linspace(0, len(vec) - 1, n_frames)
    v = cs(ts)
    # back to matrices
    from ..geometry.cameras import quat_to_rot
    import jax.numpy as jnp

    R = np.asarray(quat_to_rot(jnp.asarray(v[:, :4], dtype=jnp.float32)))
    out = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    out[:, :3, :3] = R
    out[:, :3, 3] = v[:, 4:]
    return out


def render_disentangled(
    conf: Config, params_geometry: Dict, params_appearance: Dict,
    out_dir: str, n_frames: int = 10, data_root: Optional[str] = None,
    scan_id: int = -1,
):
    import os

    import cv2

    params = swap_appearance(params_geometry, params_appearance)
    ev = Evaluator(conf, params, data_root=data_root, scan_id=scan_id)
    orbit = spline_camera_orbit(ev.dataset.pose_all, n_frames)
    os.makedirs(out_dir, exist_ok=True)
    H, W = ev.dataset.img_res
    for i, pose in enumerate(orbit):
        sample, _ = ev.dataset.full_image_inputs(0)
        sample = dict(sample)
        sample["pose"] = pose[None]
        sample["object_mask"] = np.zeros_like(sample["object_mask"])  # empty masks
        view = _render_with_pose(ev, sample)
        rgb = ((view + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, f"frame_{i:03d}.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    return out_dir


def main(argv=None):
    """CLI parity with code/evaluation/eval_disentanglement.py."""
    import argparse

    from ..config.hocon import parse_file
    from ..models.renderer import IDRNetwork
    from ..train import checkpoints as ckpt

    p = argparse.ArgumentParser()
    p.add_argument("--conf", required=True)
    p.add_argument("--geometry_run_dir", required=True,
                   help="run dir providing the SDF (checkpoints/latest)")
    p.add_argument("--appearance_run_dir", required=True,
                   help="run dir providing the rendering network")
    p.add_argument("--out_dir", default="evals_disentanglement")
    p.add_argument("--n_frames", type=int, default=10)
    p.add_argument("--scan_id", type=int, default=-1)
    p.add_argument("--data_root", default=None)
    args = p.parse_args(argv)

    import jax
    from flax import serialization

    conf = parse_file(args.conf)
    model = IDRNetwork(conf.get_config("model"))
    template = model.init(jax.random.PRNGKey(0))

    def load(run_dir):
        raw = ckpt.load_checkpoint(f"{run_dir}/checkpoints")
        return serialization.from_state_dict(template, raw["params"])

    render_disentangled(conf, load(args.geometry_run_dir),
                        load(args.appearance_run_dir), args.out_dir,
                        n_frames=args.n_frames, data_root=args.data_root,
                        scan_id=args.scan_id)


def _render_with_pose(ev: Evaluator, sample) -> np.ndarray:
    import jax.numpy as jnp

    total = ev.dataset.total_pixels
    tile = ev.tile
    H, W = ev.dataset.img_res
    rgb_out = np.empty((total, 3), dtype=np.float32)
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
            "pose": jnp.asarray(sample["pose"]),
            "object_mask": jnp.asarray(om),
        }
        out = ev._render_tile(ev.params, inputs)
        rgb_out[s:e] = np.asarray(out["rgb_values"])[: e - s]
    return rgb_out.reshape(H, W, 3)
if __name__ == "__main__":
    main()
