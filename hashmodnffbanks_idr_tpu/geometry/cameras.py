"""Camera geometry: projection decomposition, ray generation, quaternions.

TPU-native equivalents of the reference's ``code/utils/rend_util.py``:
  * :func:`decompose_projection` ~ rend_util.load_K_Rt_from_P (rend_util.py:25-46),
    implemented with a pure-NumPy RQ decomposition (no cv2 dependency in the
    core path).
  * :func:`get_camera_params` ~ rend_util.py:48-75 (uv + intrinsics + pose ->
    world ray dirs + camera center), pure jnp and jit-friendly; accepts a 4x4
    pose matrix or a 7-dim quaternion+translation vector (trainable cameras).
  * :func:`get_sphere_intersection` ~ rend_util.py:141-162, static-shape: the
    miss entries are zeros and a boolean mask is returned.

All batched: shapes (B, P, ...) with B images and P pixels.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# NumPy (host-side, load-time) camera decomposition
# ---------------------------------------------------------------------------

def decompose_projection(P: np.ndarray):
    """Decompose a 3x4 projection P = K [R | t] into intrinsics and c2w pose.

    Matches cv2.decomposeProjectionMatrix semantics as used by the reference
    (rend_util.py:25-46): returns (intrinsics 4x4, pose 4x4) where pose is the
    camera-to-world transform and K is normalized so K[2,2] == 1 with positive
    focal lengths.
    """
    P = np.asarray(P, dtype=np.float64)[:3, :4]
    M = P[:, :3]
    # RQ decomposition of M: M = K R with K upper-triangular.
    # Use QR of the reversed/transposed matrix.
    rev = np.eye(3)[::-1]
    Q, U = np.linalg.qr((rev @ M).T)
    K = rev @ U.T @ rev
    R = rev @ Q.T
    # Fix signs so diag(K) > 0 (S is its own inverse, so K S S R = K R = M).
    s = np.sign(np.diag(K))
    s[s == 0] = 1.0
    S = np.diag(s)
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:
        R = -R  # cv2 convention: rotation proper; K R = -M, scale washes out
    K = K / K[2, 2]
    # camera center: P c = 0 (homogeneous)
    _, _, Vt = np.linalg.svd(np.concatenate([P, [[0, 0, 0, 1]]], axis=0)[:3])
    c = Vt[-1]
    c = c[:3] / c[3]

    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K.astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T.astype(np.float32)  # cam-to-world rotation
    pose[:3, 3] = c.astype(np.float32)
    return intrinsics, pose


def load_K_Rt_from_P(P: np.ndarray):
    """Alias keeping the reference's name (rend_util.py:25)."""
    return decompose_projection(P)


# ---------------------------------------------------------------------------
# jnp quaternion utilities (trainable-camera path)
# ---------------------------------------------------------------------------

def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """(B,4) unit-normalized wxyz quaternion -> (B,3,3). rend_util.py:102-119."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (qj**2 + qk**2), 2 * (qj * qi - qk * qr), 2 * (qi * qk + qr * qj),
            2 * (qj * qi + qk * qr), 1 - 2 * (qi**2 + qk**2), 2 * (qj * qk - qi * qr),
            2 * (qk * qi - qj * qr), 2 * (qj * qk + qi * qr), 1 - 2 * (qi**2 + qj**2),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rot_to_quat(R: np.ndarray) -> np.ndarray:
    """(B,3,3) -> (B,4) wxyz. NumPy, load-time only (rend_util.py:121-139)."""
    R = np.asarray(R)
    q = np.ones(R.shape[:-2] + (4,), dtype=R.dtype)
    q[..., 0] = np.sqrt(np.maximum(1.0 + R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2], 1e-12)) / 2
    q[..., 1] = (R[..., 2, 1] - R[..., 1, 2]) / (4 * q[..., 0])
    q[..., 2] = (R[..., 0, 2] - R[..., 2, 0]) / (4 * q[..., 0])
    q[..., 3] = (R[..., 1, 0] - R[..., 0, 1]) / (4 * q[..., 0])
    return q


def pose7_to_matrix(pose7: jnp.ndarray) -> jnp.ndarray:
    """(B,7) quaternion+translation -> (B,4,4) cam-to-world matrix."""
    B = pose7.shape[0]
    R = quat_to_rot(pose7[:, :4])
    m = jnp.tile(jnp.eye(4, dtype=pose7.dtype)[None], (B, 1, 1))
    m = m.at[:, :3, :3].set(R)
    m = m.at[:, :3, 3].set(pose7[:, 4:])
    return m


# ---------------------------------------------------------------------------
# jnp ray generation
# ---------------------------------------------------------------------------

def lift(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords -> homogeneous camera-space points (rend_util.py:87-100)."""
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


def get_camera_params(uv: jnp.ndarray, pose: jnp.ndarray, intrinsics: jnp.ndarray):
    """uv (B,P,2), pose (B,4,4) or (B,7), intrinsics (B,4,4) ->
    (ray_dirs (B,P,3), cam_loc (B,3)).  rend_util.py:48-75."""
    if pose.ndim == 2 and pose.shape[-1] == 7:
        cam_loc = pose[:, 4:]
        p = pose7_to_matrix(pose)
    else:
        cam_loc = pose[:, :3, 3]
        p = pose

    B, P, _ = uv.shape
    depth = jnp.ones((B, P), dtype=uv.dtype)
    pixel_points_cam = lift(uv[:, :, 0], uv[:, :, 1], depth, intrinsics)  # (B,P,4)
    world_coords = jnp.einsum("bij,bpj->bpi", p, pixel_points_cam)[:, :, :3]
    ray_dirs = world_coords - cam_loc[:, None, :]
    ray_dirs = ray_dirs / jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True)
    return ray_dirs, cam_loc


def get_sphere_intersection(cam_loc: jnp.ndarray, ray_directions: jnp.ndarray, r: float = 1.0):
    """Closed-form ray/sphere(0, r) intersection (rend_util.py:141-162).

    Returns (sphere_intersections (B,P,2) clamped >= 0, mask_intersect (B,P)).
    Non-intersecting rays get zeros, like the reference.
    """
    ray_cam_dot = jnp.einsum("bpi,bi->bp", ray_directions, cam_loc)
    under_sqrt = ray_cam_dot**2 - (jnp.sum(cam_loc**2, axis=-1)[:, None] - r**2)
    mask_intersect = under_sqrt > 0
    sqrt_val = jnp.sqrt(jnp.maximum(under_sqrt, 0.0))
    near = -ray_cam_dot - sqrt_val
    far = -ray_cam_dot + sqrt_val
    si = jnp.stack([near, far], axis=-1)
    si = jnp.where(mask_intersect[..., None], si, 0.0)
    si = jnp.maximum(si, 0.0)
    return si, mask_intersect


def get_depth(points: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Depth of world points under pose (rend_util.py:164-181). points (B,P,3)."""
    if pose.ndim == 2 and pose.shape[-1] == 7:
        pose = pose7_to_matrix(pose)
    B, P, _ = points.shape
    points_hom = jnp.concatenate([points, jnp.ones((B, P, 1), dtype=points.dtype)], axis=-1)
    inv = jnp.linalg.inv(pose)
    points_cam = jnp.einsum("bij,bpj->bpi", inv, points_hom)
    return points_cam[:, :, 2:3]


def uv_grid(img_res) -> np.ndarray:
    """Full-image pixel grid, (H*W, 2) float32 with uv[:,0]=x (col), uv[:,1]=y.

    Matches scene_dataset.py:72-74 (np.mgrid flipped).
    """
    H, W = img_res
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    return np.stack([xx, yy], axis=-1).reshape(-1, 2)
