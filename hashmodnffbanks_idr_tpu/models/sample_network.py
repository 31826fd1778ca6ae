"""Differentiable ray-surface intersection (IDR eq. 3).

Re-design of code/model/sample_network.py:4-20: the intersection point found
by the (non-differentiable) tracer is re-expressed as a differentiable
function of the implicit geometry and camera parameters via implicit
differentiation:

    t(theta) = t0 - (sdf(x0; theta) - sdf0) / (grad0 . v)
    x(theta, c, v) = c + t(theta) v

``grad0`` and ``sdf0`` are gradient-stopped residuals from the trace;
``surface_output`` carries the live dependence on theta (and on the camera
through x0 when cameras are trainable).  Masked rays get a safe denominator so
no NaNs leak through `where` into the backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_network(
    surface_output: jnp.ndarray,      # (R, 1) sdf at points, with grad
    surface_sdf_values: jnp.ndarray,  # (R, 1) detached sdf values
    surface_points_grad: jnp.ndarray,  # (R, 3) detached spatial gradients
    surface_dists: jnp.ndarray,       # (R, 1) trace distances (no grad)
    surface_cam_loc: jnp.ndarray,     # (R, 3) camera centers (grad if trainable)
    surface_ray_dirs: jnp.ndarray,    # (R, 3) ray dirs (grad if trainable)
    valid_mask: jnp.ndarray = None,   # (R,) bool; invalid rows get safe math
) -> jnp.ndarray:
    dirs0 = jax.lax.stop_gradient(surface_ray_dirs)
    dot = jnp.sum(surface_points_grad * dirs0, axis=-1, keepdims=True)
    if valid_mask is not None:
        dot = jnp.where(valid_mask[:, None], dot, 1.0)
    else:
        dot = jnp.where(jnp.abs(dot) < 1e-12, 1.0, dot)
    dists_theta = surface_dists - (surface_output - surface_sdf_values) / dot
    return surface_cam_loc + dists_theta * surface_ray_dirs
