"""IDR loss: masked L1 RGB + eikonal + mask BCE (code/model/loss.py:5-71).

Static-shape version: the reference's boolean-gather reductions become masked
sums with the same denominators (``float(object_mask.shape[0])``), so values
match exactly.  ``alpha`` is a runtime scalar (annealed x2 at the milestones,
idr_train.py:227-228) — passing it as an argument avoids re-jitting.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


class IDRLossConfig(NamedTuple):
    eikonal_weight: float = 0.1
    mask_weight: float = 100.0
    alpha: float = 50.0   # initial value; annealed copy is passed at call time
    # grid total-variation weight (torch-ngp grad_total_variation slot,
    # gridencoder_torchngp/grid.py:173-196); 0 disables.  Applied by the
    # trainer at the traced surface points (trainer.build_train_step).
    tv_weight: float = 0.0


def rgb_loss(rgb_values, rgb_gt, mask, n_pixels):
    """L1 over (network_object_mask & object_mask) / total pixels (loss.py:13-21)."""
    diff = jnp.abs(rgb_values - rgb_gt)
    per_ray = jnp.sum(diff, axis=-1)
    return jnp.sum(jnp.where(mask, per_ray, 0.0)) / n_pixels


def rgb_mape_loss(rgb_values, rgb_gt, mask, n_pixels, eps: float = 1e-8):
    """Mean-absolute-percentage-error RGB variant (loss.py:22-32; unused by
    the reference's total but kept for parity/experiments)."""
    ape = jnp.abs((rgb_values - rgb_gt) / jnp.where(jnp.abs(rgb_gt) < eps, eps, rgb_gt))
    per_ray = jnp.sum(ape, axis=-1)
    return jnp.sum(jnp.where(mask, per_ray, 0.0)) / n_pixels


def eikonal_loss(grad_theta):
    """mean((||grad|| - 1)^2) over all eikonal samples (loss.py:35-40)."""
    norms = jnp.linalg.norm(grad_theta, axis=-1)
    return jnp.mean((norms - 1.0) ** 2)


def mask_loss(sdf_output, network_object_mask, object_mask, alpha, n_pixels):
    """(1/alpha) * BCEWithLogits(-alpha*sdf, gt) summed over ~(net&obj) / P
    (loss.py:42-49)."""
    mask = ~(network_object_mask & object_mask)
    logits = -alpha * sdf_output[:, 0]
    gt = object_mask.astype(logits.dtype)
    # numerically stable BCE-with-logits: max(x,0) - x*y + log(1+exp(-|x|))
    bce = jnp.maximum(logits, 0.0) - logits * gt + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return (1.0 / alpha) * jnp.sum(jnp.where(mask, bce, 0.0)) / n_pixels


def idr_loss(
    cfg: IDRLossConfig,
    model_outputs: Dict[str, jnp.ndarray],
    rgb_gt: jnp.ndarray,
    alpha: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    network_object_mask = model_outputs["network_object_mask"]
    object_mask = model_outputs["object_mask"]
    n_pixels = jnp.asarray(object_mask.shape[0], dtype=jnp.float32)

    rgb_gt = rgb_gt.reshape(-1, 3)
    l_rgb = rgb_loss(model_outputs["rgb_values"], rgb_gt,
                     network_object_mask & object_mask, n_pixels)
    l_mask = mask_loss(model_outputs["sdf_output"], network_object_mask,
                       object_mask, alpha, n_pixels)
    l_eik = eikonal_loss(model_outputs["grad_theta"])
    total = l_rgb + cfg.eikonal_weight * l_eik + cfg.mask_weight * l_mask
    return {
        "loss": total,
        "rgb_loss": l_rgb,
        "eikonal_loss": l_eik,
        "mask_loss": l_mask,
    }
