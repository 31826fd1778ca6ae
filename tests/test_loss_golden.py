"""Loss parity vs the reference IDRLoss (torch CPU, non-empty-mask paths)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference checkout")
torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)

import jax.numpy as jnp

from hashmodnffbanks_idr_tpu.models.loss import (IDRLossConfig, eikonal_loss,
                                                 idr_loss, mask_loss, rgb_loss)


def _patch_cuda(monkeypatch):
    """The reference loss calls .cuda() on some tensors; route to CPU."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)


def test_idr_loss_matches(monkeypatch):
    _patch_cuda(monkeypatch)
    from model.loss import IDRLoss

    rng = np.random.default_rng(0)
    R = 64
    rgb_values = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
    rgb_gt = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
    sdf_output = rng.normal(size=(R, 1)).astype(np.float32) * 0.2
    net_mask = rng.random(R) > 0.4
    obj_mask = rng.random(R) > 0.3
    grad_theta = rng.normal(size=(R + R // 2, 3)).astype(np.float32)

    ref = IDRLoss(eikonal_weight=0.1, mask_weight=100.0, alpha=50.0)
    ref_out = ref(
        {
            "rgb_values": torch.from_numpy(rgb_values),
            "network_object_mask": torch.from_numpy(net_mask),
            "object_mask": torch.from_numpy(obj_mask),
            "sdf_output": torch.from_numpy(sdf_output),
            "grad_theta": torch.from_numpy(grad_theta),
        },
        {"rgb": torch.from_numpy(rgb_gt[None])},
    )

    cfg = IDRLossConfig(eikonal_weight=0.1, mask_weight=100.0, alpha=50.0)
    got = idr_loss(
        cfg,
        {
            "rgb_values": jnp.asarray(rgb_values),
            "network_object_mask": jnp.asarray(net_mask),
            "object_mask": jnp.asarray(obj_mask),
            "sdf_output": jnp.asarray(sdf_output),
            "grad_theta": jnp.asarray(grad_theta),
        },
        jnp.asarray(rgb_gt),
        jnp.asarray(50.0),
    )
    for k in ("loss", "rgb_loss", "eikonal_loss", "mask_loss"):
        np.testing.assert_allclose(float(got[k]), float(ref_out[k]), rtol=1e-4,
                                   atol=1e-6, err_msg=k)
