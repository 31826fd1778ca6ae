"""Native LPIPS: forward-math golden vs a torch re-implementation.

The lpips pip package (what the reference's metrics.py:47-54 calls) is not
installable here, so the golden re-implements its exact forward in torch
in-test — ScalingLayer -> AlexNet `features` taps after each ReLU ->
channel unit-normalization -> squared diff -> non-negative 1x1 heads ->
spatial mean -> sum — with the SAME weights as our JAX module, and requires
allclose. That pins conv strides/padding, pool placement, normalization eps,
and head contraction; official checkpoints then differ only in the numbers
loaded (covered by load_torch_lpips's key mapping).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from hashmodnffbanks_idr_tpu.models.lpips import (  # noqa: E402
    _CONVS, _POOL_AFTER, _SCALE, _SHIFT, init_fallback_weights, lpips,
    weights_source)


def torch_lpips_forward(weights, a_np, b_np):
    """lpips-package-faithful forward (lpips/lpips.py upstream semantics)."""
    import torch.nn.functional as F

    def taps(x):
        out = []
        for i, (_, k, stride, pad) in enumerate(_CONVS):
            w = torch.from_numpy(weights[f"conv{i}_w"])
            b = torch.from_numpy(weights[f"conv{i}_b"])
            x = F.relu(F.conv2d(x, w, b, stride=stride, padding=pad))
            out.append(x)
            if i in _POOL_AFTER:
                x = F.max_pool2d(x, kernel_size=3, stride=2)
        return out

    def unit_norm(f, eps=1e-10):
        n = torch.sqrt(torch.sum(f * f, dim=1, keepdim=True))
        return f / (n + eps)

    shift = torch.from_numpy(_SHIFT).view(1, 3, 1, 1)
    scale = torch.from_numpy(_SCALE).view(1, 3, 1, 1)
    a = (torch.from_numpy(a_np) - shift) / scale
    b = (torch.from_numpy(b_np) - shift) / scale
    with torch.no_grad():
        total = torch.zeros(a.shape[0])
        for i, (fa, fb) in enumerate(zip(taps(a), taps(b))):
            d = (unit_norm(fa) - unit_norm(fb)) ** 2
            head = torch.from_numpy(weights[f"lin{i}_w"]).view(1, -1, 1, 1)
            total = total + torch.mean(torch.sum(d * head, dim=1), dim=(1, 2))
    return float(total[0])


def _rand_img(rng, h=64, w=80):
    return (rng.random((h, w, 3)).astype(np.float32) * 2.0 - 1.0)


def test_lpips_matches_torch_reference_forward():
    rng = np.random.default_rng(3)
    weights = init_fallback_weights()
    img = _rand_img(rng)
    gt = np.clip(img + 0.3 * rng.standard_normal(img.shape).astype(np.float32),
                 -1, 1)
    ours = lpips(img, gt)
    theirs = torch_lpips_forward(
        weights,
        np.transpose(img, (2, 0, 1))[None],
        np.transpose(gt, (2, 0, 1))[None],
    )
    assert weights_source() == "fallback"
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_lpips_is_a_distance():
    rng = np.random.default_rng(0)
    img = _rand_img(rng)
    assert lpips(img, img.copy()) == pytest.approx(0.0, abs=1e-6)
    small = np.clip(img + 0.05 * rng.standard_normal(img.shape).astype(np.float32), -1, 1)
    large = np.clip(img + 0.5 * rng.standard_normal(img.shape).astype(np.float32), -1, 1)
    d_small, d_large = lpips(img, small), lpips(img, large)
    assert 0.0 < d_small < d_large
    # symmetric (squared-diff forward is exactly symmetric)
    np.testing.assert_allclose(lpips(small, img), d_small, rtol=1e-5)


def test_lpips_deterministic_and_nonsquare():
    rng = np.random.default_rng(1)
    img, gt = _rand_img(rng, 48, 100), _rand_img(rng, 48, 100)
    assert lpips(img, gt) == lpips(img, gt)


def test_metrics_entry_point_finite():
    from hashmodnffbanks_idr_tpu.models.metrics import lpips_or_none

    rng = np.random.default_rng(2)
    v = lpips_or_none(_rand_img(rng), _rand_img(rng))
    assert v is not None and np.isfinite(v)
