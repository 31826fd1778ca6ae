"""LPIPS (AlexNet variant) implemented natively in JAX.

Parity target: code/model/metrics.py:47-54 in the reference, which calls the
`lpips` pip package with `net='alex'`. That package is a thin forward:

    scale input -> AlexNet conv features (taps after relu1..relu5)
    -> channel-unit-normalize -> squared diff -> per-layer 1x1 non-negative
    linear head -> spatial mean -> sum over the 5 layers

This module reproduces that forward exactly (verified against a torch
re-implementation with shared weights in tests/test_lpips.py) and sources
weights from, in order:

1. Official checkpoints, when present: set ``HMNFFB_LPIPS_WEIGHTS`` to a
   directory containing ``alexnet.pth`` (torchvision AlexNet state dict) and
   ``lpips_alex.pth`` (the lpips package's linear-head state dict). This
   environment has no network egress and no cached torch weights, so these
   can only come from the user.
2. A deterministic seeded He-init fallback. Random AlexNet features with
   non-negative heads remain a useful multi-scale perceptual distance
   (cf. Zhang et al. 2018 §5 "random networks"; Amir & Weiss 2021), but the
   absolute values are NOT comparable to published LPIPS numbers — eval CSVs
   produced with the fallback are tagged via :func:`weights_source`.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# torchvision AlexNet `features` trunk: (out_ch, kernel, stride, pad); a tap
# is taken after each conv's ReLU. MaxPool(3,2) sits after taps 1 and 2.
_CONVS: List[Tuple[int, int, int, int]] = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # conv indices followed by MaxPool(kernel=3, stride=2)

# lpips.ScalingLayer constants (inputs in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def init_fallback_weights(seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministic He-init AlexNet convs + uniform non-negative heads."""
    rng = np.random.default_rng(seed)
    w: Dict[str, np.ndarray] = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_CONVS):
        fan_in = in_ch * k * k
        w[f"conv{i}_w"] = rng.normal(
            0.0, np.sqrt(2.0 / fan_in), (out_ch, in_ch, k, k)).astype(np.float32)
        w[f"conv{i}_b"] = np.zeros((out_ch,), dtype=np.float32)
        # uniform head == plain mean over channels of the normalized sq-diff
        w[f"lin{i}_w"] = np.full((out_ch,), 1.0 / out_ch, dtype=np.float32)
        in_ch = out_ch
    return w


def load_torch_lpips(weights_dir: str) -> Dict[str, np.ndarray]:
    """Import official weights: torchvision `alexnet.pth` + lpips
    `lpips_alex.pth` state dicts (CPU torch load, no network)."""
    import torch

    alex = torch.load(os.path.join(weights_dir, "alexnet.pth"),
                      map_location="cpu", weights_only=True)
    lin = torch.load(os.path.join(weights_dir, "lpips_alex.pth"),
                     map_location="cpu", weights_only=True)
    w: Dict[str, np.ndarray] = {}
    # torchvision features indices of the 5 convs: 0, 3, 6, 8, 10
    for i, fi in enumerate([0, 3, 6, 8, 10]):
        w[f"conv{i}_w"] = alex[f"features.{fi}.weight"].numpy()
        w[f"conv{i}_b"] = alex[f"features.{fi}.bias"].numpy()
    for i in range(5):
        # lpips keys: lin{i}.model.1.weight, shape (1, C, 1, 1)
        key = f"lin{i}.model.1.weight"
        if key not in lin:  # older checkpoints: lins.{i}....
            key = f"lins.{i}.model.1.weight"
        w[f"lin{i}_w"] = np.clip(lin[key].numpy().reshape(-1), 0.0, None)
    return w


_WEIGHTS_CACHE: Dict[str, object] = {}


def get_weights() -> Tuple[Dict[str, np.ndarray], str]:
    """(weights, source) where source is 'official' or 'fallback'."""
    if "w" not in _WEIGHTS_CACHE:
        wdir = os.environ.get("HMNFFB_LPIPS_WEIGHTS", "")
        if wdir and os.path.exists(os.path.join(wdir, "alexnet.pth")):
            _WEIGHTS_CACHE["w"] = load_torch_lpips(wdir)
            _WEIGHTS_CACHE["src"] = "official"
        else:
            _WEIGHTS_CACHE["w"] = init_fallback_weights()
            _WEIGHTS_CACHE["src"] = "fallback"
    return _WEIGHTS_CACHE["w"], _WEIGHTS_CACHE["src"]  # type: ignore


def weights_source() -> str:
    return get_weights()[1]


def _forward_taps(weights, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (N, 3, H, W) scaled input -> list of 5 post-ReLU feature maps."""
    taps = []
    for i, (_, k, stride, pad) in enumerate(_CONVS):
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(weights[f"conv{i}_w"]),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + jnp.asarray(weights[f"conv{i}_b"])[None, :, None, None]
        x = jax.nn.relu(x)
        taps.append(x)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                padding="VALID")
    return taps


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    return f / (norm + eps)


@partial(jax.jit, static_argnums=())
def _lpips_impl(weights, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    a = (a - shift) / scale
    b = (b - shift) / scale
    ta = _forward_taps(weights, a)
    tb = _forward_taps(weights, b)
    total = jnp.zeros((a.shape[0],), dtype=jnp.float32)
    for i, (fa, fb) in enumerate(zip(ta, tb)):
        d = (_unit_normalize(fa) - _unit_normalize(fb)) ** 2
        head = jnp.asarray(weights[f"lin{i}_w"])[None, :, None, None]
        total = total + jnp.mean(jnp.sum(d * head, axis=1), axis=(1, 2))
    return total


def lpips(img: np.ndarray, gt: np.ndarray) -> float:
    """LPIPS distance between two (H, W, 3) images in [-1, 1]."""
    weights, _ = get_weights()
    if img.shape[0] < 16 or img.shape[1] < 16:
        raise ValueError(f"image too small for AlexNet LPIPS: {img.shape}")
    a = np.transpose(img.astype(np.float32), (2, 0, 1))[None]
    b = np.transpose(gt.astype(np.float32), (2, 0, 1))[None]

    def run(device=None):
        import contextlib

        ctx = (jax.default_device(device) if device is not None
               else contextlib.nullcontext())
        with ctx:
            jw = {k: jnp.asarray(v) for k, v in weights.items()}
            return float(_lpips_impl(jw, jnp.asarray(a), jnp.asarray(b))[0])

    if _LPIPS_STATE.get("force_cpu"):
        return run(jax.local_devices(backend="cpu")[0])
    try:
        return run()
    except ValueError:
        raise
    except Exception:
        # accelerator-side compile/runtime failure (e.g. transient remote
        # compiler errors): fall back to the CPU backend and stay there
        _LPIPS_STATE["force_cpu"] = True
        return run(jax.local_devices(backend="cpu")[0])


_LPIPS_STATE: Dict[str, bool] = {}
