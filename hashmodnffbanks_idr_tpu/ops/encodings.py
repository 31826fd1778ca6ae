"""Frequency-space input encodings (pure jnp, trivially fused by XLA).

TPU-native equivalents of the reference's code/model/embeddings/frequency_enc.py:
  * :func:`positional_encoding` ~ PositionalEncoding (frequency_enc.py:6-51),
    including the reference's include-input quirk: the identity map is a member
    of the embed-fn list AND the input is concatenated again by ``embed()``
    (frequency_enc.py:24-25,45-47), so the output is [x, x, sin(f0 x), cos(f0 x),
    ...].  The *declared* dim is computed against the construction-time
    ``input_dims`` (see :func:`posenc_declared_dim`), which NFFB exploits
    (nffb3d.py:67-69) — both are reproduced here.
  * :func:`fourier_features` ~ FourierFeature (frequency_enc.py:54-67): random
    Gaussian projection, output [x?, sin(2πxB), cos(2πxB)].
  * :func:`spherical_harmonics` ~ SHEncoder (frequency_enc.py:70-152): real SH
    up to degree 5 for view directions.

These run on the VPU and fuse into the adjacent matmuls; no Pallas needed.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# NeRF positional encoding
# ---------------------------------------------------------------------------

def freq_bands(num_freqs: int, max_freq_log2: float, log_sampling: bool = True) -> np.ndarray:
    if log_sampling:
        return 2.0 ** np.linspace(0.0, max_freq_log2, num_freqs)
    return np.linspace(2.0**0.0, 2.0**max_freq_log2, num_freqs)


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    max_freq_log2: float,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """[..., d] -> [..., d*(2*num_freqs) + (2*d if include_input else 0)]."""
    bands = jnp.asarray(freq_bands(num_freqs, max_freq_log2, log_sampling), dtype=x.dtype)
    # (..., d, F)
    xf = x[..., :, None] * bands
    # interleave per-frequency [sin, cos] blocks: for each freq, sin then cos,
    # matching the reference's per-freq periodic_fns loop order.
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    per_freq = jnp.stack([sin, cos], axis=-1)  # (..., d, F, 2)
    # reference concat order: for freq in bands: sin(x*f) [d], cos(x*f) [d]
    per_freq = jnp.moveaxis(per_freq, -3, -2)  # (..., F, d, 2)
    per_freq = jnp.swapaxes(per_freq, -1, -2)  # (..., F, 2, d)
    flat = per_freq.reshape(x.shape[:-1] + (num_freqs * 2 * x.shape[-1],))
    if include_input:
        return jnp.concatenate([x, x, flat], axis=-1)
    return flat


def posenc_declared_dim(input_dims: int, num_freqs: int, include_input: bool) -> int:
    """The reference's *declared* embeddings_dim (frequency_enc.py:13-16,25).

    ``out_dim = d*(1 + 2*num_freqs)``; ``embeddings_dim = out_dim + d`` when
    include_input.  This can differ from the actual output width when the
    runtime input dim differs from ``input_dims`` — callers that reproduce
    reference layer shapes need this number, not the actual one.
    """
    out_dim = input_dims * (1 + 2 * num_freqs)
    return out_dim + input_dims if include_input else out_dim


def posenc_actual_dim(input_dims: int, num_freqs: int, include_input: bool) -> int:
    return input_dims * 2 * num_freqs + (2 * input_dims if include_input else 0)


def get_embedder_dims(multires: int) -> int:
    """Reference get_embedder() returns out_dim (frequency_enc.py:156-168)."""
    return 3 * (1 + 2 * multires)


def nerf_embed(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """The classic-IDR view-dir embedding path (frequency_enc.py:156-168):
    PositionalEncoding(include_input=True, max_freq_log2=multires-1,
    num_freqs=multires).embed(x)."""
    return positional_encoding(x, num_freqs=multires, max_freq_log2=multires - 1, include_input=True)


# ---------------------------------------------------------------------------
# Random Fourier features
# ---------------------------------------------------------------------------

def fourier_features_init(key, input_dims: int, num_channels: int, sigma: float) -> jnp.ndarray:
    """Gaussian projection buffer B (frequency_enc.py:59)."""
    import jax

    return jax.random.normal(key, (input_dims, int(num_channels)), dtype=jnp.float32) * sigma


def fourier_features(x: jnp.ndarray, B: jnp.ndarray, include_input: bool = True) -> jnp.ndarray:
    xp = (2.0 * np.pi) * (x @ B.astype(x.dtype))
    out = jnp.concatenate([jnp.sin(xp), jnp.cos(xp)], axis=-1)
    if include_input:
        return jnp.concatenate([x, out], axis=-1)
    return out


def fourier_features_dim(input_dims: int, num_channels: int, include_input: bool) -> int:
    """Reference declares 2C+3 regardless of input_dims (frequency_enc.py:60)."""
    return 2 * int(num_channels) + 3 if include_input else 2 * int(num_channels)


# ---------------------------------------------------------------------------
# Real spherical harmonics (degree <= 5)
# ---------------------------------------------------------------------------

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396]
_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435]
_C4 = [2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761]


def spherical_harmonics(d: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """[..., 3] unit dirs -> [..., degree**2] real SH basis values."""
    assert 1 <= degree <= 5
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    comps = [jnp.full_like(x, _C0)]
    if degree > 1:
        comps += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        comps += [
            _C2[0] * xy, _C2[1] * yz, _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz, _C2[4] * (xx - yy),
        ]
    if degree > 3:
        comps += [
            _C3[0] * y * (3 * xx - yy), _C3[1] * xy * z,
            _C3[2] * y * (4 * zz - xx - yy),
            _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            _C3[4] * x * (4 * zz - xx - yy), _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3 * yy),
        ]
    if degree > 4:
        comps += [
            _C4[0] * xy * (xx - yy), _C4[1] * yz * (3 * xx - yy),
            _C4[2] * xy * (7 * zz - 1), _C4[3] * yz * (7 * zz - 3),
            _C4[4] * (zz * (35 * zz - 30) + 3), _C4[5] * xz * (7 * zz - 3),
            _C4[6] * (xx - yy) * (7 * zz - 1), _C4[7] * xz * (xx - 3 * yy),
            _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(comps, axis=-1)
