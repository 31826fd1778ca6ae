"""Style-transfer helper functions + AdaIN-based style modulation.

Parity with code/model/embeddings/style_Attention/style_function.py:1-92
(AdaIN, CORAL transfer, Gram/style loss) and the StyleModulation module
(styleMod.py:52-81, defined in the reference but not wired into NFFB —
provided here for the same completeness).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mean_std(feat: jnp.ndarray, eps: float = 1e-5):
    """Per-(batch, channel) spatial statistics over all trailing dims.

    Matches the reference's calc_mean_std (style_function.py:5-13): torch
    ``.var`` default is the *unbiased* estimator.
    """
    flat = feat.reshape(feat.shape[0], feat.shape[1], -1)
    n = flat.shape[-1]
    mean = jnp.mean(flat, axis=-1)
    var = jnp.sum((flat - mean[..., None]) ** 2, axis=-1) / jnp.maximum(n - 1, 1)
    shape = feat.shape[:2] + (1,) * (feat.ndim - 2)
    return mean.reshape(shape), jnp.sqrt(var + eps).reshape(shape)


def adaptive_instance_normalization(content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """AdaIN (style_function.py:16-24): normalize content stats, re-scale with
    style stats.  content/style: (N, C, *spatial)."""
    c_mean, c_std = _mean_std(content)
    s_mean, s_std = _mean_std(style)
    return (content - c_mean) / c_std * s_std + s_mean


def coral(source: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """CORAL color/feature transfer (style_function.py:42-68): whiten source
    feature covariance, re-color with target covariance.  (C, N) layout."""

    def center(x):
        mean = jnp.mean(x, axis=1, keepdims=True)
        return x - mean, mean

    src_c, src_mean = center(source)
    tgt_c, tgt_mean = center(target)
    cov_s = src_c @ src_c.T / src_c.shape[1] + eps * jnp.eye(source.shape[0])
    cov_t = tgt_c @ tgt_c.T / tgt_c.shape[1] + eps * jnp.eye(target.shape[0])

    def sqrt_inv(m):
        vals, vecs = jnp.linalg.eigh(m)
        vals = jnp.maximum(vals, eps)
        return vecs @ jnp.diag(vals**-0.5) @ vecs.T, vecs @ jnp.diag(vals**0.5) @ vecs.T

    w_s, _ = sqrt_inv(cov_s)
    _, c_t = sqrt_inv(cov_t)
    return c_t @ (w_s @ src_c) + tgt_mean


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """(C, L) -> (C, C) normalized Gram matrix (style_function.py:71-78)."""
    g = feat @ feat.T
    return g / feat.shape[-1]


def style_loss(feat: jnp.ndarray, target_feat: jnp.ndarray) -> jnp.ndarray:
    """Gram-matrix style loss (style_function.py:81-92)."""
    return jnp.mean((gram_matrix(feat) - gram_matrix(target_feat)) ** 2)


class StyleModulation:
    """AdaIN-variant modulation (styleMod.py:52-81) — parameterized like
    StyleAttention but applies AdaIN of content stats onto style features
    before the attention-weighted projection."""

    def __init__(self, multires_levels: int = 3, feature_vector_size: int = 28):
        self.L = multires_levels
        self.fvs = feature_vector_size

    def init(self, key):
        from .linear import torch_default_linear

        k1, k2 = jax.random.split(key)
        return {
            "linear_transform": torch_default_linear(k1, self.fvs, self.fvs),
            "attention": torch_default_linear(k2, self.fvs, 1),
        }

    def apply(self, params, content, style):
        from .linear import apply_linear

        content_features = content.reshape(-1, 3, content.shape[1])
        style_features = style.reshape(style.shape[1], self.L, self.fvs)
        style_features = adaptive_instance_normalization(content_features, style_features)
        style_features = style_features.squeeze()
        modulated = apply_linear(params["linear_transform"], style_features)
        attn = jax.lax.stop_gradient(apply_linear(params["attention"], content_features))
        attn = jax.nn.softmax(attn, axis=1)
        weighted = attn * modulated
        norm = weighted / jnp.maximum(
            jnp.linalg.norm(weighted, axis=1, keepdims=True), 1e-12)
        return jnp.squeeze(norm, axis=0) if norm.shape[0] == 1 else norm
