"""Utility decoder MLP + sphere pre-training.

Parity with the reference's Decoder / pre_train_sphere utility
(custom_embedder_decoder.py:169-204): a small MLP fitted to a sphere SDF by
MSE before the main optimization — useful to sanity-init SDF variants whose
geometric init is unavailable.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..ops.linear import apply_linear, torch_default_linear


class Decoder:
    def __init__(self, input_dims: int, internal_dims: Sequence[int],
                 output_dims: int, embed_fn: Optional[Callable] = None):
        self.embed_fn = embed_fn
        self.dims = [input_dims] + list(internal_dims) + [output_dims]

    def init(self, key):
        keys = jax.random.split(key, len(self.dims))
        return {"lin": [torch_default_linear(keys[i], self.dims[i], self.dims[i + 1])
                        for i in range(len(self.dims) - 1)]}

    def apply(self, params, p):
        if self.embed_fn is not None:
            p = self.embed_fn(p)
        h = p
        n = len(params["lin"])
        for i, lin in enumerate(params["lin"]):
            h = apply_linear(lin, h)
            h = jnp.tanh(h) if i == n - 1 else jax.nn.relu(h)
        return h


def pre_train_sphere(decoder: Decoder, params, key, iters: int = 1000,
                     radius: float = 0.3, lr: float = 1e-4):
    """Fit decoder[...,0] to the SDF of a radius-`radius` sphere
    (custom_embedder_decoder.py:190-204)."""
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        pts = jax.random.uniform(k, (1024, 3), minval=-0.5, maxval=0.5)
        ref = jnp.linalg.norm(pts, axis=-1) - radius

        def loss_fn(p):
            out = decoder.apply(p, pts)
            return jnp.mean((out[..., 0] - ref) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    loss = None
    for i in range(iters):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
    return params, float(loss)
