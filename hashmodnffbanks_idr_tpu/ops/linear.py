"""Linear-layer primitives: weight-norm, torch-compatible init schemes.

Everything is a plain param pytree (dicts of jnp arrays) + pure apply
functions, so pjit/sharding and custom init (geometric/SIREN) stay explicit.

Weight norm reproduces torch.nn.utils.weight_norm(dim=0) as used on every
linear of the reference SDF/rendering nets
(implicit_differentiable_renderer.py:80-81,194-195): W = g * v / ||v||, with
the norm taken per *output* unit.  Kernels here are stored [in, out] (JAX
convention), so the norm is over axis 0.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def torch_default_linear(key, d_in: int, d_out: int):
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) => U(±1/sqrt(in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    w = jax.random.uniform(kw, (d_in, d_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def normal_linear(key, d_in: int, d_out: int, mean: float, std: float, bias: float):
    w = mean + std * jax.random.normal(key, (d_in, d_out))
    return {"w": w, "b": jnp.full((d_out,), bias, dtype=jnp.float32)}


def uniform_linear(key, d_in: int, d_out: int, bound: float, bias_bound=None):
    kw, kb = jax.random.split(key)
    if bias_bound is None:
        bias_bound = bound
    w = jax.random.uniform(kw, (d_in, d_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (d_out,), minval=-bias_bound, maxval=bias_bound)
    return {"w": w, "b": b}


def weight_normalize(params):
    """Convert {'w','b'} -> weight-norm parameterization {'v','g','b'}.

    g is initialized to ||v|| so the initial effective weight is unchanged,
    matching torch.nn.utils.weight_norm.
    """
    w = params["w"]
    g = jnp.linalg.norm(w, axis=0)
    return {"v": w, "g": g, "b": params["b"]}


def apply_linear(params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """y = x W + b.  With compute_dtype (e.g. bf16) the matmul runs in that
    dtype on the MXU with f32 accumulation (preferred_element_type) and the
    result is returned in f32 — the mixed-precision fast path used by the
    no-grad sphere tracer."""
    if "v" in params:
        v = params["v"]
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        w = v * (params["g"][None, :] / jnp.maximum(norm, 1e-12))
    else:
        w = params["w"]
    if compute_dtype is not None:
        y = jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        return y + params["b"].astype(jnp.float32)
    return x @ w.astype(x.dtype) + params["b"].astype(x.dtype)


def softplus(x: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """torch Softplus(beta): (1/beta) log(1+exp(beta x)), with the linear
    region for beta*x > threshold(=20) exactly like torch."""
    bx = beta * x
    return jnp.where(bx > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(bx, 20.0))) / beta)
