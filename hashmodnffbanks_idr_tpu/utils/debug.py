"""Numerical-safety debugging — the sanitizer slot.

The reference unconditionally sets CUDA_LAUNCH_BLOCKING=1 and
TORCH_USE_CUDA_DSA=1 (exp_runner.py:28-30) as its debugging story; races in
its CUDA backward are handled by atomicAdd.  This framework is deterministic
by construction (no atomics — XLA scatter / one-hot matmul), so the
remaining failure mode is numerical: NaN/Inf escaping a masked lane.

Tools here:
  * :func:`nan_guard` — wrap any jitted function; with HMNFFB_DEBUG_NANS=1
    (or debug=True) it checkifies the function and raises with the first
    failing check's location.
  * :func:`assert_finite` — jax.debug-based in-graph assertion usable inside
    model code under jit.
  * enabling `jax_debug_nans` globally: :func:`enable_debug_nans`.
"""

from __future__ import annotations

import os
from functools import wraps

import jax
import jax.numpy as jnp


def enable_debug_nans(on: bool = True):
    jax.config.update("jax_debug_nans", on)


def assert_finite(x: jnp.ndarray, name: str = "tensor"):
    """In-graph finite check (no-op unless HMNFFB_DEBUG_NANS=1)."""
    if os.environ.get("HMNFFB_DEBUG_NANS") != "1":
        return x
    from jax.experimental import checkify

    checkify.check(jnp.isfinite(x).all(), f"non-finite values in {name}")
    return x


def nan_guard(fn, debug: bool | None = None):
    """Wrap `fn` with checkify error plumbing when debugging is enabled.

    Returns a function with the same signature; on a failed check it raises
    `checkify.JaxRuntimeError` naming the failing site.
    """
    if debug is None:
        debug = os.environ.get("HMNFFB_DEBUG_NANS") == "1"
    if not debug:
        return fn

    from jax.experimental import checkify

    checked = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.user_checks)

    @wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
