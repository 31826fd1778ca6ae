"""Pallas fused SDF-MLP inference kernel — the FullyFusedMLP equivalent.

The reference leans on tiny-cuda-nn's FullyFusedMLP for its fastest encoder
path (SURVEY.md §2.2 item 3).  This kernel is the TPU counterpart for the
gradient-stopped sphere-tracer SDF evaluations: the whole 9-layer 512-wide
softplus chain runs inside one Pallas program with every weight matrix
resident in VMEM (~4 MB bf16), so activations never round-trip to HBM between
layers.  bf16 MXU matmuls with f32 accumulation; softplus(beta=100) in f32.

Only the SDF channel is produced (the tracer needs nothing else), so the last
layer is sliced to its first output column before padding.

Architecture contract (ImplicitNetwork with dims 8x512, skip_in=(4,)):
  l0: d_in->512, l1..l2: 512->512, l3: 512->(512-d_in),
  concat(input)/sqrt(2) at l4, l4..l7: 512->512, l8: 512->1(+features).
The skip concat is engineered by the reference so 453+59=512; the kernel
reproduces it by writing the scaled input into the tail lanes of the l3
activation.  Falls back to the jnp path for any other architecture.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def effective_weight(p) -> jnp.ndarray:
    if "v" in p:
        v = p["v"]
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        return v * (p["g"][None, :] / jnp.maximum(norm, 1e-12))
    return p["w"]


def supports_fusion(dims: List[int], skip_in: Tuple[int, ...]) -> bool:
    """The standard IDR architecture: uniform 512 hidden, single skip at 4."""
    if len(dims) != 10 or tuple(skip_in) != (4,):
        return False
    h = dims[1]
    if any(d != h for d in dims[1:-1]):
        return False
    return dims[0] < h and h % 128 == 0


def pack_params(params_lin: List[dict], d_in: int, hidden: int,
                dtype=jnp.bfloat16) -> dict:
    """Build padded weight stacks for the kernel (bf16 fast path by default;
    ``dtype=jnp.float32`` builds the exact-precision variant used by the
    'exact' tracer mode — same kernel, f32 MXU passes, VMEM-resident
    weights ~8 MB instead of ~4 MB).

    Returns dict with:
      w_in  (d_in_pad, hidden), b_in (hidden)
      w_mid (7, hidden, hidden), b_mid (7, hidden)   # l1..l7 (l3 padded)
      w_out (hidden, 128), b_out (128)               # sdf column only
    """
    d_in_pad = _round_up(d_in, 128)
    w_in = jnp.zeros((d_in_pad, hidden), dtype=jnp.float32)
    w_in = w_in.at[:d_in].set(effective_weight(params_lin[0]))
    b_in = params_lin[0]["b"]

    mids_w, mids_b = [], []
    for l in range(1, 8):
        w = effective_weight(params_lin[l])
        b = params_lin[l]["b"]
        if w.shape[1] != hidden:  # l3: 512 -> hidden-d_in; pad tail cols
            wp = jnp.zeros((hidden, hidden), dtype=jnp.float32)
            wp = wp.at[:, : w.shape[1]].set(w)
            bp = jnp.zeros((hidden,), dtype=jnp.float32).at[: b.shape[0]].set(b)
            w, b = wp, bp
        mids_w.append(w)
        mids_b.append(b)

    w_last = effective_weight(params_lin[8])
    w_out = jnp.zeros((hidden, 128), dtype=jnp.float32)
    w_out = w_out.at[:, 0].set(w_last[:, 0])
    b_out = jnp.zeros((128,), dtype=jnp.float32).at[0].set(params_lin[8]["b"][0])

    return {
        "w_in": w_in.astype(dtype), "b_in": b_in.astype(jnp.float32),
        "w_mid": jnp.stack(mids_w).astype(dtype),
        "b_mid": jnp.stack(mids_b).astype(jnp.float32),
        "w_out": w_out.astype(dtype), "b_out": b_out.astype(jnp.float32),
    }


def _softplus100(x):
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(bx, 20.0))) / 100.0)


def _kernel(x_ref, w_in_ref, b_in_ref, w_mid_ref, b_mid_ref, w_out_ref,
            b_out_ref, skip_perm_ref, out_ref, *, d_in: int, skip_cols: int,
            n_mid: int):
    x = x_ref[:]  # (TILE, d_in_pad) f32; cols >= d_in are zero
    wd = w_in_ref.dtype  # bf16 fast path or f32 exact path
    h = jnp.dot(x.astype(wd), w_in_ref[:],
                preferred_element_type=jnp.float32) + b_in_ref[:]
    h = _softplus100(h)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for l in range(n_mid):  # l1..l7
        h = jnp.dot(h.astype(wd), w_mid_ref[l],
                    preferred_element_type=jnp.float32) + b_mid_ref[l]
        h = _softplus100(h)
        if l == 2:  # after l3: concat(input)/sqrt(2) into the tail lanes
            tile = h.shape[0]
            hidden = h.shape[1]
            col = jax.lax.broadcasted_iota(jnp.int32, (tile, hidden), 1)
            # constant permutation matmul places x into lanes
            # [skip_cols, skip_cols + d_in)
            shifted = jnp.dot(x.astype(wd), skip_perm_ref[:],
                              preferred_element_type=jnp.float32)
            h = jnp.where(col >= skip_cols, shifted * inv_sqrt2, h * inv_sqrt2)
    sdf = jnp.dot(h.astype(wd), w_out_ref[:],
                  preferred_element_type=jnp.float32) + b_out_ref[:]
    out_ref[:] = sdf


def fused_sdf_raw(x_embedded: jnp.ndarray, packed: dict, d_in: int,
                  hidden: int = 512, tile: int = 1024,
                  interpret: bool = False) -> jnp.ndarray:
    """x_embedded (N, d_in) -> raw SDF channel (N,) before the Laplace clamp.

    N is padded to a tile multiple internally.
    """
    N = x_embedded.shape[0]
    wd = packed["w_in"].dtype
    if wd == jnp.float32 and tile > 512:
        tile = 512  # f32 weights ~8 MB resident; keep tiles inside ~16 MB VMEM
    d_in_pad = packed["w_in"].shape[0]
    n_pad = _round_up(max(N, tile), tile)
    x = jnp.zeros((n_pad, d_in_pad), dtype=jnp.float32)
    x = x.at[:N, :d_in].set(x_embedded)

    n_mid = packed["w_mid"].shape[0]
    skip_cols = hidden - d_in
    perm = np.zeros((d_in_pad, hidden), dtype=np.float32)
    perm[np.arange(d_in), skip_cols + np.arange(d_in)] = 1.0
    skip_perm = jnp.asarray(perm, dtype=wd)

    kernel = partial(_kernel, d_in=d_in, skip_cols=skip_cols, n_mid=n_mid)
    grid = (n_pad // tile,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((tile, d_in_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in_pad, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mid, hidden, hidden), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mid, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in_pad, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * hidden * (d_in_pad + n_mid * hidden + 128),
            bytes_accessed=(n_pad * (d_in_pad + 128) * 4
                            + (n_mid + 1) * hidden * hidden * wd.itemsize),
            transcendentals=n_pad * hidden * (n_mid + 1),
        ),
    )(x, packed["w_in"], packed["b_in"], packed["w_mid"], packed["b_mid"],
      packed["w_out"], packed["b_out"], skip_perm)
    return out[:N, 0]
