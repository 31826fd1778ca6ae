"""Multi-resolution hash-grid encoding — the framework's flagship op.

One packed-table design serving all three reference encoder backends:

  * ``variant='ngp'`` — canonical instant-ngp semantics, matching the
    reference's CUDA kernels (hash_encoder/src/hashencoder.cu:125-200:
    ``scale = 2^(l·S)·H − 1``, ``pos = x·scale + 0.5``, dense stride indexing
    when the level grid fits, XOR-prime ``fast_hash`` otherwise
    (hashencoder.cu:68-103), per-level offset table rounded to 8
    (hashgridencoder.py:100-110)).  This is also the semantics of
    tiny-cuda-nn's grid encoding, so it backs the reference's *Tcnn* encoder
    family.  gridtype 'tiled', ``align_corners`` and 'smoothstep'
    interpolation fold in the extra options of the second CUDA copy
    (gridencoder_torchngp/src/gridencoder.cu:40-46,78-83).
  * ``variant='torch'`` — the pure-PyTorch path's semantics
    (hashGridEmbedding.py:81-102): per-level resolution floor(base·β^l),
    hash = XOR of coord·primes [1,3,2654435761,…] mod level size, and the
    reference's degenerate interpolation (``xf = x - x.float()`` ≡ 0, so the
    lookup is the floor corner only).  Trained reference checkpoints embed this
    behaviour, so it is kept reproducible behind ``interpolation='floor'``;
    set ``interpolation='linear'`` for the corrected trilinear version.

TPU design: all levels are packed into a single ``[total_rows, C]`` table with
static per-level offsets; the forward is one batched gather + weighted
reduction (vectorized over levels — no per-level Python loop in the hot path),
and the backward is XLA scatter-add, fully twice-differentiable (the eikonal
term needs grad-of-grad through the encoder, SURVEY.md §3.2).  Small tables
(≤1024 rows/level) additionally get a one-hot MXU lookup fast path below.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# instant-ngp / hashencoder.cu:75 primes (index 0 is intentionally 1).
NGP_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)
# pure-torch path primes (hashGridEmbedding.py:14).
TORCH_PRIMES = (1, 3, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)

_U32 = np.uint64(0xFFFFFFFF)  # wrap-to-uint32 mask; jnp has no uint32 overflow UB


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static description of a multi-resolution hash grid."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    per_level_scale: float = 2.0
    desired_resolution: Optional[int] = None
    variant: str = "ngp"          # 'ngp' | 'torch'
    gridtype: str = "hash"        # 'hash' | 'tiled'
    interpolation: str = "linear"  # 'linear' | 'smoothstep' | 'floor'
    align_corners: bool = False
    init_std: float = 1e-4

    # ---- derived static tables -----------------------------------------
    def scale_factor(self) -> float:
        if self.desired_resolution is not None:
            if self.variant == "torch":
                # hashGridEmbedding.py:126
                return math.exp(
                    (math.log(self.desired_resolution) - math.log(self.base_resolution))
                    / (self.num_levels - 1)
                )
            # hashgridencoder.py:86
            return float(
                np.exp2(np.log2(self.desired_resolution / self.base_resolution) / (self.num_levels - 1))
            )
        return self.per_level_scale

    def level_resolutions(self) -> np.ndarray:
        s = self.scale_factor()
        if self.variant == "torch":
            return np.array(
                [int(math.floor(self.base_resolution * s**l)) for l in range(self.num_levels)],
                dtype=np.int64,
            )
        # ngp: resolution used for the offset table (hashgridencoder.py:104)
        return np.array(
            [int(np.ceil(self.base_resolution * s**l)) for l in range(self.num_levels)],
            dtype=np.int64,
        )

    def level_scales(self) -> np.ndarray:
        """The continuous position scale per level."""
        s = self.scale_factor()
        if self.variant == "torch":
            return self.level_resolutions().astype(np.float64)
        # hashencoder.cu:155  scale = exp2f(level*S)*H - 1
        S = np.log2(s)
        return np.exp2(np.arange(self.num_levels) * S) * self.base_resolution - 1.0

    def level_grid_resolutions(self) -> np.ndarray:
        """Grid resolution used for corner indexing.

        For 'ngp' this is ceil(scale)+1 (hashencoder.cu:156), which equals the
        wrapper's ceil(H·s^l) (hashgridencoder.py:104) for all l; the dense
        stride base is this value + 1 (hashencoder.cu:94).
        """
        if self.variant == "torch":
            return self.level_resolutions()
        return np.ceil(self.level_scales()).astype(np.int64) + 1

    def level_sizes(self) -> np.ndarray:
        max_params = 2**self.log2_hashmap_size
        sizes = []
        for l in range(self.num_levels):
            if self.variant == "torch":
                res = int(self.level_resolutions()[l])
                sizes.append(min(res**self.input_dim, max_params))  # hashGridEmbedding.py:132
            else:
                res = int(self.level_resolutions()[l])
                n = min(max_params, (res + 1) ** self.input_dim)  # hashgridencoder.py:105
                n = int(np.ceil(n / 8) * 8)
                sizes.append(n)
        return np.array(sizes, dtype=np.int64)

    def offsets(self) -> np.ndarray:
        off = np.zeros(self.num_levels + 1, dtype=np.int64)
        off[1:] = np.cumsum(self.level_sizes())
        return off

    def total_rows(self) -> int:
        return int(self.offsets()[-1])

    def padded_total_rows(self) -> int:
        """total_rows rounded up so rows*level_dim is a multiple of 128.

        Tables allocated at this size make :func:`pack_pages` a pure reshape
        (bitcast).  With the semantic size (per-level offsets rounded to 8,
        hashgridencoder.py:100-110) the pad concatenate inside pack_pages
        copies the whole table every step — measured 10 ms for the log2=19
        preset on TPU v5e, the single largest train-step fixed cost
        (scripts/scatter_bench.py).  The dead tail rows are never indexed
        (all lookups are bounded by the per-level offsets) and receive zero
        gradients."""
        n = self.total_rows()
        if 128 % self.level_dim != 0:
            return n
        rows_per_page = 128 // self.level_dim
        return int(-(-n // rows_per_page) * rows_per_page)

    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def dense_mask(self) -> np.ndarray:
        """Per level: True when the full grid fits (dense stride indexing).

        Mirrors get_grid_index (hashencoder.cu:88-101): hash iff the final
        stride (res+1)^D exceeds the level's hashmap size.
        """
        if self.variant == "torch":
            # pure-torch path always hashes (hashGridEmbedding.py:98)
            return np.zeros(self.num_levels, dtype=bool)
        res = self.level_grid_resolutions()
        return ((res + 1) ** self.input_dim) <= self.level_sizes()


def init_table(key, spec: HashGridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """U(-std, std) init (hashgridencoder.py:119-121, hashGridEmbedding.py:69-71).

    Large-table (page-path) specs are allocated directly as the (P, 128)
    page image — the canonical parameter layout on TPU.  Measured on v5e
    (scripts/scatter_bench.py + layout probes): materializing the
    (rows, C) -> (P, 128) repack is a ~9 ms physical relayout for the
    log2=19 preset, and it ran EVERY train step when the narrow table was
    the parameter; a gather from a pre-packed page image costs 2.1 ms.
    Storing pages makes the repack disappear; the optimizer update is
    elementwise and layout-agnostic.  Small-table (one-hot MXU) specs keep
    the narrow (rows, C) layout.  All consumers accept either layout
    (:func:`as_pages` / :func:`as_rows`), so legacy narrow checkpoints and
    torch imports still load."""
    if spec_uses_pages(spec):
        n_pages = spec.padded_total_rows() * spec.level_dim // 128
        n_pages = -(-n_pages // 8) * 8  # P('model') row sharding divisibility
        return jax.random.uniform(
            key, (n_pages, 128), dtype=dtype,
            minval=-spec.init_std, maxval=spec.init_std,
        )
    return jax.random.uniform(
        key, (spec.padded_total_rows(), spec.level_dim), dtype=dtype,
        minval=-spec.init_std, maxval=spec.init_std,
    )


def spec_uses_pages(spec: HashGridSpec) -> bool:
    """True when :func:`hash_encode` serves this spec from the page image."""
    return (int(spec.level_sizes().max()) > ONEHOT_MAX_ROWS
            and 128 % spec.level_dim == 0 and spec.level_dim != 128)


def table_is_pages(table: jnp.ndarray, spec: HashGridSpec) -> bool:
    """Whether a stored table param is a (P, 128) page image (vs (rows, C))."""
    return table.ndim == 2 and table.shape[1] == 128 and spec.level_dim != 128


def as_pages(table: jnp.ndarray, spec: HashGridSpec, dtype=None) -> jnp.ndarray:
    """Either layout -> (P, 128) page image (cast only when already pages)."""
    if table_is_pages(table, spec):
        return table if dtype is None or table.dtype == dtype else table.astype(dtype)
    return pack_pages(table, dtype)


def as_rows(table: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Either layout -> narrow (rows, C) view (a relayout when stored as
    pages — use only on small-table or cold paths)."""
    if table_is_pages(table, spec):
        C = spec.level_dim
        return table.reshape(-1)[: spec.total_rows() * C].reshape(-1, C)
    return table


# ---------------------------------------------------------------------------
# index computation
# ---------------------------------------------------------------------------

def _corner_bits(D: int) -> np.ndarray:
    """(2^D, D) binary corner offsets."""
    n = 1 << D
    idx = np.arange(n, dtype=np.int64)[:, None]
    dims = np.arange(D, dtype=np.int64)[None, :]
    return ((idx >> dims) & 1).astype(np.int64)


def _hash_u32(coords: jnp.ndarray, primes: Tuple[int, ...]) -> jnp.ndarray:
    """XOR-prime spatial hash on uint32 wraparound arithmetic.

    coords: (..., D) non-negative int32/int64 grid coordinates.
    Matches fast_hash (hashencoder.cu:68-84) when given NGP_PRIMES and
    hash_func (hashGridEmbedding.py:33-40) when given TORCH_PRIMES.
    """
    D = coords.shape[-1]
    c = coords.astype(jnp.uint32)
    result = jnp.zeros(coords.shape[:-1], dtype=jnp.uint32)
    for d in range(D):
        result = result ^ (c[..., d] * jnp.uint32(primes[d] & 0xFFFFFFFF))
    return result


def _level_indices(spec: HashGridSpec, corners: jnp.ndarray) -> jnp.ndarray:
    """corners (N, L, 2^D, D) int32 -> packed-table row indices (N, L, 2^D)."""
    L, D = spec.num_levels, spec.input_dim
    sizes = spec.level_sizes()
    grid_res = spec.level_grid_resolutions()
    dense = spec.dense_mask()
    offsets = spec.offsets()
    primes = NGP_PRIMES if spec.variant == "ngp" else TORCH_PRIMES

    if spec.gridtype == "tiled":
        dense = np.ones_like(dense)  # tiled: always stride-index, wrap by modulo

    # dense stride index: sum_d corner_d * stride_base^d  (hashencoder.cu:88-95)
    stride_base = grid_res + 1 if spec.variant == "ngp" else grid_res
    strides = np.stack([stride_base.astype(np.int64) ** d for d in range(D)], axis=-1)  # (L, D)

    strides_j = jnp.asarray(strides.astype(np.int64), dtype=jnp.uint32)  # (L, D)
    dense_idx = jnp.sum(corners.astype(jnp.uint32) * strides_j[None, :, None, :], axis=-1)

    hashed_idx = _hash_u32(corners, primes)

    dense_j = jnp.asarray(dense)
    idx = jnp.where(dense_j[None, :, None], dense_idx, hashed_idx)
    sizes_j = jnp.asarray(sizes.astype(np.int64), dtype=jnp.uint32)
    idx = idx % sizes_j[None, :, None]
    rows = idx.astype(jnp.int32) + jnp.asarray(offsets[:-1], dtype=jnp.int32)[None, :, None]
    return rows


def _positions(spec: HashGridSpec, x: jnp.ndarray):
    """x (N, D) in [0,1] -> (pos_floor int32 (N,L,D), frac (N,L,D))."""
    scales = jnp.asarray(spec.level_scales(), dtype=x.dtype)  # (L,)
    pos = x[:, None, :] * scales[None, :, None]
    if spec.variant == "ngp" and not spec.align_corners:
        pos = pos + 0.5  # hashencoder.cu:163
    floor = jnp.floor(pos)
    frac = pos - floor
    return floor.astype(jnp.int32), frac


def _interp_weights(spec: HashGridSpec, frac: jnp.ndarray) -> jnp.ndarray:
    """frac (N,L,D) -> corner weights (N,L,2^D)."""
    D = spec.input_dim
    bits = jnp.asarray(_corner_bits(D))  # (2^D, D)
    if spec.interpolation == "floor":
        # reference pure-torch bug: only the floor corner has weight 1
        # (hashGridEmbedding.py:86 `xf = x - x.float()` == 0)
        f = jnp.zeros_like(frac)
    elif spec.interpolation == "smoothstep":
        f = frac * frac * (3.0 - 2.0 * frac)  # gridencoder.cu smoothstep
    else:
        f = frac
    # weight per corner: prod_d (bit ? f : 1-f)
    w = jnp.where(bits[None, None, :, :] == 1, f[:, :, None, :], 1.0 - f[:, :, None, :])
    return jnp.prod(w, axis=-1)


# Per-level tables at or below this row count use the one-hot-matmul lookup
# (MXU path) instead of XLA gather; the gather path on TPU is an order of
# magnitude slower for these shapes.
ONEHOT_MAX_ROWS = 1024


# ---------------------------------------------------------------------------
# large-table fast path: page-packed gather + fused lane select
# ---------------------------------------------------------------------------
#
# TPU v5e has no per-lane random-access gather (the CUDA kernels' core
# operation, hashencoder.cu:163-199).  Measured on-chip (chained-iteration
# microbenchmarks with host-readback sync, 2026-08, see RESULTS.md):
#
#   * XLA gather cost is PER-LOOKUP, not per-byte: ~4.4 ns/row from a
#     narrow (R, 2) table, ~2.6 ns/row from a 128-lane (P, 128) table
#     (512 B rows hit the HBM-transaction sweet spot), independent of table
#     size (no cache) and linear in lookup count (a serial gather engine).
#   * Mosaic/Pallas cannot express a VMEM row gather on this backend
#     (sublane dynamic gather compiles only within a single (8, 128) tile;
#     larger shapes crash the TPU compiler), so a Pallas kernel CANNOT beat
#     XLA here — splitting gather (XLA) from interp (Pallas) would
#     materialize the (M, 128) page tensor in HBM and lose.
#   * XLA scatter-add (the CUDA backward's atomicAdd, hashencoder.cu:324-339)
#     is ~10 ns/contribution — fine for the small with-grad point sets
#     (~10k pts/step), catastrophic if ever applied to the no-grad sweep.
#
# The TPU-native design that follows from those numbers: pack the table so
# one row's C features live in consecutive lanes of a (P, 128) page array,
# gather whole 512 B pages (the cheap shape), and select the 2 feature lanes
# with a one-hot multiply-reduce that XLA fuses INTO the gather consumer (the
# page tensor never materializes).  Corner-major accumulation avoids the
# (N, L, 2^D, C) intermediate entirely.  The no-grad tracer path additionally
# gathers from a bfloat16 page image (~3.0 ns/lookup) — faithful to the
# reference CUDA forward, which itself casts to half
# (hashgridencoder.py:13-24 custom_fwd cast_inputs=torch.half).

# Use the page path above this many rows in the largest level.
PAGE_MIN_ROWS = 1024


def pack_pages(table: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """(R, C) table -> (P, 128) page image; row r's features at lanes
    [r*C % 128 : r*C % 128 + C].  Requires C | 128 so rows never span pages.
    Pure pad+reshape(+cast): XLA transposes it exactly in the backward."""
    R, C = table.shape
    assert 128 % C == 0, f"level_dim {C} must divide 128 for the page path"
    flat = table.reshape(-1)
    if dtype is not None and flat.dtype != dtype:
        flat = flat.astype(dtype)
    pad = (-flat.shape[0]) % 128
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    return flat.reshape(-1, 128)


def _page_lookup(pages: jnp.ndarray, rows: jnp.ndarray, C: int,
                 out_dtype) -> jnp.ndarray:
    """rows (...,) int32 -> (..., C) values via one 128-lane page gather per
    row + a fused one-hot lane select (never materializes the page tensor)."""
    shape = rows.shape
    flat_elem = rows.reshape(-1).astype(jnp.uint32) * jnp.uint32(C)
    pidx = (flat_elem >> jnp.uint32(7)).astype(jnp.int32)
    lane = (flat_elem & jnp.uint32(127)).astype(jnp.int32)
    g = jnp.take(pages, pidx, axis=0)                      # (M, 128), fused
    iota = jnp.arange(128, dtype=jnp.int32)[None, :]
    outs = []
    for c in range(C):
        oh = (iota == (lane[:, None] + c)).astype(pages.dtype)
        outs.append(jnp.sum(g * oh, axis=1, dtype=out_dtype))
    return jnp.stack(outs, axis=-1).reshape(*shape, C)


def _onehot_lookup(spec: HashGridSpec, rows: jnp.ndarray,
                   w: Optional[jnp.ndarray], table: jnp.ndarray) -> jnp.ndarray:
    """Small-table lookup as one-hot matmul (TPU MXU; any-order AD).

    rows: (N, L, K) packed-table row indices; w: (N, L, K) corner weights or
    None (floor).  The packed table is reshaped into a padded (L, Rmax, C)
    per-level tensor; lookups become a batched (N, Rmax) x (Rmax, C) einsum
    whose one-hot operand is a compare — the whole read is sequential-memory
    + MXU, no random access.
    """
    L, C = spec.num_levels, spec.level_dim
    sizes = spec.level_sizes()
    offsets = spec.offsets()
    rmax = int(sizes.max())

    # padded per-level tables (L, rmax, C)
    tabs = jnp.zeros((L, rmax, C), dtype=table.dtype)
    for l in range(L):
        tabs = tabs.at[l, : int(sizes[l])].set(
            jax.lax.dynamic_slice_in_dim(table, int(offsets[l]), int(sizes[l])))

    local = rows - jnp.asarray(offsets[:-1], dtype=rows.dtype)[None, :, None]  # (N,L,K)
    iota = jnp.arange(rmax, dtype=rows.dtype)
    K = rows.shape[-1]
    acc = None
    for k in range(K):
        oh = (local[:, :, k, None] == iota[None, None, :]).astype(table.dtype)
        if w is not None:
            oh = oh * w[:, :, k, None]
        acc = oh if acc is None else acc + oh
    # (N, L, rmax) x (L, rmax, C) -> (N, L, C)
    return jnp.einsum("nlr,lrc->nlc", acc, tabs)


def level_means(table: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Per-level mean feature (L, C) of the packed table.

    Used as the fill value for pruned levels in level-pruned guidance
    queries (``hash_encode(max_level=...)``): far from the surface the fine
    levels' hash collisions decorrelate, so their expected contribution is
    the table mean — a strictly better constant than zero."""
    sizes = spec.level_sizes()
    offsets = spec.offsets()
    C = spec.level_dim
    if table_is_pages(table, spec):
        # per-level reductions over the flat element view; the reshape fuses
        # into the mean (no materialized relayout)
        flat = table.reshape(-1)
        means = []
        for l in range(spec.num_levels):
            seg = jax.lax.dynamic_slice_in_dim(
                flat, int(offsets[l]) * C, int(sizes[l]) * C).reshape(-1, C)
            means.append(jnp.mean(seg, axis=0))
        return jnp.stack(means, axis=0)
    means = []
    for l in range(spec.num_levels):
        seg = jax.lax.dynamic_slice_in_dim(table, int(offsets[l]), int(sizes[l]))
        means.append(jnp.mean(seg, axis=0))
    return jnp.stack(means, axis=0)


def hash_encode(
    x: jnp.ndarray,
    table: jnp.ndarray,
    spec: HashGridSpec,
    *,
    zero_oob: bool = True,
    inference: bool = False,
    max_level: Optional[int] = None,
    fill: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Encode x (N, D) in [0,1] -> (N, L*C).

    Fully differentiable (incl. second order) w.r.t. both ``x`` and ``table``.
    Matches kernel_grid (hashencoder.cu:107-252) for variant='ngp' and the
    pure-torch forward (hashGridEmbedding.py:81-102,150-155) for
    variant='torch' + interpolation='floor'.  Small-table specs take the
    one-hot MXU path (:func:`_onehot_lookup`); large tables use the
    page-packed gather + fused lane select (see the block comment above
    :func:`pack_pages` for the measured on-chip rationale).

    ``inference=True`` gathers from a bfloat16 page image (fp32 accumulate)
    — for the gradient-stopped tracer; mirrors the reference CUDA forward's
    own half cast (hashgridencoder.py:13-24).  The fp32 default is exact.

    ``max_level=K`` prunes the encode to the K coarsest levels — only their
    corners are gathered; levels >= K emit a constant ``fill`` feature
    ((L-K, C), typically :func:`level_means`; zeros when None).  Output
    shape is unchanged.  This is the level-pruned *guidance* approximation
    for the gradient-stopped sphere tracer (RayTracerConfig.prune_*); the
    per-level semantics of the computed levels stay exact (all derived
    per-level constants depend only on the level index, so truncating
    ``num_levels`` leaves levels < K untouched).
    """
    N, D = x.shape
    L, C = spec.num_levels, spec.level_dim

    if max_level is not None and max_level < L:
        K = int(max_level)
        # freeze the resolved growth factor: scale_factor() derives it from
        # num_levels when desired_resolution is set, so a naive truncation
        # would re-spread base->desired over K levels
        sub = dataclasses.replace(spec, num_levels=K,
                                  per_level_scale=spec.scale_factor(),
                                  desired_resolution=None)
        # slice to the padded size when the full table allows it (the extra
        # rows belong to level K and are never indexed by the K-level
        # sub-spec); page images slice whole page rows
        if table_is_pages(table, spec):
            n_pg = min(sub.padded_total_rows() * C // 128, table.shape[0])
            sub_table = jax.lax.dynamic_slice_in_dim(table, 0, n_pg)
        else:
            n_sub = min(sub.padded_total_rows(), table.shape[0])
            sub_table = jax.lax.dynamic_slice_in_dim(table, 0, n_sub)
        out_k = hash_encode(
            x, sub_table, sub, zero_oob=zero_oob, inference=inference,
        )  # (N, K*C)
        if fill is None:
            fill_v = jnp.zeros((N, (L - K) * C), dtype=out_k.dtype)
        else:
            fill_v = jnp.broadcast_to(
                fill[K:].reshape(1, (L - K) * C).astype(out_k.dtype),
                (N, (L - K) * C))
            if zero_oob and spec.variant == "ngp":
                oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)
                fill_v = jnp.where(oob[:, None], 0.0, fill_v)
        return jnp.concatenate([out_k, fill_v], axis=-1)
    use_onehot = int(spec.level_sizes().max()) <= ONEHOT_MAX_ROWS
    use_pages = not use_onehot and 128 % C == 0
    val_dtype = jnp.bfloat16 if table.dtype == jnp.bfloat16 else jnp.float32

    floor, frac = _positions(spec, x)
    if spec.interpolation == "floor":
        # reference pure-torch degenerate interp: only the floor corner
        # contributes (weight 1) — 1 corner instead of 2^D.
        rows = _level_indices(spec, floor[:, :, None, :])  # (N,L,1)
        if use_onehot:
            out = _onehot_lookup(spec, rows, None, as_rows(table, spec))
        elif use_pages:
            pages = as_pages(table, spec, jnp.bfloat16 if inference else None)
            out = _page_lookup(pages, rows[..., 0], C, val_dtype)
        else:
            out = jnp.take(as_rows(table, spec), rows[..., 0], axis=0)  # (N,L,C)
    else:
        bits = jnp.asarray(_corner_bits(D), dtype=jnp.int32)  # (2^D, D)
        corners = floor[:, :, None, :] + bits[None, None, :, :]  # (N,L,2^D,D)
        rows = _level_indices(spec, corners)  # (N,L,2^D)
        w = _interp_weights(spec, frac)  # (N,L,2^D)

        if use_onehot:
            narrow = as_rows(table, spec)
            out = _onehot_lookup(spec, rows, w.astype(narrow.dtype), narrow)
        elif use_pages:
            pages = as_pages(table, spec, jnp.bfloat16 if inference else None)
            w32 = w.astype(val_dtype)
            out = jnp.zeros((N, L, C), dtype=val_dtype)
            for k in range(1 << D):  # corner-major: no (N,L,2^D,C) tensor
                v = _page_lookup(pages, rows[:, :, k], C, val_dtype)
                out = out + v * w32[:, :, k, None]
        else:
            narrow = as_rows(table, spec)
            w = w.astype(narrow.dtype)
            vals = jnp.take(narrow, rows, axis=0)  # (N,L,2^D,C)
            out = jnp.sum(vals * w[..., None], axis=2)  # (N,L,C)

    if zero_oob and spec.variant == "ngp":
        # hashencoder.cu:131-147: inputs outside [0,1] produce zeros
        oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)
        out = jnp.where(oob[:, None, None], 0.0, out)

    return out.reshape(N, L * C)


def total_variation_loss(
    x: jnp.ndarray, table: jnp.ndarray, spec: HashGridSpec
) -> jnp.ndarray:
    """Grid total-variation regularizer at sampled points.

    TPU-native replacement for the torch-ngp ``grad_total_variation`` kernel
    (gridencoder_torchngp/src/gridencoder.cu kernel_grad_tv), which injects TV
    gradients of each sampled cell directly into ``embeddings.grad``.  Here it
    is a plain differentiable loss term: sum over levels/dims of squared
    differences between the floor corner and its +1 neighbour at the sampled
    cells — same gradient structure, jit/grad-friendly.
    """
    N, D = x.shape
    floor, _ = _positions(spec, x)
    bits = jnp.asarray(_corner_bits(D), dtype=jnp.int32)
    corners = floor[:, :, None, :] + bits[None, None, :, :]
    rows = _level_indices(spec, corners)  # (N,L,2^D)
    if table_is_pages(table, spec):
        vals = _page_lookup(table, rows, spec.level_dim, jnp.float32)
    else:
        vals = jnp.take(table, rows, axis=0)  # (N,L,2^D,C)
    # corner 0 is the floor corner; corner with only bit d set is its +e_d
    # neighbour (see _corner_bits): TV = sum_d (v[e_d] - v[0])^2
    base = vals[:, :, 0:1, :]
    diffs = []
    for d in range(D):
        diffs.append(vals[:, :, 1 << d, :] - base[:, :, 0, :])
    tv = sum(jnp.sum(dd**2) for dd in diffs)
    return tv / (N * spec.num_levels * D)


# ---------------------------------------------------------------------------
# NumPy oracle (for unit tests against the CUDA-kernel semantics)
# ---------------------------------------------------------------------------

def hash_encode_numpy(x: np.ndarray, table: np.ndarray, spec: HashGridSpec) -> np.ndarray:
    """Scalar-loop NumPy transliteration used as the unit-test oracle."""
    N, D = x.shape
    L, C = spec.num_levels, spec.level_dim
    if table.ndim == 2 and table.shape[1] == 128 and C != 128:
        table = table.reshape(-1)[: spec.total_rows() * C].reshape(-1, C)
    out = np.zeros((N, L, C), dtype=np.float64)
    scales = spec.level_scales()
    sizes = spec.level_sizes()
    offsets = spec.offsets()
    grid_res = spec.level_grid_resolutions()
    dense = spec.dense_mask()
    if spec.gridtype == "tiled":
        dense = np.ones_like(dense)
    primes = NGP_PRIMES if spec.variant == "ngp" else TORCH_PRIMES

    for n in range(N):
        if spec.variant == "ngp" and (np.any(x[n] < 0) or np.any(x[n] > 1)):
            continue
        for l in range(L):
            pos = x[n] * scales[l]
            if spec.variant == "ngp" and not spec.align_corners:
                pos = pos + 0.5
            pg = np.floor(pos).astype(np.int64)
            f = pos - pg
            if spec.interpolation == "floor":
                f = np.zeros_like(f)
            elif spec.interpolation == "smoothstep":
                f = f * f * (3 - 2 * f)
            for corner in range(1 << D):
                w = 1.0
                cc = np.zeros(D, dtype=np.int64)
                for d in range(D):
                    if (corner >> d) & 1:
                        w *= f[d]
                        cc[d] = pg[d] + 1
                    else:
                        w *= 1 - f[d]
                        cc[d] = pg[d]
                if dense[l]:
                    stride_base = grid_res[l] + 1 if spec.variant == "ngp" else grid_res[l]
                    idx = 0
                    s = 1
                    for d in range(D):
                        idx += int(cc[d]) * s
                        s *= int(stride_base)
                else:
                    idx = 0
                    for d in range(D):
                        idx ^= (int(cc[d]) * primes[d]) & 0xFFFFFFFF
                idx = (idx & 0xFFFFFFFF) % int(sizes[l])
                out[n, l] += w * table[offsets[l] + idx]
    return out.reshape(N, L * C).astype(np.float32)
