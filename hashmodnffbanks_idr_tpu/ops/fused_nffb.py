"""Fused NFFB encoder + SDF MLP Pallas kernel (tracer fast path).

End-to-end fusion in the spirit of tiny-cuda-nn's fused encoder+MLP
(SURVEY.md §2.2 item 3): per-level positional encoding, StyleAttention
(shared linear + row instance-norm), the SIREN trunk, the folded shared
out-layer, and the 9x512 softplus SDF MLP all run inside ONE Pallas program
per point tile — no intermediate touches HBM, and the relayout-heavy XLA
stages (transposes/stacks/concats between encoder stages) disappear.

Division of labour: the *hash lookup + Fourier aux* (cheap, already MXU
one-hot in jnp) stays outside; the kernel consumes one packed (N, 128) input
whose lanes are [input01(3) | x/bound(3) | grid features (4L)].

Trick for the narrow (4-wide) per-level features: the positional encoding is
sin/cos of *scaled copies* of the features, so each level's 56-wide encoding
is one constant (128, Wp) selection/scale matmul followed by elementwise
sin/cos under constant lane masks — everything stays 128-lane wide.

Scope: flagship FFB/StyleModNFFB (torch grid floor lookup, posenc, SIREN,
has_out=False, include_input=True) + standard 8x512/skip-4 ImplicitNetwork.
Gated by HMNFFB_FUSED_ENCODER=1 (default off: the split jnp-encoder +
fused-MLP path measured faster on v5e; see models/networks.make_fast_sdf).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _round_up, _softplus100, effective_weight


def supports_nffb_fusion(embedder, dims, skip_in) -> bool:
    from ..models.embedders import NFFBEmbedder
    from .fused_mlp import supports_fusion

    if not isinstance(embedder, NFFBEmbedder):
        return False
    e = embedder
    return (
        e.grid_backend == "torch"
        and e.freq_enc_type == "PositionalEncodingNET"
        and e.layers_type == "SIREN"
        and not e.has_out
        and e.include_input
        and e.level_width == 4
        and e.out_width <= 128
        and 4 * e.grid_levels + 6 <= 128
        and supports_fusion(dims, skip_in)
    )


def pack_nffb(embedder, p_embed: dict, d_in_pad: int, hidden: int) -> dict:
    """Parameters + constant selection matrices, padded to lane boundaries."""
    e = embedder
    L = e.n_levels
    W = e.out_width                      # 56 for L=6
    Wp = _round_up(W, 128)
    used = e.n_nffb_layers - 2

    # trunk linears (3->W, then W->W): pad to (Wp, Wp)
    lins = p_embed["ff_lin"]
    n_lin = len(lins)
    trunk_w = jnp.zeros((n_lin, Wp, Wp), dtype=jnp.float32)
    trunk_b = jnp.zeros((n_lin, Wp), dtype=jnp.float32)
    for i, p in enumerate(lins):
        w = effective_weight(p)
        if i == 0:
            # first layer consumes x/bound which lives in lanes 3..5 of the
            # packed input; shift its 3 input rows there
            w0p = jnp.zeros((Wp, Wp), dtype=jnp.float32)
            w0p = w0p.at[3:6, : w.shape[1]].set(w)
            trunk_w = trunk_w.at[i].set(w0p)
        else:
            trunk_w = trunk_w.at[i, : w.shape[0], : w.shape[1]].set(w)
        trunk_b = trunk_b.at[i, : p["b"].shape[0]].set(p["b"])

    out_w = jnp.zeros((Wp, Wp), dtype=jnp.float32)
    ow = effective_weight(p_embed["out_layer"])
    out_w = out_w.at[: ow.shape[0], : ow.shape[1]].set(ow)
    out_b = jnp.zeros((Wp,), dtype=jnp.float32)
    out_b = out_b.at[: p_embed["out_layer"]["b"].shape[0]].set(
        p_embed["out_layer"]["b"])

    style = bool(e.style_modulation)
    style_w = jnp.zeros((Wp, Wp), dtype=jnp.float32)
    style_b = jnp.zeros((Wp,), dtype=jnp.float32)
    if style:
        sw = effective_weight(p_embed["style"]["linear_transform"])
        style_w = style_w.at[: sw.shape[0], : sw.shape[1]].set(sw)
        style_b = style_b.at[: sw.shape[1]].set(
            p_embed["style"]["linear_transform"]["b"])

    # constant posenc selection/scale matrices per used level:
    # emb56 = [g, g, sin(g*2^0), cos(g*2^0), ..., sin(g*2^(L-1)), cos(...)]
    # pre_l = x_packed @ M_l, then sin/cos under constant masks.
    n_slots = 2 + 2 * L                  # identity x2 + (sin, cos) per freq
    sel = np.zeros((used, 128, Wp), dtype=np.float32)
    sin_mask = np.zeros((Wp,), dtype=np.float32)
    cos_mask = np.zeros((Wp,), dtype=np.float32)
    for slot in range(n_slots):
        if slot < 2:
            scale = 1.0
        else:
            f = (slot - 2) // 2
            scale = 2.0**f
            if (slot - 2) % 2 == 0:
                sin_mask[slot * 4:(slot + 1) * 4] = 1.0
            else:
                cos_mask[slot * 4:(slot + 1) * 4] = 1.0
    for lv in range(used):
        for slot in range(n_slots):
            scale = 1.0 if slot < 2 else 2.0 ** ((slot - 2) // 2)
            for d in range(4):
                sel[lv, 6 + 4 * lv + d, slot * 4 + d] = scale

    # SDF-MLP input assembler: emb_in = input01(3 lanes) + acc shifted by 3
    in_place = np.zeros((128, d_in_pad), dtype=np.float32)
    in_place[np.arange(3), np.arange(3)] = 1.0        # input01 lanes 0..2
    acc_shift = np.zeros((Wp, d_in_pad), dtype=np.float32)
    acc_shift[np.arange(W), 3 + np.arange(W)] = 1.0   # acc features -> 3..3+W

    meta = dict(L=L, W=W, Wp=Wp, used=used, n_lin=n_lin,
                w0=float(e.sin_w0), style=style,
                grid_levels=float(e.grid_levels))
    return {
        "trunk_w": trunk_w.astype(jnp.bfloat16), "trunk_b": trunk_b,
        "out_w": out_w.astype(jnp.bfloat16), "out_b": out_b,
        "style_w": style_w.astype(jnp.bfloat16), "style_b": style_b,
        "sel": jnp.asarray(sel, dtype=jnp.bfloat16),
        "sin_mask": jnp.asarray(sin_mask), "cos_mask": jnp.asarray(cos_mask),
        "in_place": jnp.asarray(in_place, dtype=jnp.bfloat16),
        "acc_shift": jnp.asarray(acc_shift, dtype=jnp.bfloat16),
        "meta": meta,
    }


def _kernel(x_ref, trunk_w_ref, trunk_b_ref, out_w_ref, out_b_ref,
            style_w_ref, style_b_ref, sel_ref, sin_mask_ref, cos_mask_ref,
            in_place_ref, acc_shift_ref, w_in_ref, b_in_ref, w_mid_ref,
            b_mid_ref, w_out_ref, b_out_ref, skip_perm_ref, out_ref,
            *, meta, skip_cols, n_mid):
    W = meta["W"]
    Wp = meta["Wp"]
    used = meta["used"]
    w0 = meta["w0"]
    tile = x_ref.shape[0]

    x_all = x_ref[:]  # (tile, 128): [input01(3) | xb(3) | grid_cat(4L) | 0...]
    xb16 = x_all.astype(jnp.bfloat16)

    colW = jax.lax.broadcasted_iota(jnp.int32, (tile, Wp), 1)
    lane_mask = (colW < W).astype(jnp.float32)
    sin_m = sin_mask_ref[:]
    cos_m = cos_mask_ref[:]

    # trunk layer 0 consumes the packed input directly (rows 3..5 active)
    trunk_x = jnp.dot(xb16, trunk_w_ref[0],
                      preferred_element_type=jnp.float32) + trunk_b_ref[0]
    trunk_x = jnp.sin(w0 * trunk_x) * lane_mask

    s_acc = jnp.zeros((tile, Wp), dtype=jnp.float32)
    for layer in range(1, meta["n_lin"]):
        trunk_x = jnp.dot(trunk_x.astype(jnp.bfloat16), trunk_w_ref[layer],
                          preferred_element_type=jnp.float32) + trunk_b_ref[layer]
        trunk_x = jnp.sin(w0 * trunk_x) * lane_mask
        lv = layer - 1
        if lv < used:
            pre = jnp.dot(xb16, sel_ref[lv], preferred_element_type=jnp.float32)
            emb = (pre * (1.0 - sin_m - cos_m)
                   + jnp.sin(pre) * sin_m + jnp.cos(pre) * cos_m) * lane_mask
            if meta["style"]:
                mod = jnp.dot(emb.astype(jnp.bfloat16), style_w_ref[:],
                              preferred_element_type=jnp.float32) + style_b_ref[:]
                mod = mod * lane_mask
                mean = jnp.sum(mod, axis=-1, keepdims=True) / W
                var = jnp.sum(((mod - mean) * lane_mask) ** 2, axis=-1,
                              keepdims=True) / W
                emb = (mod - mean) * lane_mask / jnp.sqrt(var + 1e-5)
            s_acc = s_acc + emb + trunk_x

    acc = (jnp.dot(s_acc.astype(jnp.bfloat16), out_w_ref[:],
                   preferred_element_type=jnp.float32)
           + used * out_b_ref[:]) / meta["grid_levels"]
    acc = acc * lane_mask

    emb_in = (jnp.dot(xb16, in_place_ref[:], preferred_element_type=jnp.float32)
              + jnp.dot(acc.astype(jnp.bfloat16), acc_shift_ref[:],
                        preferred_element_type=jnp.float32))

    # ---- 9-layer softplus SDF MLP (structure of fused_mlp._kernel) ----
    hh = jnp.dot(emb_in.astype(jnp.bfloat16), w_in_ref[:],
                 preferred_element_type=jnp.float32) + b_in_ref[:]
    hh = _softplus100(hh)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    hidden = w_mid_ref.shape[1]
    for l in range(n_mid):
        hh = jnp.dot(hh.astype(jnp.bfloat16), w_mid_ref[l],
                     preferred_element_type=jnp.float32) + b_mid_ref[l]
        hh = _softplus100(hh)
        if l == 2:
            colH = jax.lax.broadcasted_iota(jnp.int32, (tile, hidden), 1)
            shifted = jnp.dot(emb_in.astype(jnp.bfloat16), skip_perm_ref[:],
                              preferred_element_type=jnp.float32)
            hh = jnp.where(colH >= skip_cols, shifted * inv_sqrt2, hh * inv_sqrt2)
    sdf = jnp.dot(hh.astype(jnp.bfloat16), w_out_ref[:],
                  preferred_element_type=jnp.float32) + b_out_ref[:]
    out_ref[:] = sdf


def pack_input(embedder, p_embed: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x (N, 3) -> packed (N, 128): [input01 | x/bound | grid features]."""
    from . import hashgrid as hg

    e = embedder
    bound = e.bound
    input01 = (x + bound) / (2 * bound)
    xb = x / bound
    grid = e.grid
    # FourierFeature aux tail (sin, cos) + hash floor features, matching the
    # (N, L, 2F) reshape layout of the reference (nffb3d.py:136-139)
    aug = grid.apply(p_embed["grid"], input01)
    grid_cat = aug[..., 3:]
    N = x.shape[0]
    pad = 128 - 6 - grid_cat.shape[-1]
    return jnp.concatenate(
        [input01, xb, grid_cat,
         jnp.zeros((N, pad), dtype=x.dtype)], axis=-1)


def fused_nffb_sdf_raw(x: jnp.ndarray, embedder, p_embed: dict,
                       nffb_packed: dict, mlp_packed: dict, d_in: int,
                       hidden: int = 512, tile: int = 512,
                       interpret: bool = False) -> jnp.ndarray:
    """x (N, 3) world coords -> raw SDF channel (N,)."""
    meta = nffb_packed["meta"]
    N = x.shape[0]
    n_pad = _round_up(max(N, tile), tile)
    packed_in = pack_input(embedder, p_embed, x)
    x_pad = jnp.zeros((n_pad, 128), dtype=jnp.float32)
    x_pad = x_pad.at[:N].set(packed_in)

    d_in_pad = mlp_packed["w_in"].shape[0]
    n_mid = mlp_packed["w_mid"].shape[0]
    skip_cols = hidden - d_in
    perm = np.zeros((d_in_pad, hidden), dtype=np.float32)
    perm[np.arange(d_in), skip_cols + np.arange(d_in)] = 1.0
    skip_perm = jnp.asarray(perm, dtype=jnp.bfloat16)

    Wp = meta["Wp"]
    kernel = partial(_kernel, meta=meta, skip_cols=skip_cols, n_mid=n_mid)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(meta["n_lin"], Wp, Wp),
            full(meta["n_lin"], Wp),
            full(Wp, Wp),
            full(Wp),
            full(Wp, Wp),
            full(Wp),
            full(meta["used"], 128, Wp),
            full(Wp),
            full(Wp),
            full(128, d_in_pad),
            full(Wp, d_in_pad),
            full(d_in_pad, hidden),
            full(hidden),
            full(n_mid, hidden, hidden),
            full(n_mid, hidden),
            full(hidden, 128),
            full(128),
            full(d_in_pad, hidden),
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * hidden * (d_in_pad + n_mid * hidden + 128)
            + 2 * n_pad * Wp * Wp * (meta["n_lin"] + meta["used"] + 1),
            bytes_accessed=n_pad * 256 * 4,
            transcendentals=n_pad * (hidden * (n_mid + 1) + 4 * Wp),
        ),
    )(x_pad, nffb_packed["trunk_w"], nffb_packed["trunk_b"],
      nffb_packed["out_w"], nffb_packed["out_b"], nffb_packed["style_w"],
      nffb_packed["style_b"], nffb_packed["sel"], nffb_packed["sin_mask"],
      nffb_packed["cos_mask"], nffb_packed["in_place"],
      nffb_packed["acc_shift"], mlp_packed["w_in"], mlp_packed["b_in"],
      mlp_packed["w_mid"], mlp_packed["b_mid"], mlp_packed["w_out"],
      mlp_packed["b_out"], skip_perm)
    return out[:N, 0]
