"""Fused NFFB-encoder+SDF-MLP kernel vs the jnp path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hashmodnffbanks_idr_tpu.models.networks import ImplicitNetwork
from hashmodnffbanks_idr_tpu.ops import fused_mlp as fm
from hashmodnffbanks_idr_tpu.ops import fused_nffb as fn


def make_net(style=True, n_levels=6):
    return ImplicitNetwork(
        feature_vector_size=256, d_in=3, d_out=1,
        dims=[512] * 8, geometric_init=True, bias=0.6, skip_in=[4],
        weight_norm=True, multires=n_levels,
        embed_type="StyleModNFFB" if style else "FFB",
        log2_max_hash_size=5, max_points_per_entry=2, base_resolution=16,
        desired_resolution=512, bound=0.45,
    )


@pytest.mark.parametrize("style", [True, False])
def test_fused_nffb_matches_reference_path(style):
    net = make_net(style)
    assert fn.supports_nffb_fusion(net.embedder, net.dims, net.skip_in)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (96, 3), minval=-0.4, maxval=0.4)

    want = np.asarray(net.sdf(params, x))

    packed = fm.pack_params(params["lin"], net.dims[0], net.dims[1])
    nffb_packed = fn.pack_nffb(net.embedder, params["embed"],
                               d_in_pad=packed["w_in"].shape[0],
                               hidden=net.dims[1])
    raw = fn.fused_nffb_sdf_raw(x, net.embedder, params["embed"], nffb_packed,
                                packed, net.dims[0], net.dims[1], interpret=True)
    dens = net.density.apply(params["density"], raw)
    got = np.asarray(jnp.tanh(raw / (2.0 + dens)))

    np.testing.assert_allclose(got, want, rtol=0, atol=3e-2)
    big = np.abs(want) > 5e-2
    assert (np.sign(got[big]) == np.sign(want[big])).all()


def test_embedder_intermediate_matches():
    """The packed-input + selection-matrix encoder reproduces the jnp NFFB
    embedding (pre-MLP) to bf16 tolerance."""
    net = make_net(True)
    params = net.init(jax.random.PRNGKey(0))
    e = net.embedder
    x = jax.random.uniform(jax.random.PRNGKey(2), (64, 3), minval=-0.4, maxval=0.4)

    want = np.asarray(e.apply(params["embed"], x))  # (N, 59)

    # recreate the kernel's encoder math in jnp from the packed constants
    packed = fn.pack_nffb(e, params["embed"], d_in_pad=128, hidden=512)
    x_all = np.asarray(fn.pack_input(e, params["embed"], x))
    meta = packed["meta"]
    W, Wp, used, w0 = meta["W"], meta["Wp"], meta["used"], meta["w0"]
    lane = (np.arange(Wp) < W).astype(np.float32)
    sin_m = np.asarray(packed["sin_mask"])
    cos_m = np.asarray(packed["cos_mask"])
    tw = np.asarray(packed["trunk_w"], dtype=np.float32)
    tb = np.asarray(packed["trunk_b"])

    trunk = np.sin(w0 * (x_all @ tw[0] + tb[0])) * lane
    s_acc = np.zeros((64, Wp), dtype=np.float32)
    for layer in range(1, meta["n_lin"]):
        trunk = np.sin(w0 * (trunk @ tw[layer] + tb[layer])) * lane
        lv = layer - 1
        if lv < used:
            pre = x_all @ np.asarray(packed["sel"][lv], dtype=np.float32)
            emb = (pre * (1 - sin_m - cos_m) + np.sin(pre) * sin_m
                   + np.cos(pre) * cos_m) * lane
            if meta["style"]:
                mod = (emb @ np.asarray(packed["style_w"], dtype=np.float32)
                       + np.asarray(packed["style_b"])) * lane
                mean = mod.sum(-1, keepdims=True) / W
                var = (((mod - mean) * lane) ** 2).sum(-1, keepdims=True) / W
                emb = (mod - mean) * lane / np.sqrt(var + 1e-5)
            s_acc += emb + trunk
    acc = ((s_acc @ np.asarray(packed["out_w"], dtype=np.float32)
            + used * np.asarray(packed["out_b"])) / meta["grid_levels"]) * lane

    got = np.concatenate([x_all[:, :3], acc[:, :W]], axis=-1)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-2)
