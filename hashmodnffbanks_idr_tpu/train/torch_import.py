"""Torch-checkpoint importer: reference .pth state_dicts -> our param pytree.

The reference saves checkpoints as
``{"epoch": N, "model_state_dict": model.state_dict()}`` (idr_train.py:182-209)
into ModelParameters/, and trainable cameras as
``{"epoch": N, "pose_vecs_state_dict": {"weight": (n_images, 7)}}`` into
CamParameters/.  This module maps those tensors into this framework's
pytrees so a reference-trained model renders here unchanged — the basis of
the full-model golden test (tests/test_full_model_golden.py) and of
migrating real experiments.

Key layout of the reference model (implicit_differentiable_renderer.py):
  implicit_network.lin{0..}.{weight_v,weight_g,bias}   (weight-norm Linear)
  implicit_network.dencity_net.beta                     (LaplaceDensity)
  implicit_network.embed_model.embedder_obj.*           (encoder, per type)
  rendering_network.lin{0..}.{weight_v,weight_g,bias}
  rendering_network.embed_model.embedder_obj.*          (deep view encoders)

Torch Linear stores weight (out, in); ours is (in, out) — transposed here.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax.numpy as jnp


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth into {key: np.ndarray} (CPU, no grad state)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "pose_vecs_state_dict"):
        if isinstance(blob, dict) and key in blob:
            blob = blob[key]
            break
    return {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
            for k, v in blob.items()}


def import_pose_vecs(sd: Dict[str, np.ndarray]) -> jnp.ndarray:
    """CamParameters checkpoint -> (n_images, 7) quaternion+translation."""
    return jnp.asarray(sd["weight"], dtype=jnp.float32)


def _import_linear(sd, prefix: str, ours: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    if "v" in ours:
        out["v"] = jnp.asarray(sd[prefix + ".weight_v"].T)
        out["g"] = jnp.asarray(sd[prefix + ".weight_g"].reshape(-1))
        out["b"] = jnp.asarray(sd[prefix + ".bias"])
    else:
        out["w"] = jnp.asarray(sd[prefix + ".weight"].T)
        out["b"] = jnp.asarray(sd[prefix + ".bias"])
    return out


def _import_torch_hashgrid(sd, prefix: str, embedder, p_grid):
    """MultiResHashGridMLP levels.{l}.embedding.weight -> packed table."""
    from ..ops import hashgrid as hg

    spec = embedder.spec
    offs = spec.offsets()
    was_pages = hg.table_is_pages(p_grid["table"], spec)
    table = np.asarray(hg.as_rows(p_grid["table"], spec)).copy()
    for l in range(spec.num_levels):
        w = sd[f"{prefix}.levels.{l}.embedding.weight"]
        table[offs[l]:offs[l] + len(w)] = w
    new_table = jnp.asarray(table)
    if was_pages:
        new_table = hg.pack_pages(new_table)
    out = dict(p_grid, table=new_table)
    if embedder.ff is not None:
        out["ff"] = {"B": jnp.asarray(sd[f"{prefix}.freq_encoding.B"])}
    return out


def _import_embedder(sd, prefix: str, embedder, p_embed):
    """Dispatch on our embedder class; returns the new embed param subtree."""
    from ..models import embedders as emb

    if embedder is None or p_embed is None:
        return p_embed
    if isinstance(embedder, emb.FourierFeatureEmbedder):
        return {"B": jnp.asarray(sd[prefix + ".B"])}
    if isinstance(embedder, emb.HashGridTorchEmbedder):
        return _import_torch_hashgrid(sd, prefix, embedder, p_embed)
    if isinstance(embedder, emb.NFFBEmbedder):
        out = dict(p_embed)
        if embedder.grid_backend == "torch":
            out["grid"] = _import_torch_hashgrid(
                sd, prefix + ".grid_enc", embedder.grid, p_embed["grid"])
        for l in range(embedder.n_nffb_layers - 1):
            out["ff_lin"] = list(out["ff_lin"])
            out["ff_lin"][l] = _import_linear(
                sd, f"{prefix}.ff_lin{l}", p_embed["ff_lin"][l])
        out["out_layer"] = _import_linear(
            sd, prefix + ".out_layer", p_embed["out_layer"])
        if embedder.style_modulation:
            out["style"] = {
                "linear_transform": _import_linear(
                    sd, prefix + ".StyleAttentionBlock.linear_transform",
                    p_embed["style"]["linear_transform"]),
                "attention": _import_linear(
                    sd, prefix + ".StyleAttentionBlock.attention",
                    p_embed["style"]["attention"]),
            }
        return out
    # parameter-free encoders (posenc / SH) or unknown: leave as initialized
    return p_embed


def import_model_state(sd: Dict[str, np.ndarray], model,
                       params: Dict[str, Any]) -> Dict[str, Any]:
    """Reference IDRNetwork state_dict -> our IDRNetwork param pytree.

    ``model`` is our models.renderer.IDRNetwork (for architecture metadata);
    ``params`` a freshly-initialized pytree whose leaves define shapes.
    """
    impl = model.implicit_network
    rend = model.rendering_network
    new_impl: Dict[str, Any] = dict(params["implicit_network"])
    new_impl["lin"] = [
        _import_linear(sd, f"implicit_network.lin{l}", p)
        for l, p in enumerate(params["implicit_network"]["lin"])
    ]
    if "implicit_network.dencity_net.beta" in sd:
        new_impl["density"] = {
            "beta": jnp.asarray(sd["implicit_network.dencity_net.beta"].reshape(()))}
    if impl.embedder is not None and "embed" in params["implicit_network"]:
        new_impl["embed"] = _import_embedder(
            sd, "implicit_network.embed_model.embedder_obj", impl.embedder,
            params["implicit_network"]["embed"])

    new_rend: Dict[str, Any] = dict(params["rendering_network"])
    new_rend["lin"] = [
        _import_linear(sd, f"rendering_network.lin{l}", p)
        for l, p in enumerate(params["rendering_network"]["lin"])
    ]
    if rend.view_embedder is not None and "view_embed" in params["rendering_network"]:
        new_rend["view_embed"] = _import_embedder(
            sd, "rendering_network.embed_model.embedder_obj",
            rend.view_embedder, params["rendering_network"]["view_embed"])

    return {"implicit_network": new_impl, "rendering_network": new_rend}


def import_checkpoint(path: str, model, params: Dict[str, Any]) -> Dict[str, Any]:
    """Convenience: load a ModelParameters .pth and import it."""
    return import_model_state(load_pth(path), model, params)
