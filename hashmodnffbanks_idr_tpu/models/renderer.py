"""IDRNetwork — the full differentiable render pass.

TPU-native re-design of code/model/implicit_differentiable_renderer.py:225-329.

Key departures from the reference (same math, static shapes):
  * all R = B*P rays keep lanes end-to-end; boolean gathers become
    `jnp.where` masks (surface/miss handling is masked, not indexed);
  * the tracer runs on a gradient-stopped copy of the params (the reference's
    `torch.no_grad()` block, impl..._renderer.py:256-260);
  * one batched vjp supplies the spatial SDF gradients for *both* the
    (detached) surface normals and the eikonal samples: the reference
    evaluates gradient() at [surface_points, uniform_eik, detached pixel
    points] (impl..._renderer.py:276-291); the surface and pixel groups share
    coordinates, so we evaluate at [stop_grad(points), uniform_eik] once and
    reuse;
  * the sample-network division is guarded on masked rays so no NaNs reach
    the backward pass through `where`.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config.hocon import Config
from ..geometry.cameras import get_camera_params
from .networks import ImplicitNetwork, RenderingNetwork
from .ray_tracing import RayTracerConfig, ray_trace
from .sample_network import sample_network


class IDRNetwork:
    def __init__(self, conf: Config):
        self.feature_vector_size = conf.get_int("feature_vector_size")
        implicit_kwargs = dict(conf.get_config("implicit_network").data)
        emb = conf.get_config("embedding_network", None)
        if emb is not None:
            implicit_kwargs.update(emb.data)  # impl..._renderer.py:229-233
        self.implicit_network = ImplicitNetwork(self.feature_vector_size, **implicit_kwargs)
        self.rendering_network = RenderingNetwork(
            self.feature_vector_size, **conf.get_config("rendering_network").data
        )
        rt = conf.get_config("ray_tracer").data
        self.ray_tracer = RayTracerConfig(**rt)
        self.object_bounding_sphere = conf.get_float("ray_tracer.object_bounding_sphere")
        # Tracer SDF precision (model.tracer_fast):
        #   'mixed' (default) — guidance queries (march, sweep coarse probes,
        #       first secant iters) run the bf16 MXU fast path; decision
        #       queries (sweep fine probes + refined-interval endpoints,
        #       final secant iters, march polish) run exact f32.  Matches the
        #       reference's own precision split: its CUDA encoder casts to
        #       half (hashgridencoder.py:13) but the torch SDF MLP and all
        #       tracer logic run fp32.  Measured on the 400-epoch headtohead
        #       anchor, an all-bf16 tracer costs ~3-5 dB PSNR (RESULTS.md r4).
        #   True/'fast' — everything bf16 (throughput measurements only).
        #   False/'exact' — everything f32 (level-pruned guidance, when the
        #       prune_* conf enables it, runs f32 pruned SDFs).
        # DEFAULT = 'exact' since round 5: the 3-seed 400-epoch anchor A/B
        # (RESULTS.md r5) showed exact beats mixed by +3.0 dB mean PSNR with
        # better Chamfer and half the seed spread, for ~15-25% step cost.
        tf = conf.get("tracer_fast", "exact")
        self.tracer_mode = {True: "fast", False: "exact"}.get(tf, tf)
        assert self.tracer_mode in ("fast", "mixed", "exact"), tf
        self.tracer_fast = self.tracer_mode != "exact"
        # 'exact' on TPU can run the fused-MLP Pallas kernel with f32
        # weights (same math as the XLA path, VMEM-resident chain; see
        # ops/fused_mlp.py).  Off by default until measured on hardware;
        # enable via model.tracer_exact_fused=true (or HMNFFB_EXACT_FUSED=1).
        default_fused = os.environ.get("HMNFFB_EXACT_FUSED", "0") == "1"
        self.tracer_exact_fused = bool(
            conf.get("tracer_exact_fused", default_fused))

    # -- params -----------------------------------------------------------
    def init(self, key) -> Dict[str, Any]:
        k1, k2 = jax.random.split(key)
        return {
            "implicit_network": self.implicit_network.init(k1),
            "rendering_network": self.rendering_network.init(k2),
        }

    # -- forward ----------------------------------------------------------
    def apply(
        self,
        params: Dict[str, Any],
        inputs: Dict[str, jnp.ndarray],
        rng: jax.Array,
        training: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        intrinsics = inputs["intrinsics"]
        uv = inputs["uv"]
        pose = inputs["pose"]
        object_mask = inputs["object_mask"].reshape(-1).astype(bool)

        ray_dirs, cam_loc = get_camera_params(uv, pose, intrinsics)
        B, P, _ = ray_dirs.shape
        R = B * P

        p_impl = params["implicit_network"]
        p_impl_ng = jax.lax.stop_gradient(p_impl)
        on_tpu = jax.default_backend() == "tpu"
        rt_cfg = self.ray_tracer

        def _fast(max_level=None, floor=False):
            # Pallas fused-MLP kernel on TPU; interpret mode elsewhere is
            # slower than the jnp path, so fall back to bf16 jnp off-TPU.
            if on_tpu:
                return self.implicit_network.make_fast_sdf(
                    p_impl_ng, max_level=max_level, floor_interp=floor)
            return lambda x: self.implicit_network.apply(
                p_impl_ng, x, fast=True, max_level=max_level,
                floor_interp=floor)[..., 0]

        def _exact(x):
            return self.implicit_network.sdf(p_impl_ng, x)

        def _pruned_f32(K, fi):
            """Level-pruned guidance SDF on the exact (f32) path — pruning
            approximates guidance only; decisions stay exact, so this keeps
            the pruned presets' speedup in 'exact' tracer mode."""
            if on_tpu and self.tracer_exact_fused:
                return self.implicit_network.make_fast_sdf(
                    p_impl_ng, max_level=K, floor_interp=fi, precision="f32")
            return lambda x: self.implicit_network.apply(
                p_impl_ng, x, fast=False, max_level=K, floor_interp=fi)[..., 0]

        def _build_guidance(base=None, precision="bf16"):
            """march/coarse guidance: hash-level-pruned SDFs per the prune_*
            conf when the embedder supports it, else ``base``."""
            prune = (rt_cfg.prune_levels_march > 0
                     or rt_cfg.prune_levels_coarse > 0)
            mk = _fast if precision == "bf16" else _pruned_f32
            fns, guide = {}, {}
            if prune and self.implicit_network.supports_level_pruning():
                fi = rt_cfg.prune_floor_interp
                for key, K in (("march", rt_cfg.prune_levels_march),
                               ("coarse", rt_cfg.prune_levels_coarse)):
                    if K > 0:
                        guide[key] = fns.setdefault(K, mk(K, fi))
                    elif base is not None:
                        guide[key] = base
            elif base is not None:
                guide = {"march": base, "coarse": base}
            if guide and rt_cfg.prune_secant_iters > 0:
                guide["secant"] = guide.get("coarse") or guide.get("march")
            return guide or None

        if self.tracer_mode == "exact":
            if on_tpu and self.tracer_exact_fused:
                # f32 fused kernel: same math as _exact, VMEM-resident MLP
                sdf_fast = self.implicit_network.make_fast_sdf(
                    p_impl_ng, precision="f32")
            else:
                sdf_fast = _exact
            sdf_guidance = _build_guidance(precision="f32")
        elif self.tracer_mode == "fast":
            sdf_fast = _fast()
            sdf_guidance = _build_guidance()
        else:  # mixed: bf16 guidance, f32 decisions
            sdf_fast = _exact
            sdf_guidance = _build_guidance(base=_fast())

        rng_trace, rng_eik = jax.random.split(rng)
        trace = ray_trace(
            self.ray_tracer, sdf_fast,
            jax.lax.stop_gradient(cam_loc), object_mask,
            jax.lax.stop_gradient(ray_dirs), rng_trace, training=training,
            sdf_guidance=sdf_guidance,
        )
        points_tr = jax.lax.stop_gradient(trace.points)
        network_object_mask = trace.network_object_mask
        dists = jax.lax.stop_gradient(trace.dists)

        # re-derive points so pose gradients flow (impl..._renderer.py:262)
        cam_flat = jnp.repeat(cam_loc[:, None, :], P, axis=1).reshape(R, 3)
        dirs_flat = ray_dirs.reshape(R, 3)
        points = cam_flat + dists[:, None] * dirs_flat

        sdf_output = self.implicit_network.apply(p_impl, points)[:, 0:1]

        if training:
            surface_mask = network_object_mask & object_mask

            # eikonal samples (impl..._renderer.py:276-284)
            n_eik = R // 2
            eik_bb = self.object_bounding_sphere
            eik_points = jax.random.uniform(
                rng_eik, (n_eik, 3), minval=-eik_bb, maxval=eik_bb, dtype=points.dtype
            )
            x_g = jnp.concatenate([jax.lax.stop_gradient(points), eik_points], axis=0)
            g = self.implicit_network.gradient(p_impl, x_g)
            surface_points_grad = jax.lax.stop_gradient(g[:R])
            grad_theta = jnp.concatenate([g[R:], g[:R]], axis=0)

            surface_sdf_values = jax.lax.stop_gradient(sdf_output)
            differentiable_points = sample_network(
                sdf_output, surface_sdf_values, surface_points_grad,
                dists[:, None], cam_flat, dirs_flat, valid_mask=surface_mask,
            )
        else:
            surface_mask = network_object_mask
            differentiable_points = points
            grad_theta = None

        view = -dirs_flat
        rgb_raw = self._get_rgb_value(params, differentiable_points, view)
        rgb_values = jnp.where(surface_mask[:, None], rgb_raw,
                               jnp.ones_like(rgb_raw))  # miss -> white (impl..._renderer.py:306)

        out = {
            "points": points,
            "rgb_values": rgb_values,
            "sdf_output": sdf_output,
            "network_object_mask": network_object_mask,
            "object_mask": object_mask,
            "dists": dists,
        }
        if training:
            out["grad_theta"] = grad_theta
        return out

    def _get_rgb_value(self, params, points, view_dirs):
        """impl..._renderer.py:321-329: normals from the SDF gradient feed the
        appearance net together with the 256-d feature vector."""
        p_impl = params["implicit_network"]
        output = self.implicit_network.apply(p_impl, points)
        normals = self.implicit_network.gradient(p_impl, points)
        feature_vectors = output[:, 1:]
        return self.rendering_network.apply(
            params["rendering_network"], points, normals, view_dirs, feature_vectors
        )
