"""Static-shape masked sphere tracing + sampler + secant root finding.

TPU-native re-design of code/model/ray_tracing.py:5-298.  The reference
gathers "surviving" rays with boolean indexing and Python `while True` loops;
on TPU every ray keeps a static lane and carries live/converged masks, the
outer loops are `lax.while_loop`s with an (all-converged | max-iters)
predicate, and updates are `jnp.where`-masked.  Wasted lanes are cheap on the
VPU/MXU and keep all shapes static for XLA.

The whole tracer runs under stop_gradient (the caller re-evaluates the SDF
with AD at the found points, mirroring impl..._renderer.py:256-264), so the
``sdf`` callable passed in may use the fast non-differentiable path (bf16 /
Pallas fused kernels).

All semantics match the reference step-for-step:
  * bidirectional sphere tracing with line-search backstep
    (ray_tracing.py:98-187),
  * uniform sampler + first-sign-flip argmin trick + secant refinement
    (ray_tracing.py:189-268),
  * minimal-SDF fallback points for non-surface rays with *random* steps
    (ray_tracing.py:270-297),
  * sphere projection of rays that miss the bounding sphere entirely
    (ray_tracing.py:77-82).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.cameras import get_sphere_intersection


class RayTracerConfig(NamedTuple):
    object_bounding_sphere: float = 1.0
    sdf_threshold: float = 5.0e-5
    line_search_step: float = 0.5
    line_step_iters: int = 1
    sphere_tracing_iters: int = 10
    n_steps: int = 100
    n_secant_steps: int = 8
    # Evaluate the n_steps sweep grid hierarchically (coarse probes + refined
    # intervals) instead of densely — ~2.8x fewer SDF evaluations on the
    # step's dominant stage with grid-index-exact first-flip/secant semantics
    # (see _hierarchical_sweep).  Dense fallback when n_steps has no suitable
    # coarse stride.
    hierarchical_sweep: bool = True
    # --- level-pruned guidance (large-table hash-grid presets) ------------
    # The tracer's *guidance* queries (sphere-trace march, sweep coarse
    # probes) don't need full encoder accuracy: with prune_levels_march /
    # prune_levels_coarse = K > 0 they run an SDF whose hash encode gathers
    # only the K coarsest levels (pruned levels filled with their table
    # means, ops/hashgrid.py:level_means).  *Decision* queries — sweep fine
    # probes, the first-flip interval endpoints (re-evaluated, see
    # _hierarchical_sweep), secant, everything differentiable — stay exact.
    # After the pruned march, prune_march_polish_iters full-SDF iterations
    # re-march rays whose pruned convergence (|sdf_pruned| < prune_march_tau)
    # was premature.  0/0 disables pruning entirely (default — golden-exact).
    prune_levels_march: int = 0
    prune_levels_coarse: int = 0
    prune_march_polish_iters: int = 3
    prune_march_tau: float = 5.0e-3
    # Guidance SDFs gather only the floor corner per level (1 instead of 2^D
    # gathers) — cheaper than level pruning alone and keeps all frequency
    # bands; combine with prune_levels_* = num_levels to get floor-only
    # guidance.  Applies to every guidance query.
    prune_floor_interp: bool = True
    # First m secant iterations use the guidance SDF (brackets re-tighten on
    # the exact SDF in the remaining iterations).  0 = all-exact secant.
    prune_secant_iters: int = 0


def _sweep_stride(n: int, pruned_coarse: bool = False):
    """Coarse stride s with (n-1) % s == 0 so coarse probes sit ON the dense
    grid and every interval has exactly s-1 interior grid points.

    When the coarse probes run on the pruned guidance SDF their per-probe
    cost drops ~2.5x, which flips the optimal stride to the smallest one:
    many cheap coarse probes + tiny full-accuracy refined intervals."""
    cands = (9, 8, 10, 7, 11, 6, 12, 5, 4, 3)
    valid = [s for s in cands if n > 2 * s and (n - 1) % s == 0]
    if not valid:
        return None
    if pruned_coarse:
        # minimize pruned-coarse + full-fine cost (c_pruned ~ 0.4)
        return min(valid, key=lambda s: ((n - 1) // s + 1) * 0.4 + 3 * (s - 1))
    return valid[0]


class TraceResult(NamedTuple):
    points: jnp.ndarray           # (R, 3) surface / fallback points
    network_object_mask: jnp.ndarray  # (R,) bool
    dists: jnp.ndarray            # (R,)


def ray_trace(
    cfg: RayTracerConfig,
    sdf: Callable[[jnp.ndarray], jnp.ndarray],
    cam_loc: jnp.ndarray,        # (B, 3)
    object_mask: jnp.ndarray,    # (R,) bool, R = B*P
    ray_directions: jnp.ndarray,  # (B, P, 3)
    rng: jax.Array,
    training: bool = True,
    sdf_guidance=None,           # {'march': fn, 'coarse': fn} pruned SDFs
) -> TraceResult:
    """Full tracer (ray_tracing.py:26-95), flattened to R = B*P rays.

    ``sdf_guidance`` supplies level-pruned approximate SDFs for the guidance
    stages enabled in ``cfg`` (see RayTracerConfig.prune_*); None entries /
    None fall back to the exact ``sdf`` everywhere."""
    B, P, _ = ray_directions.shape
    R = B * P
    guide = sdf_guidance or {}
    sdf_march = guide.get("march")
    sdf_coarse = guide.get("coarse")
    sdf_secant = guide.get("secant") if cfg.prune_secant_iters > 0 else None

    sphere_int, mask_intersect = get_sphere_intersection(
        cam_loc, ray_directions, r=cfg.object_bounding_sphere
    )
    cam_flat = jnp.repeat(cam_loc[:, None, :], P, axis=1).reshape(R, 3)
    dirs_flat = ray_directions.reshape(R, 3)
    near = sphere_int.reshape(R, 2)[:, 0]
    far = sphere_int.reshape(R, 2)[:, 1]
    mask_intersect = mask_intersect.reshape(R)

    (curr_start_points, unfinished_mask_start, acc_start_dis, acc_end_dis,
     min_dis, max_dis) = _sphere_tracing(cfg, sdf, cam_flat, dirs_flat,
                                         mask_intersect, near, far,
                                         sdf_march=sdf_march)

    network_object_mask = acc_start_dis < acc_end_dis

    # The dense 100-sample sweep serves two DISJOINT ray subsets (the
    # reference runs two separate sweeps, ray_tracing.py:49 and :89):
    #   * sampler rays (tracing didn't converge): linspace over
    #     [acc_start, acc_end] + secant refinement,
    #   * miss rays (converged but no surface / masked out, training only):
    #     random steps over [min_dis, max_dis], min-SDF point.
    # One fused sweep evaluates each ray at the interval its consumer needs —
    # identical semantics at half the SDF evaluations.
    sampler_mask = unfinished_mask_start
    n = cfg.n_steps
    min_dis_eff = jnp.where(network_object_mask & ~object_mask, acc_start_dis, min_dis)
    t0 = jnp.where(sampler_mask, acc_start_dis, min_dis_eff)
    t1 = jnp.where(sampler_mask, acc_end_dis, max_dis)

    # Cheap-coarse stride model: pick the small stride (many cheap coarse
    # probes + narrow exact refined intervals) when the coarse guide is
    # genuinely cheaper than the decision SDF — level-pruned gathers
    # anywhere, or the bf16 MXU fast path on TPU ('mixed' mode).  Off-TPU
    # the bf16 jnp fallback costs about the same as f32, so the small-stride
    # flip would ~triple coarse probe count for nothing (ADVICE r4).
    pruned_coarse = sdf_coarse is not None and (
        cfg.prune_levels_coarse > 0 or jax.default_backend() == "tpu")
    stride = (_sweep_stride(n, pruned_coarse=pruned_coarse)
              if cfg.hierarchical_sweep else None)
    if stride is None:
        # dense sweep — every grid point evaluated (reference ray_tracing.py:
        # 204-208 and :277 exactly)
        lin01 = jnp.linspace(0.0, 1.0, n, dtype=cam_flat.dtype)
        rand01 = jax.random.uniform(rng, (n,), dtype=cam_flat.dtype)
        u = jnp.where(sampler_mask[:, None], lin01[None, :], rand01[None, :])
        pts_intervals = t0[:, None] + u * (t1 - t0)[:, None]
        points = cam_flat[:, None, :] + pts_intervals[..., None] * dirs_flat[:, None, :]
        sdf_val = sdf(points.reshape(-1, 3)).reshape(R, n)
        idx_grid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (R, n))
        exact_mask = None
    else:
        idx_grid, pts_intervals, points, sdf_val, exact_mask = _hierarchical_sweep(
            cfg, sdf, cam_flat, dirs_flat, sampler_mask, t0, t1, rng, stride,
            sdf_coarse=sdf_coarse,
        )

    sampler_pts, sampler_net_obj_mask, sampler_dists = _ray_sampler(
        cfg, sdf, cam_flat, dirs_flat, object_mask,
        idx_grid, points, pts_intervals, sdf_val, sampler_mask, training,
        sdf_guide=sdf_secant, exact_mask=exact_mask,
    )
    curr_start_points = jnp.where(sampler_mask[:, None], sampler_pts, curr_start_points)
    acc_start_dis = jnp.where(sampler_mask, sampler_dists, acc_start_dis)
    network_object_mask = jnp.where(sampler_mask, sampler_net_obj_mask, network_object_mask)

    if not training:
        return TraceResult(curr_start_points, network_object_mask, acc_start_dis)

    # Training-only handling of rays that miss (ray_tracing.py:71-92).
    in_mask = ~network_object_mask & object_mask & ~sampler_mask
    out_mask = ~object_mask & ~sampler_mask

    # Rays that never hit the sphere: project camera origin onto the ray's
    # closest-to-origin point (ray_tracing.py:77-82).
    mask_left_out = (in_mask | out_mask) & ~mask_intersect
    proj_dis = -jnp.einsum("rd,rd->r", dirs_flat, cam_flat)
    proj_pts = cam_flat + proj_dis[:, None] * dirs_flat
    acc_start_dis = jnp.where(mask_left_out, proj_dis, acc_start_dis)
    curr_start_points = jnp.where(mask_left_out[:, None], proj_pts, curr_start_points)

    # Rays that hit the sphere but no surface: min-SDF point on the ray
    # (ray_tracing.py:84-92) — reuses the fused sweep's random-step rows.
    mask = (in_mask | out_mask) & mask_intersect
    min_idx = jnp.argmin(sdf_val, axis=-1)
    min_pts = jnp.take_along_axis(points, min_idx[:, None, None], axis=1)[:, 0]
    min_d = jnp.take_along_axis(pts_intervals, min_idx[:, None], axis=1)[:, 0]
    curr_start_points = jnp.where(mask[:, None], min_pts, curr_start_points)
    acc_start_dis = jnp.where(mask, min_d, acc_start_dis)

    return TraceResult(curr_start_points, network_object_mask, acc_start_dis)


# ---------------------------------------------------------------------------
# sphere tracing (ray_tracing.py:98-187)
# ---------------------------------------------------------------------------

def _sphere_tracing(cfg, sdf, cam, dirs, mask_intersect, near, far,
                    sdf_march=None):
    """Bidirectional march.  With ``sdf_march`` (level-pruned guidance SDF):
    phase A marches the full iteration budget on the cheap pruned SDF to a
    loose tolerance (prune_march_tau), then phase B re-marches with the exact
    SDF for prune_march_polish_iters — rays whose pruned convergence was
    premature are re-activated by the resume re-initialization."""
    if sdf_march is not None:
        st_a = _march(cfg, sdf_march, cam, dirs, mask_intersect, near, far,
                      iters=cfg.sphere_tracing_iters,
                      threshold=cfg.prune_march_tau)
        return _march(cfg, sdf, cam, dirs, mask_intersect, near, far,
                      iters=cfg.prune_march_polish_iters,
                      threshold=cfg.sdf_threshold,
                      resume=(st_a[2], st_a[3]))
    return _march(cfg, sdf, cam, dirs, mask_intersect, near, far,
                  iters=cfg.sphere_tracing_iters, threshold=cfg.sdf_threshold)


def _march(cfg, sdf, cam, dirs, mask_intersect, near, far, *, iters,
           threshold, resume=None):
    R = cam.shape[0]

    min_dis = jnp.where(mask_intersect, near, 0.0)
    max_dis = jnp.where(mask_intersect, far, 0.0)
    if resume is None:
        unfin_s0 = mask_intersect
        unfin_e0 = mask_intersect
        acc_s0 = min_dis
        acc_e0 = max_dis
    else:
        # phase-B resume: continue from phase A's accumulated distances; a
        # ray stays (or becomes again) live iff it still has interval left —
        # the exact-SDF re-evaluation below then re-checks its convergence
        acc_s0, acc_e0 = resume
        live = mask_intersect & (acc_s0 < acc_e0)
        unfin_s0 = live
        unfin_e0 = live

    pts_s0 = cam + acc_s0[:, None] * dirs
    pts_e0 = cam + acc_e0[:, None] * dirs
    curr_pts0 = jnp.where(unfin_s0[:, None], pts_s0, 0.0)

    def sdf2(pa, pb):
        """One batched SDF call for the start+end ray families — halves the
        number of sequential kernel launches in the tracing loop."""
        v = sdf(jnp.concatenate([pa, pb], axis=0))
        return v[: pa.shape[0]], v[pa.shape[0]:]

    s0, e0 = sdf2(pts_s0, pts_e0)
    next_s0 = jnp.where(unfin_s0, s0, 0.0)
    next_e0 = jnp.where(unfin_e0, e0, 0.0)

    def clamp(v):
        return jnp.where(v <= threshold, 0.0, v)

    # reference loop head: derive curr from next, clamp, update masks
    curr_s0 = clamp(jnp.where(unfin_s0, next_s0, 0.0))
    curr_e0 = clamp(jnp.where(unfin_e0, next_e0, 0.0))
    unfin_s0 = unfin_s0 & (curr_s0 > threshold)
    unfin_e0 = unfin_e0 & (curr_e0 > threshold)

    State = tuple

    def cond(st: State):
        it, unfin_s, unfin_e, *_ = st
        return (it < iters) & (jnp.any(unfin_s) | jnp.any(unfin_e))

    def body(st: State):
        (it, unfin_s, unfin_e, acc_s, acc_e, curr_s, curr_e, curr_pts) = st

        # step (ray_tracing.py:148-155)
        acc_s = acc_s + curr_s
        acc_e = acc_e - curr_e
        pts_s = cam + acc_s[:, None] * dirs
        pts_e = cam + acc_e[:, None] * dirs

        sv, ev = sdf2(pts_s, pts_e)
        next_s = jnp.where(unfin_s, sv, 0.0)
        next_e = jnp.where(unfin_e, ev, 0.0)

        # line-search backstep for overshoot (ray_tracing.py:164-183)
        def ls_cond(ls):
            k, not_ps, not_pe, *_ = ls
            return (k < cfg.line_step_iters) & (jnp.any(not_ps) | jnp.any(not_pe))

        def ls_body(ls):
            k, not_ps, not_pe, acc_s, acc_e, next_s, next_e = ls
            step = (1.0 - cfg.line_search_step) / (2.0**k)
            acc_s = jnp.where(not_ps, acc_s - step * curr_s, acc_s)
            acc_e = jnp.where(not_pe, acc_e + step * curr_e, acc_e)
            p_s = cam + acc_s[:, None] * dirs
            p_e = cam + acc_e[:, None] * dirs
            sv, ev = sdf2(p_s, p_e)
            next_s = jnp.where(not_ps, sv, next_s)
            next_e = jnp.where(not_pe, ev, next_e)
            return (k + 1, next_s < 0, next_e < 0, acc_s, acc_e, next_s, next_e)

        ls0 = (jnp.int32(0), next_s < 0, next_e < 0, acc_s, acc_e, next_s, next_e)
        _, _, _, acc_s, acc_e, next_s, next_e = jax.lax.while_loop(ls_cond, ls_body, ls0)

        unfin_s = unfin_s & (acc_s < acc_e)
        unfin_e = unfin_e & (acc_s < acc_e)

        # loop head of the next iteration (ray_tracing.py:131-142)
        curr_s = jnp.where(unfin_s, next_s, 0.0)
        curr_s = jnp.where(curr_s <= threshold, 0.0, curr_s)
        curr_e = jnp.where(unfin_e, next_e, 0.0)
        curr_e = jnp.where(curr_e <= threshold, 0.0, curr_e)
        unfin_s = unfin_s & (curr_s > threshold)
        unfin_e = unfin_e & (curr_e > threshold)

        curr_pts = cam + acc_s[:, None] * dirs
        return (it + 1, unfin_s, unfin_e, acc_s, acc_e, curr_s, curr_e, curr_pts)

    st = (jnp.int32(0), unfin_s0, unfin_e0, acc_s0, acc_e0, curr_s0, curr_e0, curr_pts0)
    (_, unfin_s, unfin_e, acc_s, acc_e, _, _, curr_pts) = jax.lax.while_loop(cond, body, st)

    return curr_pts, unfin_s, acc_s, acc_e, min_dis, max_dis


# ---------------------------------------------------------------------------
# sweep sampler + secant (ray_tracing.py:189-268)
# ---------------------------------------------------------------------------

def _hierarchical_sweep(cfg, sdf, cam, dirs, sampler_mask, t0, t1, rng, stride,
                        sdf_coarse=None):
    """Evaluate the n_steps linspace grid hierarchically.

    Coarse pass: probes at grid indices {0, s, 2s, ..., n-1} (exactly on the
    dense grid since (n-1) % s == 0).  Fine pass: the s-1 interior grid points
    of three coarse intervals — the first sign-flip interval plus both
    intervals around the coarse argmin (which catches crossings whose coarse
    endpoints are both positive).  The evaluated subset always contains the
    first-negative grid index AND its grid predecessor, so the sampler's
    first-flip + secant-bracket outputs equal the dense sweep's whenever the
    dense first crossing lies in a refined interval — the golden test
    (tests/test_ray_tracer_golden.py) pins this against the reference tracer.

    Rows with sampler_mask=False (the min-SDF fallback, reference
    ray_tracing.py:270-297) use iid uniform probes in both passes — the same
    estimator as the reference's random sweep at n_c + 3(s-1) samples.

    Returns (idx_grid (R, m) int32, t (R, m), points (R, m, 3), sdf (R, m))
    with m = n_c + 3(s-1) ≈ n/3.
    """
    R = cam.shape[0]
    n = cfg.n_steps
    dtype = cam.dtype
    n_c = (n - 1) // stride + 1
    n_f = 3 * (stride - 1)
    rng_c, rng_f = jax.random.split(rng)

    ic = jnp.arange(n_c, dtype=jnp.int32) * stride              # coarse grid idx
    lin01_c = ic.astype(dtype) / (n - 1)
    rand01_c = jax.random.uniform(rng_c, (n_c,), dtype=dtype)   # ray_tracing.py:277
    u_c = jnp.where(sampler_mask[:, None], lin01_c[None, :], rand01_c[None, :])
    t_c = t0[:, None] + u_c * (t1 - t0)[:, None]
    pts_c = cam[:, None, :] + t_c[..., None] * dirs[:, None, :]
    v_c = (sdf_coarse or sdf)(pts_c.reshape(-1, 3)).reshape(R, n_c)

    # choose refined intervals (interval k = grid range (ic[k-1], ic[k]])
    slot = jnp.arange(n_c, dtype=jnp.int32)[None, :]
    first_neg = jnp.min(jnp.where(v_c < 0, slot, n_c), axis=-1)     # (R,)
    k_flip = jnp.clip(first_neg, 1, n_c - 1)
    m_slot = jnp.argmin(v_c, axis=-1).astype(jnp.int32)
    k_min_l = jnp.clip(m_slot, 1, n_c - 1)
    k_min_r = jnp.clip(m_slot + 1, 1, n_c - 1)
    ks = jnp.stack([k_flip, k_min_l, k_min_r], axis=-1)             # (R, 3)

    offs = jnp.arange(1, stride, dtype=jnp.int32)                   # (s-1,)
    idx_f = ((ks - 1) * stride)[..., None] + offs[None, None, :]    # (R, 3, s-1)
    idx_f = idx_f.reshape(R, n_f)
    u_f = jnp.where(
        sampler_mask[:, None],
        idx_f.astype(dtype) / (n - 1),
        jax.random.uniform(rng_f, (n_f,), dtype=dtype)[None, :],
    )
    t_f = t0[:, None] + u_f * (t1 - t0)[:, None]
    pts_f = cam[:, None, :] + t_f[..., None] * dirs[:, None, :]

    exact_mask = None
    if sdf_coarse is not None and sdf_coarse is not sdf:
        # Pruned coarse probes are guidance only: the single exact-SDF fine
        # call also re-evaluates every refined interval's endpoint slots
        # (first-flip interval + both argmin intervals, <= 5 distinct coarse
        # slots) and writes them back into v_c.  Together with the fine
        # interiors, every entry inside a refined interval is then exact, so
        # the sampler's first-flip decision (restricted to exact entries via
        # exact_mask), its secant bracket, and the bracket's predecessor are
        # all full-accuracy.  Interval *choice* stays approximate — bounded
        # by one coarse interval of the dense grid.
        slots_e = jnp.stack([
            k_flip - 1, k_flip,
            jnp.clip(m_slot - 1, 0, n_c - 1), m_slot,
            jnp.clip(m_slot + 1, 0, n_c - 1),
        ], axis=-1)                                                  # (R, 5)
        t_ends = jnp.take_along_axis(t_c, slots_e, axis=1)           # (R, 5)
        p_ends = cam[:, None, :] + t_ends[..., None] * dirs[:, None, :]
        fused = jnp.concatenate([pts_f.reshape(-1, 3),
                                 p_ends.reshape(-1, 3)], axis=0)
        v_fused = sdf(fused)
        v_f = v_fused[: R * n_f].reshape(R, n_f)
        v_ends = v_fused[R * n_f:].reshape(R, 5)
        rows = jnp.arange(R)[:, None]
        v_c = v_c.at[rows, slots_e].set(v_ends)
        # Sign-decision mask: every exact-valued entry may win the first-neg
        # race.  A winner at k_flip-1 / m_slot-1 can have an UNevaluated
        # dense-grid predecessor (its interval was never refined); the
        # sampler's extract() handles that by bracketing against the nearest
        # evaluated predecessor instead of a degenerate index-0 fallback
        # (ADVICE r4).
        exact_c = jnp.zeros((R, n_c), dtype=bool).at[rows, slots_e].set(True)
        exact_mask = jnp.concatenate(
            [exact_c, jnp.ones((R, n_f), dtype=bool)], axis=1)
    else:
        v_f = sdf(pts_f.reshape(-1, 3)).reshape(R, n_f)

    idx_grid = jnp.concatenate(
        [jnp.broadcast_to(ic[None, :], (R, n_c)), idx_f], axis=1)
    t_all = jnp.concatenate([t_c, t_f], axis=1)
    pts_all = jnp.concatenate([pts_c, pts_f], axis=1)
    v_all = jnp.concatenate([v_c, v_f], axis=1)
    return idx_grid, t_all, pts_all, v_all, exact_mask


def _ray_sampler(cfg, sdf, cam, dirs, object_mask, idx_grid, points,
                 pts_intervals, sdf_val, sampler_mask, training,
                 sdf_guide=None, exact_mask=None):
    """Consumes the fused sweep's evaluated probes — (grid index, t, point,
    sdf) tuples, dense or hierarchical; only rows where sampler_mask are
    meaningful (others carry the min-SDF pattern).  ``exact_mask`` marks the
    entries evaluated with the exact SDF in guided mode — sign decisions
    (first-flip / surface-hit) are restricted to them so pruned guidance
    values can never create phantom surface hits."""
    n = cfg.n_steps

    # first NEGATIVE grid index — the reference's sign*rank argmin trick
    # (ray_tracing.py:212-213) selects exactly this; when no sample is
    # negative the reference lands on n-1 (and every consumer of that row is
    # overridden by the p_out branch below, so the value itself is inert).
    BIG = jnp.int32(n)
    neg = sdf_val < 0
    if exact_mask is not None:
        neg = neg & exact_mask
    gneg = jnp.min(jnp.where(neg, idx_grid, BIG), axis=-1)           # (R,)
    net_surface_pts = gneg < BIG
    ind = jnp.where(net_surface_pts, gneg, n - 1)

    def extract(g):
        """Value/t/point at the LARGEST evaluated grid index <= g.

        Exact match whenever g itself was evaluated (always true for `ind`).
        In guided mode the secant's `prev` can land in an unrefined interval
        whose point was never evaluated; falling back to the nearest
        evaluated predecessor keeps the bracket tight instead of degenerating
        to the row's first entry (ADVICE r4)."""
        cand = jnp.where(idx_grid <= g[:, None], idx_grid, jnp.int32(-1))
        j = jnp.argmax(cand, axis=-1)                                # (R,)
        take = lambda a: jnp.take_along_axis(a, j[:, None], axis=1)[:, 0]
        return take(sdf_val), take(pts_intervals), \
            jnp.take_along_axis(points, j[:, None, None], axis=1)[:, 0]

    sdf_at_ind, t_at_ind, sampler_pts = extract(ind)
    sampler_dists = t_at_ind

    # P_out pixels: min-SDF sample (ray_tracing.py:220-226)
    true_surface_pts = object_mask
    p_out_mask = ~(true_surface_pts & net_surface_pts)
    out_j = jnp.argmin(sdf_val, axis=-1)
    out_pts = jnp.take_along_axis(points, out_j[:, None, None], axis=1)[:, 0]
    out_d = jnp.take_along_axis(pts_intervals, out_j[:, None], axis=1)[:, 0]
    sampler_pts = jnp.where(p_out_mask[:, None], out_pts, sampler_pts)
    sampler_dists = jnp.where(p_out_mask, out_d, sampler_dists)

    sampler_net_obj_mask = sampler_mask & net_surface_pts

    # secant (ray_tracing.py:232-247); torch's ind-1 indexing wraps at 0.
    # The bracket's low side is the nearest EVALUATED grid point at or below
    # ind-1 (extract's predecessor semantics): the exact predecessor when ind
    # lies in a refined interval / dense mode, the refined-interval edge or a
    # coarse probe otherwise; ind=0 wraps to n-1 (a coarse probe).
    secant_pts = (net_surface_pts & true_surface_pts) if training else net_surface_pts
    secant_pts = secant_pts & sampler_mask
    prev = (ind - 1) % n
    z_high = t_at_ind
    sdf_high = sdf_at_ind
    sdf_low, z_low, _ = extract(prev)
    z_pred = _secant(cfg, sdf, sdf_low, sdf_high, z_low, z_high, cam, dirs,
                     secant_pts, sdf_guide=sdf_guide)

    sec_points = cam + z_pred[:, None] * dirs
    sampler_pts = jnp.where(secant_pts[:, None], sec_points, sampler_pts)
    sampler_dists = jnp.where(secant_pts, z_pred, sampler_dists)

    return sampler_pts, sampler_net_obj_mask, sampler_dists


def _secant(cfg, sdf, sdf_low, sdf_high, z_low, z_high, cam, dirs, active,
            sdf_guide=None):
    """Fixed n_secant_steps iterations, masked (ray_tracing.py:251-268).

    With ``sdf_guide`` and cfg.prune_secant_iters = m > 0, the first m
    iterations bisect on the cheap guidance SDF; the remaining iterations
    re-tighten the bracket on the exact SDF (every kept bracket endpoint from
    the guide phase is superseded once an exact evaluation lands on its
    side, and z_pred is always recomputed from the current bracket)."""

    def safe_div(a, b):
        return a / jnp.where(jnp.abs(b) < 1e-12, jnp.where(b < 0, -1e-12, 1e-12), b)

    def predict(z_low, sdf_low, z_high, sdf_high):
        # Secant prediction, CLAMPED into the current bracket.  The
        # reference's unclamped formula (ray_tracing.py:253) is safe only
        # under the dense-sweep invariant sdf_low >= 0 > sdf_high (the
        # prediction is then a convex combination of the endpoints).
        # Guided/hierarchical brackets can violate it — a plateau of a
        # floor-interp grid or a guidance value on the wrong side makes
        # sdf_high ~ sdf_low and the raw prediction diverges to ~1e12,
        # overflowing grid positions into inf/NaN weights.  The clamp
        # degrades those rays to a bracket endpoint (bisection-like) and is
        # the identity whenever the reference invariant holds.
        z = -safe_div(sdf_low * (z_high - z_low), sdf_high - sdf_low) + z_low
        return jnp.clip(z, jnp.minimum(z_low, z_high), jnp.maximum(z_low, z_high))

    z_pred = predict(z_low, sdf_low, z_high, sdf_high)

    def make_body(fn):
        def body(_, carry):
            z_low, sdf_low, z_high, sdf_high, z_pred = carry
            p_mid = cam + z_pred[:, None] * dirs
            sdf_mid = jnp.where(active, fn(p_mid), 0.0)
            ind_low = sdf_mid > 0
            z_low = jnp.where(ind_low, z_pred, z_low)
            sdf_low = jnp.where(ind_low, sdf_mid, sdf_low)
            ind_high = sdf_mid < 0
            z_high = jnp.where(ind_high, z_pred, z_high)
            sdf_high = jnp.where(ind_high, sdf_mid, sdf_high)
            z_pred = predict(z_low, sdf_low, z_high, sdf_high)
            return (z_low, sdf_low, z_high, sdf_high, z_pred)
        return body

    carry = (z_low, sdf_low, z_high, sdf_high, z_pred)
    m = min(cfg.prune_secant_iters, cfg.n_secant_steps) if sdf_guide else 0
    if m > 0:
        z_low0, sdf_low0, z_high0, sdf_high0 = z_low, sdf_low, z_high, sdf_high
        carry = jax.lax.fori_loop(0, m, make_body(sdf_guide), carry)
        # Re-validate the guided bracket with ONE fused exact call before the
        # exact phase: a wrong-sign guidance value can move an endpoint past
        # the true root, and the exact iterations can only narrow, never
        # re-expand (ADVICE r4).  Each side keeps its guided position only if
        # the exact SDF confirms its sign invariant (low > 0, high < 0);
        # otherwise it reverts to the pre-guide exact-valued endpoint — the
        # resulting bracket is always exact-valued and contains the crossing
        # the pre-guide bracket did.
        z_low, sdf_low, z_high, sdf_high, z_pred = carry
        p2 = jnp.concatenate(
            [cam + z_low[:, None] * dirs, cam + z_high[:, None] * dirs], axis=0)
        act2 = jnp.concatenate([active, active], axis=0)
        v2 = jnp.where(act2, sdf(p2), 0.0)
        Rn = z_low.shape[0]
        v_lo, v_hi = v2[:Rn], v2[Rn:]
        ok_lo = v_lo > 0
        z_low = jnp.where(ok_lo, z_low, z_low0)
        sdf_low = jnp.where(ok_lo, v_lo, sdf_low0)
        ok_hi = v_hi < 0
        z_high = jnp.where(ok_hi, z_high, z_high0)
        sdf_high = jnp.where(ok_hi, v_hi, sdf_high0)
        z_pred = predict(z_low, sdf_low, z_high, sdf_high)
        carry = (z_low, sdf_low, z_high, sdf_high, z_pred)
    carry = jax.lax.fori_loop(m, cfg.n_secant_steps, make_body(sdf), carry)
    return carry[-1]


