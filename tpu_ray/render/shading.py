"""Differentiable shading: Lambertian lighting, hard/soft shadows, ambient
occlusion.

TPU-native equivalent of the reference's Shade() (SURVEY.md §2 #11): N·L
Lambertian with shadow rays and distance-field AO. All arithmetic is batched
over the ray dimension and differentiable w.r.t. materials, lights, and —
through the hit point and normal — geometry. Discontinuous hard-shadow
visibility is stop-gradiented (a 0/1 step has measure-zero gradient; see
SURVEY.md §7 hard part 3); soft shadows and AO are smooth and differentiate
when cfg.diff_vis is set.

Visibility is abstracted behind an `occluder` callback so the same shading
code serves the SDF path (shadow = short sphere-trace march), the mesh paths
(shadow = any-hit query via brute MT or grid DDA), and mixed scenes.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from tpu_ray.core.math3d import clamp01, dot, normalize
from tpu_ray.scene.types import Scene, background_color
from tpu_ray.utils.config import RenderConfig


def sdf_hard_shadow(de_fn, sdf_scene, p, l_dir, cfg: RenderConfig, t_far=None):
    """0/1 visibility by marching toward the light. (R,3),(R,3) -> (R,).

    t_far: scalar or per-ray (R,) march cutoff — point lights clamp it at the
    light distance so geometry beyond the light cannot occlude."""
    t_far = cfg.t_far if t_far is None else t_far
    t = jnp.full(p.shape[:-1], cfg.shadow_bias, p.dtype)
    blocked = jnp.zeros(p.shape[:-1], bool)

    def body(_, carry):
        t, blocked = carry
        active = (~blocked) & (t < t_far)
        d = de_fn(sdf_scene, p + t[..., None] * l_dir)
        blocked = blocked | (active & (d < cfg.eps))
        t = jnp.where(active, t + jnp.maximum(d, cfg.eps * 0.5), t)
        return t, blocked

    _, blocked = jax.lax.fori_loop(0, cfg.shadow_steps, body, (t, blocked))
    return 1.0 - blocked.astype(p.dtype)


def sdf_soft_shadow(de_fn, sdf_scene, p, l_dir, cfg: RenderConfig, t_far=None):
    """Penumbra visibility: min over the march of k * DE / t (classic DF soft
    shadow), clamped to [0, 1]. Smooth in geometry and light direction."""
    t_far = cfg.t_far if t_far is None else t_far
    t0 = jnp.full(p.shape[:-1], cfg.shadow_bias, p.dtype)
    s0 = jnp.ones(p.shape[:-1], p.dtype)

    def body(_, carry):
        t, s = carry
        active = t < t_far
        d = de_fn(sdf_scene, p + t[..., None] * l_dir)
        s_new = jnp.minimum(s, cfg.soft_k * d / jnp.maximum(t, cfg.shadow_bias))
        s = jnp.where(active, s_new, s)
        t = jnp.where(active, t + jnp.clip(d, cfg.eps * 0.5, 0.4), t)
        return t, s

    _, s = jax.lax.fori_loop(0, cfg.shadow_steps, body, (t0, s0))
    return clamp01(s)


def sdf_soft_shadow_argmin(de_fn, sdf_scene, p, l_dir, cfg: RenderConfig,
                           t_far=None):
    """Soft shadow plus the march parameter t_s at which the penumbra min was
    attained: (vis, t_s), both (R,).

    t_s is the residual for the split backward (render.py): the penumbra
    factor equals clamp01(soft_k * DE(p + t_s*l) / max(t_s, bias)) exactly
    (the value AT the argmin step), so the differentiable shade pass can
    recompute it from one DE evaluation instead of re-marching. Rays whose
    min never dropped below the initial 1.0 keep t_s at the first step, whose
    recomputed value is >= 1 and clamps back to 1 (zero gradient, correct)."""
    t_far = cfg.t_far if t_far is None else t_far
    t0 = jnp.full(p.shape[:-1], cfg.shadow_bias, p.dtype)
    s0 = jnp.ones(p.shape[:-1], p.dtype)

    def body(_, carry):
        t, s, ts = carry
        active = t < t_far
        d = de_fn(sdf_scene, p + t[..., None] * l_dir)
        s_new = cfg.soft_k * d / jnp.maximum(t, cfg.shadow_bias)
        better = active & (s_new < s)
        ts = jnp.where(better, t, ts)
        s = jnp.where(better, s_new, s)
        t = jnp.where(active, t + jnp.clip(d, cfg.eps * 0.5, 0.4), t)
        return t, s, ts

    _, s, ts = jax.lax.fori_loop(0, cfg.shadow_steps, body, (t0, s0, t0))
    return clamp01(s), ts


def sdf_ambient_occlusion(de_fn, sdf_scene, p, n, cfg: RenderConfig,
                          t_mesh=None):
    """5-tap distance-field AO: compare DE at fixed offsets along the normal
    with the unoccluded distance; exponentially weighted (near taps dominate).

    t_mesh: optional (R,) stop-grad closest MESH hit distance along n from p
    (BIG on miss) — generalizes the distance-field taps to mixed/mesh scenes:
    each tap's occluder distance becomes min(DE, |t_mesh - h|), so mesh
    geometry above a surface point darkens it exactly like an SDF occluder at
    the same height would (the tap profile of a plane). sdf_scene=None skips
    the SDF term (pure-mesh AO)."""
    occ = jnp.zeros(p.shape[:-1], p.dtype)
    w = 1.0
    for i in range(1, 6):
        h = cfg.ao_step * i
        d = de_fn(sdf_scene, p + h * n) if sdf_scene is not None else None
        if t_mesh is not None:
            dm = jnp.abs(t_mesh - h)
            d = dm if d is None else jnp.minimum(d, dm)
        occ = occ + w * (h - d)
        w *= 0.7
    return clamp01(1.0 - cfg.ao_strength * occ)


def shade(
    scene: Scene,
    cfg: RenderConfig,
    p: jnp.ndarray,  # (R, 3) hit points
    n: jnp.ndarray,  # (R, 3) unit normals
    d: jnp.ndarray,  # (R, 3) incoming ray dirs
    mat_id: jnp.ndarray,  # (R,) int32
    hit: jnp.ndarray,  # (R,) bool
    occluder: Optional[Callable] = None,  # (p, l_dir, light_idx) -> vis in [0,1]
    ao_fn: Optional[Callable] = None,  # (p, n) -> ao in [0,1]
    coverage: Optional[jnp.ndarray] = None,  # (R,) float in [0,1]
) -> jnp.ndarray:
    """Lambertian shade of hit rays; background color for misses. -> (R, 3).

    With `coverage` (soft silhouettes, render.py), the surface color is alpha-
    blended over the background instead of hard-selected by `hit`."""
    albedo = scene.materials.albedo[mat_id]  # gather (R, 3)
    # face the normal against the incoming ray (two-sided shading)
    n = jnp.where(dot(n, d)[..., None] > 0.0, -n, n)

    ao = ao_fn(p, n) if ao_fn is not None else jnp.ones(p.shape[:-1], p.dtype)
    radiance = scene.lights.ambient * ao[..., None]

    for li in range(scene.lights.direction.shape[0]):
        l_dir = normalize(scene.lights.direction[li])
        ndotl = jnp.maximum(dot(n, l_dir), 0.0)
        if occluder is not None:
            # offset along the (flipped) normal to escape the surface band
            p_off = p + cfg.shadow_bias * n
            vis = occluder(p_off, jnp.broadcast_to(l_dir, p.shape), li)
            if not cfg.diff_vis:
                vis = jax.lax.stop_gradient(vis)
        else:
            vis = jnp.ones_like(ndotl)
        radiance = radiance + scene.lights.color[li] * (ndotl * vis)[..., None]

    n_dir_lights = scene.lights.direction.shape[0]
    for pi in range(scene.lights.position.shape[0]):
        # point light: per-ray direction, inverse-square falloff, shadows
        # clamped at the light distance (occluder index continues after the
        # directional lights)
        lvec = scene.lights.position[pi] - p
        dist2 = jnp.sum(lvec * lvec, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        l_dir = lvec / dist[..., None]
        ndotl = jnp.maximum(dot(n, l_dir), 0.0)
        if occluder is not None:
            # shadow direction from the OFFSET point (the march origin), so
            # the residual-based penumbra recompute sees the same ray the
            # geometry pass marched
            p_off = p + cfg.shadow_bias * n
            lvec_off = scene.lights.position[pi] - p_off
            dist_off = jnp.sqrt(jnp.maximum(jnp.sum(lvec_off * lvec_off, -1), 1e-12))
            vis = occluder(p_off, lvec_off / dist_off[..., None], n_dir_lights + pi)
            if not cfg.diff_vis:
                vis = jax.lax.stop_gradient(vis)
        else:
            vis = jnp.ones_like(ndotl)
        falloff = ndotl * vis / jnp.maximum(dist2, 1e-8)
        radiance = radiance + scene.lights.pos_color[pi] * falloff[..., None]

    color = albedo * radiance
    bg = background_color(scene, d)
    if coverage is not None:
        return bg + coverage[..., None] * (color - bg)
    return jnp.where(hit[..., None], color, bg)
