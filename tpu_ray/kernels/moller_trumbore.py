"""Möller–Trumbore ray/triangle intersection, vectorized and masked.

TPU-native equivalent of the reference's IntersectTri + brute-force loop
(SURVEY.md §2 #6, §3.2 "brute: for all tris"). Instead of a scalar early-out
loop, every ray tests a whole block of triangles at once on the VPU and the
closest hit is a masked min-reduction — branch-free, fixed shapes.

Differentiability: the *selection* of the closest triangle is discrete, so the
argmin index is taken under stop_gradient and the hit (t, u, v) are recomputed
analytically for the selected triangle only (`recompute_hit`) — gradients
w.r.t. the selected triangle's vertices, the ray origin and direction are then
exact closed forms, matching the IFT treatment used for the SDF march.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_ray.core.math3d import cross, dot, normalize
from tpu_ray.scene.mesh import MeshScene

_DET_EPS = 1e-10
_T_MIN = 1e-5
BIG = 1e10


class TriHit(NamedTuple):
    t: jnp.ndarray  # (R,) hit distance (BIG where no hit)
    tri: jnp.ndarray  # (R,) int32 triangle index (-1 where no hit)
    hit: jnp.ndarray  # (R,) bool


def _mt_t(o, d, v0, v1, v2, t_max):
    """Raw MT test for broadcastable ray/triangle batches -> (t, valid).

    o, d: (..., 3); v0/v1/v2: (..., 3) broadcast against rays. No backface
    culling (two-sided triangles, like the reference's no-cull default).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tvec = o - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    valid = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > _T_MIN) & (t < t_max)
    )
    return jnp.where(valid, t, BIG), valid


def intersect_brute(mesh: MeshScene, o: jnp.ndarray, d: jnp.ndarray,
                    t_max: float = BIG, chunk: int = 0) -> TriHit:
    """Closest hit over ALL triangles (R rays x T tris, masked min-reduce).

    chunk > 0 streams triangles in fixed-size chunks via lax.fori_loop to
    bound the (R, T) intermediate — the jnp analog of the Pallas double-buffer
    pattern used by the fused kernel.
    """
    T = mesh.num_tris
    if T == 0:
        shape = o.shape[:-1]
        return TriHit(jnp.full(shape, BIG, o.dtype),
                      jnp.full(shape, -1, jnp.int32),
                      jnp.zeros(shape, bool))
    v0, v1, v2 = mesh.triangle_corners()

    if chunk <= 0 or chunk >= T:
        t, valid = _mt_t(o[..., None, :], d[..., None, :], v0, v1, v2, t_max)
        tri = jnp.argmin(t, axis=-1).astype(jnp.int32)
        t_best = jnp.min(t, axis=-1)
        hit = jnp.take_along_axis(valid, tri[..., None], axis=-1)[..., 0]
        return TriHit(t_best, jnp.where(hit, tri, -1), hit)

    # chunked streaming: pad T to a multiple of `chunk` with degenerate tris
    pad = (-T) % chunk
    if pad:
        zpad = jnp.zeros((pad, 3), v0.dtype)
        v0p, v1p, v2p = (jnp.concatenate([v, zpad]) for v in (v0, v1, v2))
    else:
        v0p, v1p, v2p = v0, v1, v2
    n_chunks = (T + pad) // chunk
    shape = o.shape[:-1]

    def body(ci, carry):
        t_best, tri_best = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk, 0)
        t, _ = _mt_t(o[..., None, :], d[..., None, :], sl(v0p), sl(v1p), sl(v2p), t_max)
        tc = jnp.min(t, axis=-1)
        ic = jnp.argmin(t, axis=-1).astype(jnp.int32) + ci * chunk
        better = tc < t_best
        return jnp.where(better, tc, t_best), jnp.where(better, ic, tri_best)

    t_best = jnp.full(shape, BIG, o.dtype)
    tri_best = jnp.full(shape, -1, jnp.int32)
    t_best, tri_best = jax.lax.fori_loop(0, n_chunks, body, (t_best, tri_best))
    hit = t_best < BIG * 0.5
    return TriHit(t_best, jnp.where(hit, tri_best, -1), hit)


def any_hit_brute(mesh: MeshScene, o, d, t_max: float = BIG, chunk: int = 0) -> jnp.ndarray:
    """Occlusion query (shadow rays): does ANY triangle block within t_max?"""
    h = intersect_brute(mesh, o, d, t_max=t_max, chunk=chunk)
    return h.hit


def recompute_hit(mesh: MeshScene, o, d, tri_idx):
    """Differentiable (t, u, v, n_geom) for the already-selected triangle.

    tri_idx: (R,) int32 (clamped gather; callers mask by hit). n_geom is the
    geometric normal cross(e1, e2), normalized — differentiable w.r.t. verts.
    """
    idx = jnp.clip(tri_idx, 0, max(mesh.num_tris - 1, 0))
    tri = mesh.tris[idx]  # (R, 3)
    v0 = mesh.verts[tri[..., 0]]
    v1 = mesh.verts[tri[..., 1]]
    v2 = mesh.verts[tri[..., 2]]
    return recompute_hit_corners(v0, v1, v2, o, d)


def recompute_hit_corners(v0, v1, v2, o, d):
    """recompute_hit's MT re-solve from already-gathered corners — shared by
    the classic per-array gather path and the packed row-table path
    (render.mesh_table), so both are bitwise the same math."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    det_safe = jnp.where(jnp.abs(det) > _DET_EPS, det,
                         jnp.where(det >= 0, _DET_EPS, -_DET_EPS))
    inv_det = 1.0 / det_safe
    tvec = o - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    n = normalize(cross(e1, e2))
    return t, u, v, n


def edge_margin_corners(v0, v1, v2, u, v):
    """World-space distance from the hit point to the nearest triangle edge,
    within the triangle plane (differentiable w.r.t. corners and u/v).

    Barycentric weights (b0, b1, b2) = (1-u-v, u, v); the in-plane distance
    to the edge opposite corner i is b_i · h_i with h_i = 2·Area / L_i (the
    corner's height over its opposite edge). This is the margin the mesh
    soft-silhouette coverage ramps over (render._mesh_from_res,
    RenderConfig.mesh_silhouette); mirrored component-wise by the fused
    Pallas backward (kernels/pallas_shade._local_shade).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    cn = cross(e1, e2)
    two_area = jnp.sqrt(jnp.maximum(dot(cn, cn), 1e-24))
    l0 = jnp.sqrt(jnp.maximum(dot(v2 - v1, v2 - v1), 1e-24))
    l1 = jnp.sqrt(jnp.maximum(dot(e2, e2), 1e-24))
    l2 = jnp.sqrt(jnp.maximum(dot(e1, e1), 1e-24))
    d0 = (1.0 - u - v) * two_area / l0
    d1 = u * two_area / l1
    d2 = v * two_area / l2
    return jnp.minimum(d0, jnp.minimum(d1, d2))
