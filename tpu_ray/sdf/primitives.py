"""SDF scene representation: analytic distance estimators and combinators.

TPU-native equivalent of the reference's distance-estimator scene functions
(SURVEY.md §2 #9, reference trace.cpp DE(p) area). Instead of C++ function
pointers per scene, a scene is a *pytree of parameter arrays* with static
per-type counts, and the distance field is evaluated vectorized over both
query points and primitives — every leaf is differentiable (sphere centers,
radii, plane offsets, box geometry, Mandelbulb power/scale), which is what
makes `fit()` able to optimize SDF parameters (BASELINE.json north_star).

Layout notes (TPU-first):
  * primitive arrays are struct-of-arrays with a static count per type, so the
    min-reduction over primitives is a fixed-shape `min` on the VPU — no
    data-dependent dispatch;
  * a scene with zero primitives of some type simply has a length-0 array for
    that type; the reduction skips it at trace time (Python-level, static);
  * material ids resolve via the same masked argmin the distance uses.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from tpu_ray.core.math3d import length
from tpu_ray.sdf.mandelbulb import mandelbulb_de, mandelbulb_de_pow8

BIG = 1e10  # sentinel distance for "no primitive"


@struct.dataclass
class SdfScene:
    """All SDF primitives of a scene, SoA, static counts.

    mat ids index into the scene-level material table (render/shading.py).
    """

    # spheres: ||p - c|| - r
    sph_center: jnp.ndarray  # (Ns, 3)
    sph_radius: jnp.ndarray  # (Ns,)
    sph_mat: jnp.ndarray  # (Ns,) int32

    # half-space planes: dot(p, n) - offset   (n need not be unit; grads flow)
    pln_normal: jnp.ndarray  # (Np, 3)
    pln_offset: jnp.ndarray  # (Np,)
    pln_mat: jnp.ndarray  # (Np,) int32

    # axis-aligned boxes (optionally rounded): |p - c| - b, rounded by r
    box_center: jnp.ndarray  # (Nb, 3)
    box_half: jnp.ndarray  # (Nb, 3)
    box_round: jnp.ndarray  # (Nb,)
    box_mat: jnp.ndarray  # (Nb,) int32

    # Mandelbulb fractal instances: DE evaluated in local frame (p - c) / s
    mb_center: jnp.ndarray  # (Nm, 3)
    mb_scale: jnp.ndarray  # (Nm,)
    mb_power: jnp.ndarray  # (Nm,)
    mb_mat: jnp.ndarray  # (Nm,) int32
    mb_iters: int = struct.field(pytree_node=False, default=12)
    # Static fast path: every bulb's power is exactly 8 -> use the trig-free
    # polynomial z^8 formulation (mandelbulb_de_pow8). The mb_power array is
    # then IGNORED by the distance field, so fits that optimize mb_power must
    # clear this flag first (fit() does so automatically).
    mb_pow8: bool = struct.field(pytree_node=False, default=False)

    @staticmethod
    def empty(dtype=jnp.float32) -> "SdfScene":
        z3 = jnp.zeros((0, 3), dtype)
        z1 = jnp.zeros((0,), dtype)
        zi = jnp.zeros((0,), jnp.int32)
        return SdfScene(
            sph_center=z3, sph_radius=z1, sph_mat=zi,
            pln_normal=z3, pln_offset=z1, pln_mat=zi,
            box_center=z3, box_half=z3, box_round=z1, box_mat=zi,
            mb_center=z3, mb_scale=z1, mb_power=z1, mb_mat=zi,
        )

    @property
    def num_primitives(self) -> int:
        return (self.sph_center.shape[0] + self.pln_normal.shape[0]
                + self.box_center.shape[0] + self.mb_center.shape[0])


def _sphere_d(scene: SdfScene, p: jnp.ndarray) -> jnp.ndarray:
    # p: (..., 3) -> (..., Ns)
    return length(p[..., None, :] - scene.sph_center) - scene.sph_radius


def _plane_d(scene: SdfScene, p: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...c,nc->...n", p, scene.pln_normal) - scene.pln_offset


def _box_d(scene: SdfScene, p: jnp.ndarray) -> jnp.ndarray:
    q = jnp.abs(p[..., None, :] - scene.box_center) - scene.box_half
    outside = length(jnp.maximum(q, 0.0))
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside - scene.box_round


def _mandelbulb_d(scene: SdfScene, p: jnp.ndarray) -> jnp.ndarray:
    local = (p[..., None, :] - scene.mb_center) / scene.mb_scale[..., None]
    if scene.mb_pow8:
        d = mandelbulb_de_pow8(local, iters=scene.mb_iters)
    else:
        d = mandelbulb_de(local, scene.mb_power, iters=scene.mb_iters)
    return d * scene.mb_scale


def _per_prim_distances(scene: SdfScene, p: jnp.ndarray):
    """Concatenated per-primitive distances (..., Ntot) and matching mat ids (Ntot,)."""
    parts, mats = [], []
    if scene.sph_center.shape[0]:
        parts.append(_sphere_d(scene, p)); mats.append(scene.sph_mat)
    if scene.pln_normal.shape[0]:
        parts.append(_plane_d(scene, p)); mats.append(scene.pln_mat)
    if scene.box_center.shape[0]:
        parts.append(_box_d(scene, p)); mats.append(scene.box_mat)
    if scene.mb_center.shape[0]:
        parts.append(_mandelbulb_d(scene, p)); mats.append(scene.mb_mat)
    if not parts:
        shape = p.shape[:-1] + (1,)
        return jnp.full(shape, BIG, p.dtype), jnp.zeros((1,), jnp.int32)
    return jnp.concatenate(parts, axis=-1), jnp.concatenate(mats)


def sdf_bounding_spheres(scene: SdfScene):
    """Conservative bounding spheres (K, 4) [cx, cy, cz, r] over all finite
    primitives, or None if the scene contains unbounded ones (planes).

    Used by the Pallas march to skip whole ray tiles that cannot hit any SDF
    primitive, and by the hard-shadow cull to clamp each lane's march at its
    last bound exit (kernels/pallas_sdf.py).

    Contract for the radii (what the culls actually require): r must bound
    the region where the primitive's DE can fall below any march epsilon —
    i.e. geometric extent PLUS the DE's underestimate margin. Sphere/box DEs
    are exact, so extent alone suffices (callers add +eps). The Mandelbulb
    DE (0.25·ln r·r/dr) is an UNDERESTIMATE: DE < eps can hold farther than
    eps from the surface. Its geometric extent is ~1.22·scale and outside it
    the DE recovers at least ~distance/4 (the standard fractal-DE bound), so
    DE < eps implies distance-to-surface < 4·eps; the 1.5·scale radius
    leaves a 0.28·scale apron, absorbing the underestimate for any
    eps ≤ 0.07·scale — orders of magnitude above the 1e-3-ish march
    epsilons in use. Keep that inequality in mind if shrinking the margin.
    """
    if scene.pln_normal.shape[0]:
        return None
    rows = []
    if scene.sph_center.shape[0]:
        rows.append(jnp.concatenate(
            [scene.sph_center, scene.sph_radius[:, None]], axis=1))
    if scene.box_center.shape[0]:
        r = length(scene.box_half) + scene.box_round
        rows.append(jnp.concatenate([scene.box_center, r[:, None]], axis=1))
    if scene.mb_center.shape[0]:
        r = 1.5 * scene.mb_scale
        rows.append(jnp.concatenate([scene.mb_center, r[:, None]], axis=1))
    if not rows:
        return None
    return jnp.concatenate(rows, axis=0)


def sdf_distance(scene: SdfScene, p: jnp.ndarray) -> jnp.ndarray:
    """Scene distance field: (..., 3) -> (...,). Union = min over primitives."""
    d, _ = _per_prim_distances(scene, p)
    return jnp.min(d, axis=-1)


def sdf_distance_and_mat(scene: SdfScene, p: jnp.ndarray):
    """Distance plus material id of the closest primitive: (...,), (...,) int32."""
    d, mats = _per_prim_distances(scene, p)
    idx = jnp.argmin(d, axis=-1)
    return jnp.min(d, axis=-1), mats[idx]
