"""Pallas TPU kernels for the SDF path: fused sphere-trace march and shadow
marches on (8, 128) ray tiles.

This is the Pallas rewrite of the per-pixel tile kernel's SDF hot loops
(SURVEY.md §7 step 4; reference trace.cpp march loop). Why a kernel instead of
the jnp `lax.fori_loop` batch march:

  * rays are processed in VPU-shaped (8, 128) tiles, one grid instance per
    1024-ray tile, ALL state in VMEM/registers — no HBM traffic inside the
    march;
  * each tile runs its OWN `while_loop` with an any-lane-active early exit:
    sky tiles stop after a few steps and coherent hit tiles stop at their
    local max step count, instead of every ray paying the global worst-case
    budget (the big waste in the lockstep jnp version);
  * the distance field is evaluated on component tiles (px, py, pz as 2-D
    arrays) with static Python loops over the (few) primitives — everything
    stays 2-D and element-wise for Mosaic.

Gradients: the march is selection/fixed-point only. The differentiable
wrapper in sphere_trace.py supplies the implicit-function-theorem backward —
the same custom VJP wraps either forward, so swapping in the Pallas forward
changes no gradient semantics (tested: pallas fwd == jnp fwd, same bwd).

Scene parameter arrays ride into the kernel as whole-array VMEM operands
(they are tiny); zero-length primitive families are skipped statically.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ray.sdf.mandelbulb import mandelbulb_de_pow8_components
from tpu_ray.sdf.primitives import BIG, SdfScene, sdf_bounding_spheres

TILE = (8, 128)
TILE_RAYS = TILE[0] * TILE[1]
_RMIN = 1e-6
_MB_BAILOUT = 4.0


# ---------------------------------------------------------------------------
# Transcendentals Mosaic lacks: branchless polynomial atan2 (~2e-7 max error)
# ---------------------------------------------------------------------------

def _atan_poly01(q):
    """Odd minimax polynomial for atan on q in [0, 1]."""
    q2 = q * q
    return q * (0.99997726 + q2 * (-0.33262347 + q2 * (0.19354346 + q2 * (
        -0.11643287 + q2 * (0.05265332 + q2 * -0.01172120)))))


def atan2_tile(y, x):
    """Quadrant-correct atan2 from sin/cos-free primitives (Mosaic has no
    atan/atan2 lowering). Branchless; atan2(0, 0) returns 0."""
    abs_y = jnp.abs(y)
    abs_x = jnp.abs(x)
    hi = jnp.maximum(abs_x, abs_y)
    lo = jnp.minimum(abs_x, abs_y)
    q = lo / jnp.maximum(hi, 1e-30)
    a = _atan_poly01(q)
    a = jnp.where(abs_y > abs_x, (0.5 * jnp.pi) - a, a)
    a = jnp.where(x < 0.0, jnp.pi - a, a)
    return jnp.where(y < 0.0, -a, a)


# ---------------------------------------------------------------------------
# Distance field on component tiles
# ---------------------------------------------------------------------------

def _mandelbulb_de_tile(px, py, pz, power, iters: int,
                        unroll: bool = False):
    """Mandelbulb DE for one instance on (8,128) component tiles; mirrors
    tpu_ray/sdf/mandelbulb.py (same masked-freeze escape semantics)."""
    r0 = jnp.sqrt(jnp.maximum(px * px + py * py + pz * pz, _RMIN * _RMIN))
    zx, zy, zz = px, py, pz
    dr = px * 0.0 + 1.0
    # live carried as an f32 mask: Mosaic fails to legalize i1 vector carries
    live = px * 0.0 + 1.0

    def body(_, carry):
        zx, zy, zz, dr, r, live = carry
        r_new = jnp.sqrt(jnp.maximum(zx * zx + zy * zy + zz * zz, _RMIN * _RMIN))
        live_b = live > 0.5
        r = jnp.where(live_b, r_new, r)
        live = live * (r_new <= _MB_BAILOUT).astype(live.dtype)
        live_nb = live > 0.5
        # cap at bailout (see tpu_ray/sdf/mandelbulb.py): dead-lane overflow
        # guard for f32 backward
        r_safe = jnp.clip(r_new, _RMIN, _MB_BAILOUT)
        rho = jnp.sqrt(jnp.maximum(zx * zx + zy * zy, _RMIN * _RMIN))
        theta = atan2_tile(rho, zz)
        phi = atan2_tile(zy, zx)
        r_pm1 = jnp.power(r_safe, power - 1.0)
        dr_new = r_pm1 * power * dr + 1.0
        zr = r_pm1 * r_safe
        th = theta * power
        ph = phi * power
        sin_th = jnp.sin(th)
        nzx = zr * sin_th * jnp.cos(ph) + px
        nzy = zr * jnp.sin(ph) * sin_th + py
        nzz = zr * jnp.cos(th) + pz
        zx = jnp.where(live_nb, nzx, zx)
        zy = jnp.where(live_nb, nzy, zy)
        zz = jnp.where(live_nb, nzz, zz)
        dr = jnp.where(live_nb, dr_new, dr)
        return zx, zy, zz, dr, r, live

    carry = (zx, zy, zz, dr, r0, live)
    if unroll:  # required when the DE is differentiated INSIDE a kernel
        for _ in range(iters):
            carry = body(0, carry)
        _, _, _, dr, r, _ = carry
    else:
        _, _, _, dr, r, _ = jax.lax.fori_loop(0, iters, body, carry)
    r = jnp.maximum(r, _RMIN)
    return 0.5 * jnp.log(r) * r / dr


def de_tile(sdf: SdfScene, px, py, pz, unroll: bool = False):
    """Scene distance on component tiles -> (8,128). Static loops over prims;
    mirrors tpu_ray/sdf/primitives.sdf_distance exactly (same op order)."""
    d = jnp.full(px.shape, BIG, px.dtype)
    for i in range(sdf.sph_center.shape[0]):
        cx, cy, cz = sdf.sph_center[i, 0], sdf.sph_center[i, 1], sdf.sph_center[i, 2]
        qx, qy, qz = px - cx, py - cy, pz - cz
        di = jnp.sqrt(jnp.maximum(qx * qx + qy * qy + qz * qz, 1e-12)) - sdf.sph_radius[i]
        d = jnp.minimum(d, di)
    for i in range(sdf.pln_normal.shape[0]):
        nx, ny, nz = sdf.pln_normal[i, 0], sdf.pln_normal[i, 1], sdf.pln_normal[i, 2]
        di = px * nx + py * ny + pz * nz - sdf.pln_offset[i]
        d = jnp.minimum(d, di)
    for i in range(sdf.box_center.shape[0]):
        qx = jnp.abs(px - sdf.box_center[i, 0]) - sdf.box_half[i, 0]
        qy = jnp.abs(py - sdf.box_center[i, 1]) - sdf.box_half[i, 1]
        qz = jnp.abs(pz - sdf.box_center[i, 2]) - sdf.box_half[i, 2]
        outside = jnp.sqrt(jnp.maximum(
            jnp.maximum(qx, 0.0) ** 2 + jnp.maximum(qy, 0.0) ** 2
            + jnp.maximum(qz, 0.0) ** 2, 1e-24))
        inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
        d = jnp.minimum(d, outside + inside - sdf.box_round[i])
    for i in range(sdf.mb_center.shape[0]):
        s = sdf.mb_scale[i]
        lx = (px - sdf.mb_center[i, 0]) / s
        ly = (py - sdf.mb_center[i, 1]) / s
        lz = (pz - sdf.mb_center[i, 2]) / s
        if sdf.mb_pow8:
            # trig-free power-8 path — the same component-array function the
            # jnp field uses (tpu_ray/sdf/mandelbulb.py), so pallas == jnp exactly
            di = mandelbulb_de_pow8_components(lx, ly, lz, sdf.mb_iters,
                                               unroll=unroll) * s
        else:
            di = _mandelbulb_de_tile(lx, ly, lz, sdf.mb_power[i],
                                     sdf.mb_iters, unroll=unroll) * s
        d = jnp.minimum(d, di)
    return d


# ---------------------------------------------------------------------------
# Scene pytree <-> kernel operand plumbing
# ---------------------------------------------------------------------------

def _flatten_sdf(sdf: SdfScene):
    """Non-empty float leaves as kernel operands + a rebuild function."""
    leaves, treedef = jax.tree_util.tree_flatten(sdf)
    operands, slots = [], []
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "size") and leaf.size > 0:
            operands.append(jnp.asarray(leaf))
            slots.append(i)
    shapes = [(l.shape, l.dtype if hasattr(l, "dtype") else None) for l in leaves]

    def rebuild(op_vals: Sequence[jnp.ndarray]) -> SdfScene:
        new_leaves = []
        it = iter(op_vals)
        for i, (shape, dtype) in enumerate(shapes):
            if i in slots:
                new_leaves.append(next(it))
            else:
                # plain-numpy zeros: empty leaves must never become traced
                # values — a (0, 3) vector type does not lower in Mosaic
                # (only their .shape is read, to skip their prim loops)
                new_leaves.append(np.zeros(shape, dtype) if dtype is not None else leaves[i])
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    return operands, rebuild


def _tileize(x: jnp.ndarray):
    """(R,) -> ((NT*8, 128), R, NT) padded to whole tiles."""
    R = x.shape[0]
    nt = -(-R // TILE_RAYS)
    pad = nt * TILE_RAYS - R
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,))])
    return x.reshape(nt * TILE[0], TILE[1]), R, nt


def _ray_specs(n: int, _nt=None):
    return [pl.BlockSpec(TILE, lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(n)]


def _full_spec(arr):
    nd = arr.ndim
    return pl.BlockSpec(arr.shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _use_interpret():
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Closest-hit march
# ---------------------------------------------------------------------------

def march_pallas(sdf: SdfScene, o: jnp.ndarray, d: jnp.ndarray, *,
                 t0: float, max_steps: int, eps: float, t_far: float,
                 interpret: bool | None = None):
    """Forward sphere-trace march: (R,3),(R,3) -> (t, hit, steps, t_min).

    Identical step rule (and t_min closest-approach tracking) to
    sphere_trace.march; per-tile early exit; `steps` is diagnostic.
    """
    if interpret is None:
        interpret = _use_interpret()
    dtype = o.dtype
    tiles = []
    R = nt = None
    for c in [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]:
        tc, R, nt = _tileize(c)
        tiles.append(tc)
    operands, rebuild = _flatten_sdf(sdf)
    bounds = sdf_bounding_spheres(sdf)
    n_bounds = 0 if bounds is None else bounds.shape[0]
    extra = [] if bounds is None else [bounds]

    def kernel(*refs):
        ox, oy, oz, dx, dy, dz = (refs[i][:] for i in range(6))
        sdf_k = rebuild([refs[6 + i][:] for i in range(len(operands))])
        off = 6 + len(operands)
        bounds_ref = refs[off] if n_bounds else None
        t_ref, hit_ref, steps_ref, tmin_ref = refs[off + (1 if n_bounds else 0):]

        # carry state as f32 tiles derived from a VMEM read: Mosaic cannot
        # relayout replicated-constant inits to the loop body's tiled layout,
        # and fails to legalize i1 vector carries — so masks ride as f32
        zero = ox * 0.0
        t_init = zero + t0
        hit0 = zero  # 0.0 = not hit
        steps0 = zero
        dmin0 = zero + 1e10
        tmin0 = t_init
        if n_bounds:
            # bounding-sphere tile cull: lanes whose ray misses every
            # primitive's bound start at t_far (dead) — sky/floor tiles in
            # mixed scenes then skip the march entirely via the while cond
            reach = zero > 1.0  # all-false, tiled
            for k in range(n_bounds):
                cx, cy, cz, r = (bounds_ref[k, 0], bounds_ref[k, 1],
                                 bounds_ref[k, 2], bounds_ref[k, 3])
                ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
                b = ocx * dx + ocy * dy + ocz * dz
                c2 = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                disc = b * b - c2
                # hit if the sphere is ahead (exit point t = -b + sqrt > 0)
                reach = reach | ((disc >= 0.0) & (jnp.sqrt(jnp.maximum(disc, 0.0)) - b > 0.0))
            t_init = jnp.where(reach, t_init, zero + t_far)

        def cond(carry):
            step, t, hit, _s, _dm, _tm = carry
            active = (hit < 0.5) & (t < t_far)
            return (step < max_steps) & jnp.any(active)

        def body(carry):
            step, t, hit, steps, dmin, tmin = carry
            active = (hit < 0.5) & (t < t_far)
            dist = de_tile(sdf_k, ox + t * dx, oy + t * dy, oz + t * dz)
            closer = active & (dist < dmin)
            dmin = jnp.where(closer, dist, dmin)
            tmin = jnp.where(closer, t, tmin)
            hit_now = active & (dist < eps)
            hit = jnp.maximum(hit, hit_now.astype(dtype))
            advance = active & (~hit_now)
            t = jnp.where(advance, t + dist, t)
            steps = steps + active.astype(dtype)
            return step + 1, t, hit, steps, dmin, tmin

        _, t, hit, steps, _dmin, tmin = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t_init, hit0, steps0, dmin0, tmin0))
        t_ref[:] = t
        hit_ref[:] = (hit > 0.5).astype(jnp.int32)
        steps_ref[:] = steps.astype(jnp.int32)
        tmin_ref[:] = tmin

    out_shape = [
        jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), dtype),
        jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), jnp.int32),
        jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), jnp.int32),
        jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), dtype),
    ]
    in_specs = (_ray_specs(6, nt) + [_full_spec(op) for op in operands]
                + [_full_spec(b) for b in extra])
    out_specs = [pl.BlockSpec(TILE, lambda i: (i, 0), memory_space=pltpu.VMEM)] * 4

    t, hit, steps, tmin = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*tiles, *operands, *extra)
    flat = lambda a: a.reshape(-1)[:R]
    return flat(t), flat(hit).astype(bool), flat(steps), flat(tmin)


# ---------------------------------------------------------------------------
# Shadow marches (hard + soft) — same tile structure
# ---------------------------------------------------------------------------

def shadow_pallas(sdf: SdfScene, p: jnp.ndarray, l_dir: jnp.ndarray, *,
                  soft: bool, eps: float, t_far: float, steps: int,
                  bias: float, soft_k: float = 8.0,
                  t_far_rays: jnp.ndarray | None = None,
                  interpret: bool | None = None):
    """Visibility march toward the light; mirrors shading.sdf_hard_shadow /
    sdf_soft_shadow step rules exactly. -> (vis, t_s), both (R,).

    t_s is the march parameter at which the soft-shadow penumbra min was
    attained (shading.sdf_soft_shadow_argmin): the residual that lets the
    differentiable shade pass recompute the penumbra factor from ONE DE
    evaluation instead of re-marching (render.py split backward). For hard
    shadows t_s is the bias (unused — hard visibility is stop-gradient).

    t_far_rays: optional per-ray (R,) march cutoff (point lights clamp at the
    light distance); rides as a 7th ray-component operand tile."""
    if interpret is None:
        interpret = _use_interpret()
    dtype = p.dtype
    comps = [p[:, 0], p[:, 1], p[:, 2], l_dir[:, 0], l_dir[:, 1], l_dir[:, 2]]
    n_ray_ops = 6
    if t_far_rays is not None:
        comps.append(t_far_rays)
        n_ray_ops = 7
    tiles = []
    R = nt = None
    for c in comps:
        tc, R, nt = _tileize(c)
        tiles.append(tc)
    operands, rebuild = _flatten_sdf(sdf)
    # hard-shadow bounding cull: a blocker needs DE < eps, which only happens
    # within eps of a primitive — inside its bounding sphere inflated by eps.
    # Clamping each lane's march at its LAST bound exit (0 for lanes missing
    # every bound) kills the dominant cost of mixed-scene shadows: rays from
    # mesh surfaces toward the light that never approach the SDF at all
    # (measured 1.47 s -> ~0.3 s of the 1080p x 16 spp frame). Soft shadows
    # keep the full march: their penumbra term k*d/t darkens lanes that miss
    # every bound, so an exit-clamp there would change the image.
    bounds = None if soft else sdf_bounding_spheres(sdf)
    n_bounds = 0 if bounds is None else bounds.shape[0]
    extra = [] if bounds is None else [bounds]

    def kernel(*refs):
        px, py, pz, lx, ly, lz = (refs[i][:] for i in range(6))
        t_far_k = refs[6][:] if n_ray_ops == 7 else t_far
        sdf_k = rebuild([refs[n_ray_ops + i][:] for i in range(len(operands))])
        off = n_ray_ops + len(operands)
        bounds_ref = refs[off] if n_bounds else None
        vis_ref = refs[off + (1 if n_bounds else 0)]
        ts_ref = refs[off + (1 if n_bounds else 0) + 1]
        if n_bounds:
            t_cut = px * 0.0  # last bound exit per lane (0 = misses all)
            for k in range(n_bounds):
                cx, cy, cz, r = (bounds_ref[k, 0], bounds_ref[k, 1],
                                 bounds_ref[k, 2], bounds_ref[k, 3] + eps)
                ocx, ocy, ocz = px - cx, py - cy, pz - cz
                b = ocx * lx + ocy * ly + ocz * lz
                c2 = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                disc = b * b - c2
                texit = jnp.sqrt(jnp.maximum(disc, 0.0)) - b
                t_cut = jnp.maximum(
                    t_cut, jnp.where(disc >= 0.0, texit, 0.0))
            t_far_k = jnp.minimum(t_far_k, t_cut)

        zero = px * 0.0  # tiled-layout zero (see march kernel layout note)
        t0_arr = zero + bias
        if soft:
            s0 = zero + 1.0

            def cond(carry):
                step, t, s, ts = carry
                return (step < steps) & jnp.any(t < t_far_k)

            def body(carry):
                step, t, s, ts = carry
                active = t < t_far_k
                dd = de_tile(sdf_k, px + t * lx, py + t * ly, pz + t * lz)
                s_new = soft_k * dd / jnp.maximum(t, bias)
                better = active & (s_new < s)
                ts = jnp.where(better, t, ts)
                s = jnp.where(better, s_new, s)
                t = jnp.where(active, t + jnp.clip(dd, eps * 0.5, 0.4), t)
                return step + 1, t, s, ts

            _, _, s, ts = jax.lax.while_loop(
                cond, body, (jnp.int32(0), t0_arr, s0, t0_arr))
            vis_ref[:] = jnp.clip(s, 0.0, 1.0)
            ts_ref[:] = ts
        else:
            blocked0 = zero  # f32 mask carry (no i1 vector carries in Mosaic)

            def cond(carry):
                step, t, blocked = carry
                active = (blocked < 0.5) & (t < t_far_k)
                return (step < steps) & jnp.any(active)

            def body(carry):
                step, t, blocked = carry
                active = (blocked < 0.5) & (t < t_far_k)
                dd = de_tile(sdf_k, px + t * lx, py + t * ly, pz + t * lz)
                blocked = jnp.maximum(blocked, (active & (dd < eps)).astype(dtype))
                t = jnp.where(active, t + jnp.maximum(dd, eps * 0.5), t)
                return step + 1, t, blocked

            _, _, blocked = jax.lax.while_loop(
                cond, body, (jnp.int32(0), t0_arr, blocked0))
            vis_ref[:] = 1.0 - blocked
            ts_ref[:] = t0_arr

    out_shape = [jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), dtype)] * 2
    in_specs = (_ray_specs(n_ray_ops, nt) + [_full_spec(op) for op in operands]
                + [_full_spec(b) for b in extra])
    vis, ts = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(TILE, lambda i: (i, 0), memory_space=pltpu.VMEM)] * 2,
        out_shape=out_shape,
        interpret=interpret,
    )(*tiles, *operands, *extra)
    return vis.reshape(-1)[:R], ts.reshape(-1)[:R]
