"""Pallas TPU packet-brute mesh intersection: chunk-culled Möller–Trumbore.

The TPU-native replacement for grid DDA traversal on the hot path (SURVEY.md
§2 #8, §7 hard part 1). Rationale and data layout in tpu_ray/accel/packet.py: the
kernel walks Morton-ordered 128-triangle chunks; for each chunk it slab-tests
the chunk AABB against the whole (8,128) ray tile and skips chunks that
cannot beat any ray's current best hit (`@pl.when` tile-granular branch — the
TPU analog of the DDA's per-ray cell skipping). Surviving chunks test each of
their 128 triangles against ALL 1024 rays of the tile at once: triangle data
broadcasts from static lane extracts, rays stay as full (8,128) component
tiles, the closest-hit update is pure element-wise min — no gathers, no
reductions, no dynamic lane slicing (Mosaic constraints).

Everything here is selection-only (stop_gradient); the differentiable hit
recompute happens outside against the original mesh.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ray.accel.packet import (CHUNK, ROWS_PER_CHUNK, SUPER,
                                  VMEM_BUDGET_BYTES, PacketAccel)
from tpu_ray.kernels.moller_trumbore import BIG, TriHit, _DET_EPS, _T_MIN

# Ray-tile shape. Sublane count (rows) trades per-ray fixed cost against cull
# granularity: a taller tile amortizes the per-chunk any-lane reduce + scalar
# branch and the per-super DMA over more rays, but its frustum is the union
# of more pixels, so more chunks pass the slab tests. Measured on chip
# (tools/ab_tile_rows.py, tools/ab_mixed_fwd.py): 16 rows beats 8 by ~1.4x on
# the raw 70k/1M-tri kernels AND end-to-end (mixed 1080p fwd 3.62 -> 2.91 s);
# 32 is a wash (mixed -2%, knot1m +3%). Env-tunable for A/B.
TILE = (int(os.environ.get("TPU_RAY_MT_TILE_ROWS", "16")), 128)
TILE_RAYS = TILE[0] * TILE[1]

# Scoped SMEM for scalar-prefetch operands is ~1 MB per core (measured on
# v5e); the streamed kernel's (nt, S) int32 candidate array must stay well
# under it — oversize ray batches auto-split (intersect_packet_streamed).
_SMEM_CAND_BUDGET = 512 * 1024


def _tileize(x):
    R = x.shape[0]
    nt = -(-R // TILE_RAYS)
    pad = nt * TILE_RAYS - R
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,))])
    return x.reshape(nt * TILE[0], TILE[1]), R, nt


def _use_interpret():
    return jax.default_backend() != "tpu"


def _mt_chunk_update(rows, ox, oy, oz, dx, dy, dz, best_t, best_tri,
                     cbase, t_far):
    """Test one 128-triangle chunk against a whole ray tile.

    rows: (>=9, 128) chunk data block (v0/e1/e2 xyz per lane); the triangle
    loop is a static unroll of 128 scalar lane extracts — triangle data
    broadcasts against full ray tiles, so the inner loop is pure VPU
    element-wise arithmetic (no gathers, no reductions; Mosaic-safe).
    Shared by the VMEM-resident kernel and the HBM-streamed kernel.

    (A precomputed Baldwin–Weber formulation — plane rows + barycentric row
    vectors, ~24% fewer arithmetic ops but 12 lane extracts/tri instead of
    9 — was A/B'd on chip in round 4 and measured NEUTRAL-to-worse: the
    unroll is extract/latency-bound, not FLOP-bound. Keep MT.)
    """
    for j in range(CHUNK):  # static unroll: lane extracts
        v0x = rows[0, j]; v0y = rows[1, j]; v0z = rows[2, j]
        e1x = rows[3, j]; e1y = rows[4, j]; e1z = rows[5, j]
        e2x = rows[6, j]; e2y = rows[7, j]; e2z = rows[8, j]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) > _DET_EPS
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        valid = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                 & (t > _T_MIN) & (t < t_far))
        better = valid & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_tri = jnp.where(better, cbase + j, best_tri)
    return best_t, best_tri


def intersect_packet(accel: PacketAccel, o: jnp.ndarray, d: jnp.ndarray,
                     t_max: float = BIG, any_hit: bool = False,
                     sort_origin: jnp.ndarray | None = None,
                     sort_dir: jnp.ndarray | None = None,
                     t_init: jnp.ndarray | None = None,
                     interpret: bool | None = None) -> TriHit:
    """Closest-hit (or any-hit) over all chunks for a flat f32 ray batch.

    sort_origin: optional (3,) point; supers are visited in order of distance
    from it (front-to-back for primary rays sharing that origin), so an early
    hit shrinks best_t and the slab cull rejects every farther chunk — the
    packet analog of DDA's near-to-far cell order.
    sort_dir: optional (3,) direction; supers are visited by ascending
    projection onto it — the right order for shadow rays that all travel
    toward the same (directional) light.
    t_init: optional per-ray (R,) initial best-t bound (<= t_max). Rides as a
    7th ray-component tile and seeds the kernel's best_t, so chunks beyond a
    hit already found by a PREVIOUS part / ring shard are slab-culled — the
    cross-part running-t_max shrink. Only strictly-better hits are recorded
    (tri stays -1 otherwise); callers fold results across calls. For any-hit
    callers, passing 0.0 for already-blocked rays culls all their work.
    """
    if interpret is None:
        interpret = _use_interpret()
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    dtype = o.dtype
    t_far = float(min(t_max, BIG))

    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]
    n_ray_ops = 6
    if t_init is not None:
        comps.append(jax.lax.stop_gradient(t_init))
        n_ray_ops = 7
    tiles = []
    R = nt = None
    for c in comps:
        tc, R, nt = _tileize(c)
        tiles.append(tc)

    n_supers = accel.super_aabb.shape[0]
    centers = 0.5 * (accel.super_aabb[:, 0:3] + accel.super_aabb[:, 3:6])
    if sort_origin is not None:
        d2 = jnp.sum((centers - jax.lax.stop_gradient(sort_origin)) ** 2, axis=1)
        super_order = jnp.argsort(d2).astype(jnp.int32)
    elif sort_dir is not None:
        proj = centers @ jax.lax.stop_gradient(sort_dir)
        super_order = jnp.argsort(proj).astype(jnp.int32)
    else:
        super_order = jnp.arange(n_supers, dtype=jnp.int32)

    def kernel(*refs):
        (order_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref) = refs[:7]
        ti_ref = refs[7] if n_ray_ops == 7 else None
        cor_ref, aabb_ref, sup_ref, t_ref, tri_ref = refs[1 + n_ray_ops:]
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        sgn = lambda v: jnp.where(v >= 0.0, 1.0, -1.0)
        inv_x = sgn(dx) / jnp.maximum(jnp.abs(dx), 1e-12)
        inv_y = sgn(dy) / jnp.maximum(jnp.abs(dy), 1e-12)
        inv_z = sgn(dz) / jnp.maximum(jnp.abs(dz), 1e-12)

        # per-ray best-t seed (cross-part/ring shrink) or the static t_far
        t_ref[:] = jnp.minimum(ti_ref[:], t_far) if ti_ref is not None \
            else ox * 0.0 + t_far
        tri_ref[:] = ox * 0.0 - 1.0  # f32 triangle slot (exact ints < 2^24)

        def slab(ab, best):
            t0x = (ab[0, 0] - ox) * inv_x
            t1x = (ab[0, 3] - ox) * inv_x
            t0y = (ab[0, 1] - oy) * inv_y
            t1y = (ab[0, 4] - oy) * inv_y
            t0z = (ab[0, 2] - oz) * inv_z
            t1z = (ab[0, 5] - oz) * inv_z
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            tn = jnp.maximum(tn, 0.0)
            return (tf >= tn) & (tn < best)

        def current_best():
            best = t_ref[:]
            if any_hit:
                best = jnp.where(tri_ref[:] >= 0.0, 0.0, best)
            return best

        def chunk_body(ci):
            ab = aabb_ref[pl.ds(ci, 1), :]  # (1,128): lanes 0-5 = lo/hi
            active = slab(ab, current_best())

            @pl.when(jnp.any(active))
            def _():
                base = pl.multiple_of(ci * ROWS_PER_CHUNK, ROWS_PER_CHUNK)
                rows = cor_ref[pl.ds(base, ROWS_PER_CHUNK), :]  # (16,128)
                cbase = (ci * CHUNK).astype(jnp.float32)
                best_t, best_tri = _mt_chunk_update(
                    rows, ox, oy, oz, dx, dy, dz, t_ref[:], tri_ref[:],
                    cbase, t_far)
                t_ref[:] = best_t
                tri_ref[:] = best_tri

        def super_body(i, _):
            si = order_ref[i]
            sab = sup_ref[pl.ds(si, 1), :]
            s_active = slab(sab, current_best())

            @pl.when(jnp.any(s_active))
            def _():
                def inner(k, _):
                    chunk_body(si * SUPER + k)
                    return 0

                jax.lax.fori_loop(0, SUPER, inner, 0)

            return 0

        jax.lax.fori_loop(0, n_supers, super_body, 0)

    out_shape = [
        jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), dtype),
        jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), dtype),
    ]
    # index maps receive the scalar-prefetch ref as an extra argument
    ray_spec = pl.BlockSpec(TILE, lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i, *_: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[ray_spec] * n_ray_ops + [full(accel.corners),
                                           full(accel.chunk_aabb),
                                           full(accel.super_aabb)],
        out_specs=[ray_spec, ray_spec],
    )
    t, tri_f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(super_order, *tiles, accel.corners, accel.chunk_aabb, accel.super_aabb)

    return _finalize_hits(t, tri_f, accel, R, any_hit)


def _finalize_hits(t, tri_f, accel: PacketAccel, R: int, any_hit: bool) -> TriHit:
    """Unpad kernel outputs and map sorted-chunk slots to original tri ids."""
    t = t.reshape(-1)[:R]
    tri_sorted = tri_f.reshape(-1)[:R].astype(jnp.int32)
    # a recorded tri implies a strictly valid hit (the in-kernel `valid`
    # already requires t < t_far); extra slack here would drop boundary hits
    # the brute/DDA oracles accept
    hit = tri_sorted >= 0
    if any_hit:
        # any-hit short-circuits: t/tri are "some blocker", not the closest
        return TriHit(jnp.where(hit, t, BIG), jnp.where(hit, 0, -1), hit)
    # map sorted-chunk position back to the original triangle id
    tri_orig = accel.perm[jnp.clip(tri_sorted, 0, accel.perm.shape[0] - 1)]
    return TriHit(jnp.where(hit, t, BIG), jnp.where(hit, tri_orig, -1), hit)


def _tile_super_candidates(tiles, n_ray_ops, nt, accel: PacketAccel,
                           t_far: float):
    """XLA pre-pass for the streamed kernel: per (ray tile, super) candidate
    selection by conservative frustum-vs-AABB interval arithmetic.

    For each (8,128) ray tile, bound the tile's rays by intervals
    (o in [o_lo,o_hi], d in [d_lo,d_hi] per axis, t_seed <= max seed) and
    slab-test every super AABB against the whole interval family: per axis,
    the lower bound of t_near over the family is the min of the four interval
    endpoint products (b - o)/d, and the upper bound of t_far is the max —
    conservative for any monotone 1/d over a sign-definite interval. An axis
    whose direction interval spans zero gives no constraint (rays diverge).
    The result strictly overestimates the per-ray slab pass set, so no hit is
    ever lost; the in-kernel per-ray slab re-test (against the *shrinking*
    best t) removes the slack.

    Returns (cand, cnt): cand (nt, S) int32 super ids sorted front-to-back by
    conservative entry distance (padding after cnt[i] never read — the kernel
    loop bound is cnt), cnt (nt,) int32 candidate counts. This is the work
    list that drives the kernel's double-buffered HBM->VMEM corner streaming:
    supers that no ray in the tile can touch are never DMA'd at all.
    """
    comps = [c.reshape(nt, TILE[0], TILE[1]) for c in tiles[:6]]
    if n_ray_ops == 7:
        # lanes with a non-positive best-t seed are DEAD (already-decided
        # shadow rays, parked miss lanes): exclude them from the interval
        # family — one parked lane must not widen the tile's frustum to the
        # whole scene. All-dead tiles get tmax 0 (mask all-false; the inf
        # sentinels can surface as NaN slab bounds there, whose comparisons
        # are false — harmless by construction).
        seed = tiles[6].reshape(nt, TILE[0], TILE[1])
        alive = seed > 0.0
        inf = jnp.asarray(jnp.inf, tiles[0].dtype)
        lo_of = lambda c: jnp.where(alive, c, inf).min((1, 2))
        hi_of = lambda c: jnp.where(alive, c, -inf).max((1, 2))
        tmax_t = jnp.where(alive, jnp.minimum(seed, t_far), 0.0).max((1, 2))
    else:
        lo_of = lambda c: c.min((1, 2))
        hi_of = lambda c: c.max((1, 2))
        tmax_t = jnp.full((nt,), t_far, tiles[0].dtype)
    o_lo = jnp.stack([lo_of(c) for c in comps[:3]], -1)  # (nt, 3)
    o_hi = jnp.stack([hi_of(c) for c in comps[:3]], -1)
    d_lo = jnp.stack([lo_of(c) for c in comps[3:6]], -1)
    d_hi = jnp.stack([hi_of(c) for c in comps[3:6]], -1)

    lo = accel.super_aabb[:, 0:3][None]  # (1, S, 3)
    hi = accel.super_aabb[:, 3:6][None]
    eps = 1e-12
    mixed = (d_lo[:, None] < eps) & (d_hi[:, None] > -eps)  # (nt, 1, 3)
    safe = lambda v: jnp.where(jnp.abs(v) < eps, jnp.where(v < 0, -eps, eps), v)
    inv1 = 1.0 / safe(d_lo)[:, None]  # (nt, 1, 3)
    inv2 = 1.0 / safe(d_hi)[:, None]
    num_l1 = lo - o_hi[:, None]  # (nt, S, 3)
    num_l2 = lo - o_lo[:, None]
    num_h1 = hi - o_hi[:, None]
    num_h2 = hi - o_lo[:, None]
    prods_lo = jnp.stack([num_l1 * inv1, num_l1 * inv2,
                          num_l2 * inv1, num_l2 * inv2])
    prods_hi = jnp.stack([num_h1 * inv1, num_h1 * inv2,
                          num_h2 * inv1, num_h2 * inv2])
    big = jnp.asarray(1e30, tiles[0].dtype)
    t_near_ax = jnp.minimum(jnp.minimum(prods_lo.min(0), prods_hi.min(0)),
                            jnp.where(mixed, -big, big))
    t_far_ax = jnp.maximum(jnp.maximum(prods_lo.max(0), prods_hi.max(0)),
                           jnp.where(mixed, big, -big))
    tn = jnp.maximum(t_near_ax.max(-1), 0.0)  # (nt, S)
    tf = t_far_ax.min(-1)
    # the explicit tmax_t > 0 term excludes ALL-dead tiles (every lane
    # 0-seeded) without relying on NaN propagation through the slab bounds
    # (inf sentinels -> NaN tn/tf -> comparisons false happens to work, but
    # an explicit guard is auditable)
    mask = (tf >= tn) & (tn < tmax_t[:, None]) & (tmax_t[:, None] > 0.0)
    key = jnp.where(mask, tn, jnp.inf)
    cand = jnp.argsort(key, axis=1).astype(jnp.int32)  # front-to-back
    cnt = mask.sum(1, dtype=jnp.int32)  # (nt,)
    # the sorted conservative entry distances drive the kernel's early exit:
    # once key[k] >= every lane's current best t, no later candidate (sorted
    # ascending) can produce a closer hit
    key_sorted = jnp.take_along_axis(key, cand, axis=1)
    return cand, cnt, key_sorted


def intersect_packet_streamed(accel: PacketAccel, o: jnp.ndarray,
                              d: jnp.ndarray, t_max: float = BIG,
                              any_hit: bool = False,
                              t_init: jnp.ndarray | None = None,
                              interpret: bool | None = None) -> TriHit:
    """Closest-hit (or any-hit) with the accel resident in HBM (SURVEY.md §7
    hard part 2): removes the VMEM mesh-size cap of `intersect_packet`.

    Per ray tile, the kernel walks ONLY the supers on the tile's precomputed
    candidate list (see _tile_super_candidates), streaming each candidate's
    corner rows + chunk AABBs HBM->VMEM with double-buffered async copies:
    the copy for candidate k+1 is issued before candidate k is processed, so
    DMA latency hides behind the 16-chunk Moller-Trumbore work. best_t is
    carried across the WHOLE mesh in one kernel (no cross-part reseeding),
    and candidates are ordered front-to-back by conservative entry distance,
    so an early hit slab-culls everything behind it — compute for a culled
    candidate is skipped even though its stream was already in flight.

    Unlike the resident kernel there is no per-call VMEM budget: scratch is
    2 slots x one super (16 chunks = 2048 triangles, ~136 KB), whatever the
    mesh size. Super AABBs (S x 128 f32) stay VMEM-resident for the re-test.

    The per-tile candidate lists ride in SMEM ((nt, S) int32, scalar
    prefetch), whose scoped budget is ~1 MB: batches whose nt x S would
    overflow it are auto-split along the ray axis into sequential sub-calls
    (e.g. an UNBLOCKED 1080p frame over a large mesh) — callers never see
    the constraint.
    """
    if interpret is None:
        interpret = _use_interpret()
    n_supers_ = accel.super_aabb.shape[0]
    # two (nt, S) scalar-prefetch arrays ride in SMEM: int32 candidate ids +
    # f32 sorted entry distances (the early-exit keys)
    tiles_budget = _SMEM_CAND_BUDGET // (8 * n_supers_)
    max_rays = max(tiles_budget, 1) * TILE_RAYS
    if o.shape[0] > max_rays:
        outs = []
        for s in range(0, o.shape[0], max_rays):
            outs.append(intersect_packet_streamed(
                accel, o[s:s + max_rays], d[s:s + max_rays], t_max=t_max,
                any_hit=any_hit,
                t_init=None if t_init is None else t_init[s:s + max_rays],
                interpret=interpret))
        return TriHit(jnp.concatenate([r.t for r in outs]),
                      jnp.concatenate([r.tri for r in outs]),
                      jnp.concatenate([r.hit for r in outs]))
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    dtype = o.dtype
    t_far = float(min(t_max, BIG))

    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]
    n_ray_ops = 6
    if t_init is not None:
        comps.append(jax.lax.stop_gradient(t_init))
        n_ray_ops = 7
    tiles = []
    R = nt = None
    for c in comps:
        tc, R, nt = _tileize(c)
        tiles.append(tc)

    n_supers = accel.super_aabb.shape[0]
    cand, cnt, keys = _tile_super_candidates(tiles, n_ray_ops, nt, accel,
                                             t_far)

    rows_per_super = SUPER * ROWS_PER_CHUNK

    def kernel(*refs):
        # scalar-prefetch SMEM (full): candidate ids, counts, entry keys
        cand_ref, cnt_ref, key_ref = refs[0], refs[1], refs[2]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref) = refs[3:9]
        ti_ref = refs[9] if n_ray_ops == 7 else None
        sup_ref, cor_hbm, cab_hbm, t_ref, tri_ref, cor_scr, cab_scr, sems = \
            refs[3 + n_ray_ops:]
        i = pl.program_id(0)
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        sgn = lambda v: jnp.where(v >= 0.0, 1.0, -1.0)
        inv_x = sgn(dx) / jnp.maximum(jnp.abs(dx), 1e-12)
        inv_y = sgn(dy) / jnp.maximum(jnp.abs(dy), 1e-12)
        inv_z = sgn(dz) / jnp.maximum(jnp.abs(dz), 1e-12)

        t_ref[:] = jnp.minimum(ti_ref[:], t_far) if ti_ref is not None \
            else ox * 0.0 + t_far
        tri_ref[:] = ox * 0.0 - 1.0

        def slab(ab, best):
            t0x = (ab[0, 0] - ox) * inv_x
            t1x = (ab[0, 3] - ox) * inv_x
            t0y = (ab[0, 1] - oy) * inv_y
            t1y = (ab[0, 4] - oy) * inv_y
            t0z = (ab[0, 2] - oz) * inv_z
            t1z = (ab[0, 5] - oz) * inv_z
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            tn = jnp.maximum(tn, 0.0)
            return (tf >= tn) & (tn < best)

        def current_best():
            best = t_ref[:]
            if any_hit:
                best = jnp.where(tri_ref[:] >= 0.0, 0.0, best)
            return best

        n_cand = cnt_ref[i]

        def dmas(slot, si):
            cor_base = si * rows_per_super
            return (
                pltpu.make_async_copy(
                    cor_hbm.at[pl.ds(cor_base, rows_per_super), :],
                    cor_scr.at[pl.ds(slot * rows_per_super, rows_per_super), :],
                    sems.at[slot, 0]),
                pltpu.make_async_copy(
                    cab_hbm.at[pl.ds(si * SUPER, SUPER), :],
                    cab_scr.at[pl.ds(slot * SUPER, SUPER), :],
                    sems.at[slot, 1]),
            )

        @pl.when(n_cand > 0)
        def _():
            for c in dmas(0, cand_ref[i, 0]):
                c.start()

        def cond(carry):
            k, stop = carry
            return (k < n_cand) & jnp.logical_not(stop)

        def body(carry):
            k, _ = carry
            slot = jax.lax.rem(k, jnp.int32(2))
            si = cand_ref[i, k]

            @pl.when(k + 1 < n_cand)
            def _():  # issue next stream before touching this one
                for c in dmas(jax.lax.rem(k + 1, jnp.int32(2)),
                              cand_ref[i, k + 1]):
                    c.start()

            for c in dmas(slot, si):
                c.wait()

            sab = sup_ref[pl.ds(si, 1), :]
            s_active = slab(sab, current_best())

            @pl.when(jnp.any(s_active))
            def _():
                def chunk_inner(k2, _):
                    # TWO chunks per branch decision (VERDICT r2 item 4): the
                    # any-lane reduce + scalar branch costs ~hundreds of
                    # cycles per iteration; adjacent Morton chunks are
                    # spatially adjacent, so a tile that reaches one usually
                    # reaches its pair — halving branch count costs little
                    # wasted MT work. The pair's slab masks OR together
                    # (vector op) before the single cross-lane reduce.
                    best = current_best()
                    c0 = slot * SUPER + 2 * k2
                    ab0 = cab_scr[pl.ds(c0, 1), :]
                    ab1 = cab_scr[pl.ds(c0 + 1, 1), :]
                    c_active = slab(ab0, best) | slab(ab1, best)

                    @pl.when(jnp.any(c_active))
                    def _():
                        base = pl.multiple_of(
                            slot * rows_per_super + 2 * k2 * ROWS_PER_CHUNK,
                            ROWS_PER_CHUNK)
                        rows2 = cor_scr[pl.ds(base, 2 * ROWS_PER_CHUNK), :]
                        best_t, best_tri = t_ref[:], tri_ref[:]
                        for h in range(2):
                            cbase = ((si * SUPER + 2 * k2 + h) * CHUNK
                                     ).astype(jnp.float32)
                            best_t, best_tri = _mt_chunk_update(
                                rows2[h * ROWS_PER_CHUNK:
                                      (h + 1) * ROWS_PER_CHUNK],
                                ox, oy, oz, dx, dy, dz,
                                best_t, best_tri, cbase, t_far)
                        t_ref[:] = best_t
                        tri_ref[:] = best_tri

                    return 0

                jax.lax.fori_loop(0, SUPER // 2, chunk_inner, 0)

            # Early exit (the knot-scale fix, VERDICT r4 item 6): candidates
            # are sorted by conservative entry distance, so once the NEXT
            # key is at or beyond every lane's current best t, no remaining
            # candidate can improve any lane — stop streaming the rest of
            # the mesh past this tile. For any-hit, current_best() is 0 on
            # blocked lanes, so an all-blocked tile stops at the next step.
            kk = jnp.minimum(k + 1, jnp.maximum(n_cand - 1, 0))
            stop = key_ref[i, kk] >= jnp.max(current_best())
            return k + 1, stop

        k_end, stopped = jax.lax.while_loop(
            cond, body, (jnp.int32(0), n_cand <= 0))
        # drain: body(k) issues candidate k+1's stream before processing k,
        # so an early exit at k_end leaves k_end's copies in flight with
        # nobody waiting — the scratch semaphores persist across grid steps
        # and a stale signal would corrupt the next tile's pipeline
        @pl.when(stopped & (k_end < n_cand))
        def _():
            for c in dmas(jax.lax.rem(k_end, jnp.int32(2)),
                          cand_ref[i, k_end]):
                c.wait()

    out_shape = [
        jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), dtype),
        jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), dtype),
    ]
    # cand/cnt ride as scalar-prefetch SMEM arrays (full, grid-indexed in
    # the kernel via program_id) — blocked SMEM specs don't lower on Mosaic
    ray_spec = pl.BlockSpec(TILE, lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    sup_full = pl.BlockSpec(accel.super_aabb.shape, lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=[ray_spec] * n_ray_ops + [sup_full, hbm, hbm],
        out_specs=[ray_spec, ray_spec],
        scratch_shapes=[
            pltpu.VMEM((2 * rows_per_super, CHUNK), jnp.float32),
            pltpu.VMEM((2 * SUPER, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    t, tri_f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(cand, cnt, keys, *tiles, accel.super_aabb, accel.corners,
      accel.chunk_aabb)
    return _finalize_hits(t, tri_f, accel, R, any_hit)


def any_hit_packet(accel: PacketAccel, o, d, t_max: float = BIG,
                   interpret: bool | None = None):
    return intersect_packet(accel, o, d, t_max=t_max, any_hit=True,
                            interpret=interpret).hit


def intersect_packet_parts(parts, o, d, t_max: float = BIG, any_hit: bool = False,
                           sort_origin=None, sort_dir=None, t_init=None,
                           interpret: bool | None = None) -> TriHit:
    """Closest-hit (or any-hit) over a list of VMEM-sized accel parts.

    Parts are intersected sequentially with the running per-ray best t
    threaded into each next call as its t_init seed (cross-part t_max
    shrink): part N+1 slab-culls every chunk beyond part N's hits. Any-hit
    threads a 0-seed for already-blocked rays, culling all their work.
    Results merge by min-t; perm in each part maps to ORIGINAL triangle ids.
    t_init additionally seeds the FIRST part (mixed scenes pass the SDF hit t;
    any-hit callers pass 0 for rays whose shadow is already decided).
    """
    best = None
    t_run = t_init
    for accel in parts:
        accel_bytes = (accel.corners.size + accel.chunk_aabb.size
                       + accel.super_aabb.size) * 4
        if len(parts) == 1 or accel_bytes > VMEM_BUDGET_BYTES:
            # Default path: HBM-streamed kernel. Its per-tile candidate
            # lists (conservative frustum-vs-super cull, front-to-back)
            # subsume sort_origin/sort_dir AND beat the VMEM-resident
            # kernel even for small meshes (measured on-chip: mixed 1080p
            # 5.37s -> 4.82s, 70k-tri intersect 2.8 -> 3.5 Mrays/s),
            # besides removing the VMEM mesh-size cap.
            res = intersect_packet_streamed(accel, o, d, t_max=t_max,
                                            any_hit=any_hit, t_init=t_run,
                                            interpret=interpret)
        else:
            # legacy multi-part walk (streamed=False builds): VMEM-resident
            # kernel per part with cross-part t threading
            res = intersect_packet(accel, o, d, t_max=t_max, any_hit=any_hit,
                                   sort_origin=sort_origin, sort_dir=sort_dir,
                                   t_init=t_run, interpret=interpret)
        if best is None:
            best = res
        elif any_hit:
            hit = best.hit | res.hit
            best = TriHit(jnp.where(best.hit, best.t, res.t),
                          jnp.where(hit, 0, -1), hit)
        else:
            better = res.hit & (res.t < best.t)
            best = TriHit(jnp.where(better, res.t, best.t),
                          jnp.where(better, res.tri, best.tri),
                          best.hit | res.hit)
        if len(parts) > 1:
            if any_hit:
                t_run = jnp.where(best.hit, 0.0, jnp.full_like(best.t, t_max))
            else:
                t_run = jnp.minimum(best.t, t_max)
            if t_init is not None:  # keep the caller's bound where unimproved
                t_run = jnp.minimum(t_run, t_init)
    return best
