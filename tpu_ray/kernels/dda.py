"""3D-DDA uniform-grid traversal (Amanatides–Woo) as a lockstep masked loop.

TPU-native equivalent of the reference's Grid::Intersect (SURVEY.md §2 #8,
§3.4 — "the HOTTEST loop in the framework"). Design departures from the
scalar C++:

  * all rays advance cell-by-cell IN LOCKSTEP through a `lax.while_loop`
    whose condition is "any lane alive"; per-lane state (cell index, tMax per
    axis, best hit) lives in fixed-shape arrays and dead lanes are frozen by
    masks (SURVEY.md §7 hard part 1);
  * per-cell triangle lists (CSR from tpu_ray/accel/grid_build.py) are walked in
    fixed-size chunks; the chunk count per step is the runtime max over the
    live lanes, so sparse cells don't pay for dense ones;
  * the correctness subtlety of grid traversal is kept: a recorded hit is
    only ACCEPTED (lane retired) once best_t <= the current cell's exit t,
    since a triangle tested in an earlier cell can have its hit point in a
    later cell (SURVEY.md §3.4);
  * traversal is selection-only and runs under stop_gradient; gradients
    w.r.t. vertices/rays flow through the differentiable hit recompute
    (moller_trumbore.recompute_hit), exactly like the brute path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_ray.accel.grid_build import UniformGrid
from tpu_ray.core.aabb import ray_aabb, safe_inv_dir
from tpu_ray.kernels.moller_trumbore import BIG, TriHit, _mt_t
from tpu_ray.scene.mesh import MeshScene

_CHUNK = 16  # triangle tests per lane per inner iteration
_EXIT_EPS = 1e-6  # tolerance on the "hit within current cell" acceptance


def intersect_grid(mesh: MeshScene, grid: UniformGrid, o: jnp.ndarray,
                   d: jnp.ndarray, t_max: float = BIG,
                   any_hit: bool = False) -> TriHit:
    """Closest-hit (or any-hit) DDA traversal for a flat ray batch (R, 3)."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    verts = jax.lax.stop_gradient(mesh.verts)
    tris = mesh.tris
    dtype = o.dtype

    R = o.shape[0]
    rx, ry, rz = grid.res
    res = jnp.asarray(grid.res, jnp.int32)
    origin = grid.origin.astype(dtype)
    h = grid.cell_size.astype(dtype)
    L = grid.tri_idx.shape[0]

    if L == 0 or mesh.num_tris == 0:
        return TriHit(jnp.full((R,), BIG, dtype), jnp.full((R,), -1, jnp.int32),
                      jnp.zeros((R,), bool))

    inv_d = safe_inv_dir(d)
    box_max = origin + h * res.astype(dtype)
    t_enter, t_exit, box_hit = ray_aabb(o, inv_d, origin, box_max)

    # initial cell: nudge the entry point inside; clamp handles boundary fp
    p_in = o + (t_enter + 1e-5)[..., None] * d
    cell0 = jnp.clip(jnp.floor((p_in - origin) / h).astype(jnp.int32), 0, res - 1)
    step = jnp.where(d >= 0.0, 1, -1).astype(jnp.int32)
    next_b = origin + (cell0 + (step > 0)).astype(dtype) * h
    t_axis = (next_b - o) * inv_d  # absolute t of next boundary crossing per axis
    # axis-parallel rays never cross that axis' planes
    t_axis = jnp.where(jnp.abs(d) < 1e-12, BIG, t_axis)
    t_delta = jnp.where(jnp.abs(d) < 1e-12, BIG, h * jnp.abs(inv_d))

    alive0 = box_hit & (t_enter < t_max)
    state = dict(
        cell=cell0,
        t_axis=t_axis,
        alive=alive0,
        best_t=jnp.full((R,), BIG, dtype),
        best_tri=jnp.full((R,), -1, jnp.int32),
    )

    def flat_cell(cell):
        return (cell[:, 0] * ry + cell[:, 1]) * rz + cell[:, 2]

    karange = jnp.arange(_CHUNK, dtype=jnp.int32)

    def test_cell_tris(cidx, alive, best_t, best_tri):
        start = grid.cell_starts[cidx]
        count = grid.cell_starts[cidx + 1] - start
        count = jnp.where(alive, count, 0)
        n_chunks = (jnp.max(count) + _CHUNK - 1) // _CHUNK

        def chunk_body(k, carry):
            best_t, best_tri = carry
            offs = k * _CHUNK + karange  # (K,)
            lane_valid = offs[None, :] < count[:, None]  # (R, K)
            idxs = jnp.clip(start[:, None] + offs[None, :], 0, L - 1)
            tri_ids = grid.tri_idx[idxs]  # (R, K)
            tv = tris[tri_ids]  # (R, K, 3)
            v0 = verts[tv[..., 0]]
            v1 = verts[tv[..., 1]]
            v2 = verts[tv[..., 2]]
            t, valid = _mt_t(o[:, None, :], d[:, None, :], v0, v1, v2, t_max)
            t = jnp.where(lane_valid & valid, t, BIG)
            tc = jnp.min(t, axis=-1)
            ic = jnp.take_along_axis(tri_ids, jnp.argmin(t, axis=-1)[:, None], axis=-1)[:, 0]
            better = tc < best_t
            return jnp.where(better, tc, best_t), jnp.where(better, ic, best_tri)

        return jax.lax.fori_loop(0, n_chunks, chunk_body, (best_t, best_tri))

    def cond(s):
        return jnp.any(s["alive"])

    def body(s):
        cell, t_axis, alive = s["cell"], s["t_axis"], s["alive"]
        cidx = flat_cell(cell)
        best_t, best_tri = test_cell_tris(cidx, alive, s["best_t"], s["best_tri"])

        cell_exit = jnp.min(t_axis, axis=-1)
        if any_hit:
            accepted = best_t < BIG * 0.5
        else:
            accepted = best_t <= cell_exit + _EXIT_EPS
        # advance the axis with the smallest boundary crossing
        axis = jnp.argmin(t_axis, axis=-1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        cell_next = cell + onehot * step
        t_axis_next = t_axis + onehot.astype(dtype) * t_delta
        inbounds = jnp.all((cell_next >= 0) & (cell_next < res), axis=-1)
        # beyond t_max: nothing closer can appear in later cells
        reachable = cell_exit < t_max
        alive_next = alive & (~accepted) & inbounds & reachable

        keep = alive[:, None]
        return dict(
            cell=jnp.where(keep, cell_next, cell),
            t_axis=jnp.where(keep, t_axis_next, t_axis),
            alive=alive_next,
            best_t=best_t,
            best_tri=best_tri,
        )

    out = jax.lax.while_loop(cond, body, state)
    hit = out["best_t"] < BIG * 0.5
    return TriHit(out["best_t"], jnp.where(hit, out["best_tri"], -1), hit)


def any_hit_grid(mesh: MeshScene, grid: UniformGrid, o, d, t_max: float = BIG):
    return intersect_grid(mesh, grid, o, d, t_max=t_max, any_hit=True).hit
