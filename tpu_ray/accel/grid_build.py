"""Uniform-grid acceleration structure: host-side build, device-side CSR.

TPU-native equivalent of the reference's Grid::Build (SURVEY.md §2 #7,
reference grid.cpp): voxelize the mesh by binning each triangle into every
cell its AABB overlaps, then store cell→triangle lists in CSR form
(`cell_starts`, `tri_idx`). The build runs once on host in numpy (it is O(T)
and latency-insensitive); traversal reads the CSR arrays on device
(tpu_ray/kernels/dda.py).

TPU-first design notes:
  * CSR arrays have a fixed length per scene, so every kernel shape is
    static; per-cell lists are walked in fixed-size chunks bounded by the
    build-time `max_per_cell` (SURVEY.md §7 hard part 1);
  * the grid is an acceleration structure, not a parameter: gradients flow
    through the Möller–Trumbore hit recompute, never through voxelization
    (rebuild the grid after vertex updates, as the reference rebuilds on
    mesh change).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class UniformGrid:
    origin: jnp.ndarray  # (3,) world-space min corner
    cell_size: jnp.ndarray  # (3,)
    cell_starts: jnp.ndarray  # (C+1,) int32 CSR offsets, C = rx*ry*rz
    tri_idx: jnp.ndarray  # (L,) int32 triangle ids, cell-major
    res: tuple = struct.field(pytree_node=False, default=(1, 1, 1))
    max_per_cell: int = struct.field(pytree_node=False, default=0)

    @property
    def num_cells(self) -> int:
        rx, ry, rz = self.res
        return rx * ry * rz


def build_grid(verts: np.ndarray, tris: np.ndarray, density: float = 5.0,
               max_res: int = 128) -> UniformGrid:
    """Voxelize triangles into a uniform grid.

    Resolution follows the classic heuristic: cells-per-axis proportional to
    the axis extent with ~`density` cells per triangle overall
    (res_a = extent_a * (density*T/V)^(1/3)), clamped to max_res.
    """
    verts = np.asarray(verts, np.float64)
    tris = np.asarray(tris, np.int64).reshape(-1, 3)
    T = tris.shape[0]
    if T == 0:
        return UniformGrid(
            origin=jnp.zeros(3, jnp.float32),
            cell_size=jnp.ones(3, jnp.float32),
            cell_starts=jnp.zeros(2, jnp.int32),
            tri_idx=jnp.zeros(0, jnp.int32),
            res=(1, 1, 1), max_per_cell=0,
        )

    lo = verts.min(0)
    hi = verts.max(0)
    extent = np.maximum(hi - lo, 1e-9)
    # pad so boundary triangles land strictly inside
    pad = extent * 1e-4 + 1e-9
    lo = lo - pad
    hi = hi + pad
    extent = hi - lo

    vol = float(np.prod(extent))
    lam = (density * T / vol) ** (1.0 / 3.0)
    res = np.clip(np.ceil(extent * lam).astype(np.int64), 1, max_res)
    rx, ry, rz = (int(r) for r in res)
    h = extent / res

    tv = verts[tris]  # (T, 3, 3)
    tlo = tv.min(1)
    thi = tv.max(1)
    clo = np.clip(np.floor((tlo - lo) / h).astype(np.int64), 0, res - 1)
    chi = np.clip(np.floor((thi - lo) / h).astype(np.int64), 0, res - 1)

    # emit (cell, tri) pairs; loop over the small per-tri span offsets so the
    # inner work stays vectorized over all triangles
    span = chi - clo + 1
    max_span = span.max(0)
    cells_list = []
    tris_list = []
    for dx in range(int(max_span[0])):
        mx = dx < span[:, 0]
        for dy in range(int(max_span[1])):
            my = mx & (dy < span[:, 1])
            for dz in range(int(max_span[2])):
                m = my & (dz < span[:, 2])
                if not m.any():
                    continue
                t_ids = np.nonzero(m)[0]
                c = ((clo[t_ids, 0] + dx) * ry + (clo[t_ids, 1] + dy)) * rz + (clo[t_ids, 2] + dz)
                cells_list.append(c)
                tris_list.append(t_ids)
    cells = np.concatenate(cells_list)
    tri_ids = np.concatenate(tris_list)

    order = np.argsort(cells, kind="stable")
    cells = cells[order]
    tri_ids = tri_ids[order]
    C = rx * ry * rz
    counts = np.bincount(cells, minlength=C)
    starts = np.zeros(C + 1, np.int64)
    np.cumsum(counts, out=starts[1:])

    return UniformGrid(
        origin=jnp.asarray(lo, jnp.float32),
        cell_size=jnp.asarray(h, jnp.float32),
        cell_starts=jnp.asarray(starts, jnp.int32),
        tri_idx=jnp.asarray(tri_ids, jnp.int32),
        res=(rx, ry, rz),
        max_per_cell=int(counts.max()) if C else 0,
    )


def grid_stats(grid: UniformGrid) -> dict:
    starts = np.asarray(grid.cell_starts)
    counts = np.diff(starts)
    return {
        "res": grid.res,
        "cells": int(counts.size),
        "occupied": int((counts > 0).sum()),
        "pairs": int(starts[-1]),
        "max_per_cell": int(grid.max_per_cell),
        "mean_per_occupied": float(counts[counts > 0].mean()) if (counts > 0).any() else 0.0,
    }
