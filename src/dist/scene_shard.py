"""Ring scene-shard intersection: primitive partitioning across chips.

TPU-native equivalent of component P3 (SURVEY.md §2b "Scene/model
parallelism"): when the triangle set exceeds per-chip memory, each chip holds
1/N of the triangles and the CLOSEST-HIT state stays resident with the rays
while scene shards rotate around the ring via `lax.ppermute` — exactly the
ring-attention communication pattern with "KV" = triangle shards and the
running min-t hit as the accumulator (SURVEY.md §5). N-1 permutes per frame,
each overlappable with the local intersection of the shard in hand.

Works inside a shard_map over the ray axis; triangle arrays must be
pre-partitioned per device (see `partition_mesh`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from src.dist.sharding import RAY_AXIS
from src.kernels.moller_trumbore import BIG, TriHit, _mt_t


def partition_mesh(verts: np.ndarray, tris: np.ndarray, n_shards: int):
    """Host-side: split triangles into n equal shards of gathered corners.

    Returns (v0, v1, v2, tri_id) stacked per shard with shape
    (n_shards, T_pad, 3) / (n_shards, T_pad): corner positions are gathered
    (no shared vertex buffer) so a shard is self-contained for the ring.
    Padding uses degenerate triangles (zero area -> det==0 -> never hit).
    """
    tris = np.asarray(tris).reshape(-1, 3)
    T = tris.shape[0]
    t_pad = -(-T // n_shards) * n_shards
    corners = np.asarray(verts)[tris]  # (T, 3, 3)
    pad = t_pad - T
    if pad:
        corners = np.concatenate([corners, np.zeros((pad, 3, 3))], 0)
    tri_id = np.concatenate([np.arange(T), np.full(pad, -1)]).astype(np.int32)
    per = t_pad // n_shards
    c = corners.reshape(n_shards, per, 3, 3)
    ids = tri_id.reshape(n_shards, per)
    return c[:, :, 0], c[:, :, 1], c[:, :, 2], ids


def intersect_ring(o, d, v0, v1, v2, tri_id, t_max: float = BIG,
                   axis_name: str = RAY_AXIS) -> TriHit:
    """Closest hit over ALL shards' triangles, rays resident per device.

    Call inside shard_map: o, d are this device's ray block (R, 3); v0..tri_id
    are this device's triangle shard (T_s, 3). After N ring steps every ray
    has seen every triangle; results are identical to a brute intersect over
    the concatenated mesh (up to tie order — ties broken by global tri id).
    """
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def local_test(carry, shard):
        best_t, best_tri = carry
        sv0, sv1, sv2, sid = shard
        t, valid = _mt_t(o[:, None, :], d[:, None, :], sv0, sv1, sv2, t_max)
        t = jnp.where(valid & (sid >= 0), t, BIG)
        # break min ties by smallest global tri id for determinism
        tc = jnp.min(t, axis=-1)
        is_min = t <= tc[:, None] + 0.0
        id_masked = jnp.where(is_min & (t < BIG * 0.5), sid, jnp.iinfo(jnp.int32).max)
        ic = jnp.min(id_masked, axis=-1)
        better = (tc < best_t) | ((tc == best_t) & (ic < best_tri) & (tc < BIG * 0.5))
        return (jnp.where(better, tc, best_t),
                jnp.where(better, ic, best_tri).astype(jnp.int32))

    best_t = jnp.full(o.shape[:-1], BIG, o.dtype)
    best_tri = jnp.full(o.shape[:-1], jnp.iinfo(jnp.int32).max, jnp.int32)
    shard = (v0, v1, v2, tri_id)
    for step in range(n):
        best_t, best_tri = local_test((best_t, best_tri), shard)
        if step + 1 < n:
            shard = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis_name, perm), shard)

    hit = best_t < BIG * 0.5
    return TriHit(best_t, jnp.where(hit, best_tri, -1), hit)
