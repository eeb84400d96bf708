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
from flax import struct

from tpu_ray.dist.sharding import RAY_AXIS
from tpu_ray.kernels.moller_trumbore import BIG, TriHit, _mt_t


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


# ---------------------------------------------------------------------------
# Ring scene-shard with the PACKET accel (the production path, VERDICT r1 #3)
# ---------------------------------------------------------------------------

@struct.dataclass
class RingPacket:
    """Per-device shard of the packet accel, stacked on a leading shard axis
    host-side ((n, ...) arrays, shard_map in_spec P(RAY_AXIS)); inside the
    shard region each device holds its (...) slice. All shards are padded to
    identical chunk/super counts so `ppermute` is shape-uniform.

    axis: the mesh axis name the ring rotates over (static)."""

    corners: jnp.ndarray  # (C*16, 128) per device after sharding
    chunk_aabb: jnp.ndarray  # (C, 128)
    super_aabb: jnp.ndarray  # (S, 128)
    perm: jnp.ndarray  # (Tpad,) original GLOBAL tri ids (-1 pad)
    n_shards: int = struct.field(pytree_node=False, default=1)
    axis: str = struct.field(pytree_node=False, default=RAY_AXIS)


def build_ring_packet(verts: np.ndarray, tris: np.ndarray, n_shards: int,
                      axis: str = RAY_AXIS) -> RingPacket:
    """Host-side: Morton-sort the whole mesh, split into n contiguous
    (spatially compact) shards, build one packet accel per shard, pad all to
    the max chunk/super count, stack on a leading shard axis.

    Per-chip accel memory drops n x vs replication — the accel (256 B/tri) is
    the dominant mesh memory term, so this is what lets meshes beyond one
    chip's budget render (SURVEY.md §2b P3, §5 ring pipeline)."""
    from tpu_ray.accel.packet import (CHUNK, ROWS_PER_CHUNK, SUPER,
                                  build_packet_accel, _morton_order)

    tris = np.asarray(tris, np.int64).reshape(-1, 3)
    verts64 = np.asarray(verts, np.float64)
    order = _morton_order(verts64, tris)
    T = tris.shape[0]
    per = -(-T // n_shards)
    accels = []
    for s in range(n_shards):
        sel = order[s * per:(s + 1) * per]
        accels.append(build_packet_accel(verts, tris[sel], tri_id_base=sel))
    # pad every shard to the max supers so shapes are ring-uniform
    max_s = max(a.super_aabb.shape[0] for a in accels)
    max_c = max_s * SUPER
    big = 1e10

    def pad_accel(a):
        C = a.chunk_aabb.shape[0]
        S = a.super_aabb.shape[0]
        cor = np.zeros((max_c * ROWS_PER_CHUNK, CHUNK), np.float32)
        cor[:C * ROWS_PER_CHUNK] = np.asarray(a.corners)
        ab = np.zeros((max_c, 128), np.float32)
        ab[:, 0:3] = big; ab[:, 3:6] = -big
        ab[:C] = np.asarray(a.chunk_aabb)
        sup = np.zeros((max_s, 128), np.float32)
        sup[:, 0:3] = big; sup[:, 3:6] = -big
        sup[:S] = np.asarray(a.super_aabb)
        perm = np.full((max_c * CHUNK,), -1, np.int32)
        perm[:a.perm.shape[0]] = np.asarray(a.perm)
        return cor, ab, sup, perm

    padded = [pad_accel(a) for a in accels]
    return RingPacket(
        corners=jnp.asarray(np.stack([p[0] for p in padded])),
        chunk_aabb=jnp.asarray(np.stack([p[1] for p in padded])),
        super_aabb=jnp.asarray(np.stack([p[2] for p in padded])),
        perm=jnp.asarray(np.stack([p[3] for p in padded])),
        n_shards=n_shards,
        axis=axis,
    )


def ring_local(ring: RingPacket) -> RingPacket:
    """Strip the (length-1) leading shard axis of a shard_map block."""
    sq = lambda x: x.reshape(x.shape[1:])
    return ring.replace(corners=sq(ring.corners), chunk_aabb=sq(ring.chunk_aabb),
                        super_aabb=sq(ring.super_aabb), perm=sq(ring.perm))


def refit_ring_packet(ring: RingPacket, verts, tris) -> RingPacket:
    """Recompute a LOCAL ring shard's corners + AABBs from CURRENT vertex
    positions (ADVICE r2: vertex fits with scene_shards=True must not
    intersect frozen build-time geometry). Pure jnp — runs inside the jitted
    fit step, before the ring rotation starts, so every ppermute'd shard is
    already refit. `ring` must be a per-device local shard (after
    ring_local); `perm` holds GLOBAL tri ids, so the packet refit applies
    verbatim."""
    from tpu_ray.accel.packet import PacketAccel, refit_packet_accel

    view = PacketAccel(corners=ring.corners, chunk_aabb=ring.chunk_aabb,
                       super_aabb=ring.super_aabb, perm=ring.perm,
                       num_tris=ring.perm.shape[0])
    new = refit_packet_accel(view, verts, tris)
    return ring.replace(corners=new.corners, chunk_aabb=new.chunk_aabb,
                        super_aabb=new.super_aabb)


def intersect_ring_packet(ring: RingPacket, o, d, t_max: float = BIG,
                          any_hit: bool = False, sort_origin=None,
                          sort_dir=None, interpret=None) -> TriHit:
    """Closest-hit (or any-hit) over ALL shards' triangles with the packet
    kernel: rays and the best-hit accumulator stay resident per device while
    accel shards rotate via `ppermute` (ring attention's pattern, "KV" =
    triangle shards). The running best t seeds each step's kernel (t_init),
    so later shards slab-cull everything beyond hits already found. Call
    inside shard_map over ring.axis; returns GLOBAL triangle ids."""
    from tpu_ray.accel.packet import VMEM_BUDGET_BYTES, PacketAccel
    from tpu_ray.kernels.pallas_mt import intersect_packet, intersect_packet_streamed

    n = ring.n_shards
    perm_pairs = [(i, (i + 1) % n) for i in range(n)]
    shard = (ring.corners, ring.chunk_aabb, ring.super_aabb, ring.perm)
    # a 1/N shard can still exceed the VMEM-resident kernel's budget (ring
    # sharding exists precisely for huge meshes) — route oversized shards
    # through the HBM-streamed kernel, whose per-tile candidate lists subsume
    # the sort hints (ADVICE r2)
    shard_bytes = (ring.corners.size + ring.chunk_aabb.size
                   + ring.super_aabb.size) * 4
    streamed = shard_bytes > VMEM_BUDGET_BYTES
    best = None
    t_run = None
    for step in range(n):
        accel = PacketAccel(corners=shard[0], chunk_aabb=shard[1],
                            super_aabb=shard[2], perm=shard[3],
                            num_tris=shard[3].shape[0])
        if streamed:
            res = intersect_packet_streamed(accel, o, d, t_max=t_max,
                                            any_hit=any_hit, t_init=t_run,
                                            interpret=interpret)
        else:
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
        if step + 1 < n:
            if any_hit:
                t_run = jnp.where(best.hit, 0.0,
                                  jnp.full_like(best.t, min(t_max, BIG)))
            else:
                t_run = jnp.minimum(best.t, min(t_max, BIG))
            shard = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, ring.axis, perm_pairs), shard)
    return best
