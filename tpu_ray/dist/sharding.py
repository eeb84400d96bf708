"""Pixel-block data parallelism over a device mesh.

TPU-native equivalent of the reference's tile scheduler (SURVEY.md §2 #14,
§2b P1): where the C++ splits the framebuffer into tiles pulled by worker
threads from an atomic queue, here the flattened sample grid is sharded
across a `jax.sharding.Mesh` by `shard_map` — each chip renders its
contiguous block of rays with the scene replicated, so the forward pass has
ZERO cross-device communication; the only collectives are the final image
gather (if requested) and the gradient psum in fit (grad_allreduce.py).

The "sequence parallelism" analog (SURVEY.md §5): the pixel grid is the
sequence, and this module shards it.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpu_ray.render.camera import generate_rays
from tpu_ray.render.render import pixel_sample_coords, render_rays, resolve_method
from tpu_ray.scene.types import Scene
from tpu_ray.utils.config import RenderConfig

RAY_AXIS = "rays"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name "rays".

    On a multi-host slice the same flat axis spans hosts × chips; rays ride
    ICI/DCN-free in forward, so topology order does not matter.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (RAY_AXIS,))


def _pad_to(x: jnp.ndarray, multiple: int):
    r = x.shape[0]
    pad = (-r) % multiple
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])])
    return x, pad


def balanced_pixel_perm(cfg: RenderConfig, n_dev: int):
    """Pixel permutation that (a) round-robins 8x8 pixel blocks across the
    shards and (b) keeps each 64-pixel block contiguous.

    (a) is load balance: contiguous raster strips give the shard holding the
    object rows up to ~2x the march/intersect work of the shard holding sky
    rows (measured in MULTIHOST_EVIDENCE.md); dealing blocks round-robin
    means every shard samples the whole frame.  (b) is tile coherence: a
    (8,128)-sample kernel tile covers a compact 8x8-pixel footprint whose
    tight frustum culls packet chunks — reusing the single-device blocking
    (render._block_order_perm).  Always returns an (n_px,) numpy int32
    permutation (identity-ordered strips when the frame has no 8x8 tiling).
    """
    n_px = cfg.height * cfg.width
    if cfg.height % 8 == 0 and cfg.width % 8 == 0:
        # same 8x8 blocking as render._block_order_perm, but in numpy: this
        # runs inside jitted callers where that function's jnp result would
        # be a tracer (host-side permutation construction must stay concrete)
        idx = np.arange(n_px, dtype=np.int32).reshape(
            cfg.height // 8, 8, cfg.width // 8, 8)
        units = idx.transpose(0, 2, 1, 3).reshape(-1, 64)  # block order
    else:
        units = np.arange(n_px, dtype=np.int32).reshape(-1, 1)
    order = np.concatenate(
        [np.arange(units.shape[0])[s::n_dev] for s in range(n_dev)])
    return units[order].reshape(-1)


def shard_sample_coords(cfg: RenderConfig, dtype, n_dev: int):
    """Flat sample coords padded so every shard holds WHOLE pixels.

    Returns (flat_x, flat_y, n_px, perm): length is a multiple of
    n_dev * cfg.spp, so per-shard spp reduction is exact and per-pixel losses
    shard cleanly.  Pixels are reordered by `perm` (balanced_pixel_perm) so
    shards are load-balanced; callers must align per-pixel data (targets,
    output frames) with the same permutation.
    """
    from tpu_ray.render.render import pixel_sample_coords

    sx, sy = pixel_sample_coords(cfg, dtype)
    perm = balanced_pixel_perm(cfg, n_dev)
    fx = sx.ravel().reshape(-1, cfg.spp)[perm].ravel()
    fy = sy.ravel().reshape(-1, cfg.spp)[perm].ravel()
    flat_x, _ = _pad_to(fx, n_dev * cfg.spp)
    flat_y, _ = _pad_to(fy, n_dev * cfg.spp)
    return flat_x, flat_y, sx.size // cfg.spp, perm


def render_image_sharded(scene: Scene, cfg: RenderConfig, mesh: Mesh,
                         gather: bool = True,
                         scene_shards: bool = False) -> jnp.ndarray:
    """Full frame with rays sharded over the mesh -> (H, W, 3).

    Scene is replicated; each shard generates and renders its own whole-pixel
    slice via the blocked channel-major path (memory-safe at any frame size,
    see render.render_pixels_flat). With gather=False the result stays
    sharded (multi-host: each host keeps only its shard; see
    dist.multihost.write_image_per_host).

    scene_shards=True additionally PARTITIONS the mesh's packet accel across
    the device ring (SURVEY.md §2b P3): each chip holds 1/N of the triangle
    chunks and accel shards rotate past the resident rays via ppermute
    (dist.scene_shard.intersect_ring_packet) — per-chip accel memory drops
    N x, which is what lets meshes beyond one chip's budget render.
    """
    from tpu_ray.render.render import render_pixels_flat

    dtype = scene.camera.origin.dtype
    method = resolve_method(scene, cfg)
    n_dev = mesh.devices.size
    flat_x, flat_y, n_px, perm = shard_sample_coords(cfg, dtype, n_dev)

    ring = None
    if scene_shards and scene.has_mesh:
        from tpu_ray.dist.scene_shard import build_ring_packet

        if scene.poses is not None:
            # the ring's corners/AABBs are geometry, not topology: fold poses
            # into world verts BEFORE the build, or the geometry pass would
            # intersect unposed triangles (render_rays' in-jit realize only
            # rewrites mesh.verts — ring shards are closed over, not refit)
            from tpu_ray.scene.transform import realize_scene

            scene = realize_scene(scene)
        ring = build_ring_packet(np.asarray(scene.mesh.verts),
                                 np.asarray(scene.mesh.tris), n_dev)
        scene = scene.replace(grid=None, packet=None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(None, RAY_AXIS),
        check_vma=False,
    )
    def shard_render(scene_rep, ring_blk, xs, ys):
        if ring_blk is not None:
            from tpu_ray.dist.scene_shard import ring_local

            scene_rep = scene_rep.replace(ring=ring_local(ring_blk))
        return render_pixels_flat(scene_rep, cfg, xs, ys, method)  # (3, px)

    flat = shard_render(scene, ring, flat_x, flat_y)[:, :n_px]
    inv = np.zeros_like(perm)
    inv[perm] = np.arange(n_px, dtype=perm.dtype)
    flat = flat[:, jnp.asarray(inv)]
    img = jnp.moveaxis(flat.reshape(3, cfg.height, cfg.width), 0, -1)
    if gather:
        img = jax.lax.with_sharding_constraint(
            img, NamedSharding(mesh, P()))
    return img


def render_image_sharded_jit(scene: Scene, cfg: RenderConfig, mesh: Mesh):
    fn = jax.jit(
        functools.partial(render_image_sharded, cfg=cfg, mesh=mesh),
    )
    return fn(scene)
