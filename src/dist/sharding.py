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

from src.render.camera import generate_rays
from src.render.render import pixel_sample_coords, render_rays, resolve_method
from src.scene.types import Scene
from src.utils.config import RenderConfig

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


def render_image_sharded(scene: Scene, cfg: RenderConfig, mesh: Mesh,
                         gather: bool = True) -> jnp.ndarray:
    """Full frame with rays sharded over the mesh -> (H, W, 3).

    Scene is replicated; each shard generates and renders its own rays (so
    camera gradients flow inside the shard). With gather=False the result
    stays sharded over rows of the flat sample axis (multi-host: each host
    keeps only its shard; see image_io for per-host writes).
    """
    dtype = scene.camera.origin.dtype
    method = resolve_method(scene, cfg)
    n_dev = mesh.devices.size

    sx, sy = pixel_sample_coords(cfg, dtype)
    flat_x, _ = _pad_to(sx.ravel(), n_dev)
    flat_y, _ = _pad_to(sy.ravel(), n_dev)
    R = sx.size

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )
    def shard_render(scene_rep, xs, ys):
        o, d = generate_rays(scene_rep.camera, xs, ys, cfg.width, cfg.height)
        return render_rays(scene_rep, cfg, o, d, method)

    colors = shard_render(scene, flat_x, flat_y)[:R]
    img = jnp.mean(colors.reshape(cfg.height, cfg.width, cfg.spp, 3), axis=2)
    if gather:
        img = jax.lax.with_sharding_constraint(
            img, NamedSharding(mesh, P()))
    return img


def render_image_sharded_jit(scene: Scene, cfg: RenderConfig, mesh: Mesh):
    fn = jax.jit(
        functools.partial(render_image_sharded, cfg=cfg, mesh=mesh),
    )
    return fn(scene)
