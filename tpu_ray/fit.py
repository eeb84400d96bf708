"""The differentiable fit loop: optimize scene parameters against a target
image (inverse rendering).

New component with no reference counterpart (SURVEY.md §2c, §3.5): the whole
point of making the renderer differentiable. Any float leaf of the Scene
pytree can be optimized, addressed by dotted path ("sdf.sph_radius",
"camera.origin", "mesh.verts", "materials.albedo", ...).

Two training-step flavors:
  * `make_fit_step`        — single-device (or auto-sharded jit);
  * `make_sharded_fit_step`— explicit shard_map data-parallel step: each chip
    renders + differentiates its pixel shard, parameter grads all-reduce via
    bucketed psums inside the backward region so XLA overlaps them with the
    remaining backward sweep (SURVEY.md §2b P6).

Checkpoint/resume via orbax lives in utils/checkpoint.py (SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpu_ray.dist.grad_allreduce import psum_buckets
from tpu_ray.dist.sharding import RAY_AXIS, _pad_to
from tpu_ray.render.camera import generate_rays
from tpu_ray.render.render import pixel_sample_coords, render_image, render_rays, resolve_method
from tpu_ray.scene.types import Scene
from tpu_ray.utils.config import FitConfig, RenderConfig

ParamDict = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Dotted-path parameter access on the Scene pytree
# ---------------------------------------------------------------------------

def get_param(scene, path: str):
    obj = scene
    for part in path.split("."):
        obj = getattr(obj, part)
    return obj


def _set(obj, parts, value):
    if len(parts) == 1:
        return obj.replace(**{parts[0]: value})
    return obj.replace(**{parts[0]: _set(getattr(obj, parts[0]), parts[1:], value)})


def set_param(scene, path: str, value):
    return _set(scene, path.split("."), value)


def extract_params(scene, paths: Sequence[str]) -> ParamDict:
    return {p: get_param(scene, p) for p in paths}


def apply_params(scene, params: ParamDict):
    for p, v in params.items():
        scene = set_param(scene, p, v)
    return scene


# ---------------------------------------------------------------------------
# Training steps
# ---------------------------------------------------------------------------

def _maybe_refit(scene: Scene, refit_accel: bool) -> Scene:
    """Refit the packet accel to the CURRENT vertex positions (pure jnp, runs
    inside the jitted step) — keeps the accel valid while mesh.verts move."""
    if not refit_accel or scene.packet is None:
        return scene
    from tpu_ray.accel.packet import refit_packet_accel

    parts = [refit_packet_accel(a, scene.mesh.verts, scene.mesh.tris)
             for a in scene.packet]
    return scene.replace(packet=parts)


def make_fit_step(scene: Scene, cfg: RenderConfig, target: jnp.ndarray,
                  optimizer: optax.GradientTransformation,
                  refit_accel: bool = False):
    """jit'd (params, opt_state) -> (params, opt_state, loss). Single device."""

    def loss_fn(params: ParamDict):
        img = render_image(_maybe_refit(apply_params(scene, params),
                                        refit_accel), cfg)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(params: ParamDict, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_fit_step(scene: Scene, cfg: RenderConfig, target: jnp.ndarray,
                          optimizer: optax.GradientTransformation, mesh,
                          grad_buckets: int = 4, scene_shards: bool = False,
                          refit_accel: bool = False):
    """Data-parallel fit step over a device mesh (pixel-shard DP).

    target: (H, W, 3) full target image (replicated in; sharded internally).
    Loss/grads are exact global quantities (bucketed psum inside shard_map).

    scene_shards=True partitions the mesh packet accel around the device ring
    (see sharding.render_image_sharded): the geometry pass intersects via
    ppermute-rotated accel shards, while the differentiable recompute still
    reads the (replicated) raw mesh — so vertex gradients are exact and the
    dominant accel memory is sharded N x.
    """
    from tpu_ray.dist.sharding import shard_sample_coords
    from tpu_ray.render.render import render_pixels_flat

    dtype = scene.camera.origin.dtype
    method = resolve_method(scene, cfg)
    n_dev = mesh.devices.size
    ring = None
    if scene_shards and scene.has_mesh:
        import numpy as np

        from tpu_ray.dist.scene_shard import build_ring_packet

        build_scene_ = scene
        if scene.poses is not None:
            # build the ring from POSED world verts so the Morton chunk
            # order matches the geometry the fit starts from (the per-step
            # refit above keeps it exact as poses move)
            from tpu_ray.scene.transform import realize_scene

            build_scene_ = realize_scene(scene)
        ring = build_ring_packet(np.asarray(build_scene_.mesh.verts),
                                 np.asarray(build_scene_.mesh.tris), n_dev)
        scene = scene.replace(grid=None, packet=None)
    # whole pixels per shard, so the loss is the MSE of the spp-AVERAGED
    # image — identical objective to make_fit_step (per-sample MSE would add
    # a parameter-dependent intra-pixel variance term)
    flat_x, flat_y, n_px, perm = shard_sample_coords(cfg, dtype, n_dev)
    n_px_pad = flat_x.shape[0] // cfg.spp
    tgt = target.reshape(-1, 3).T  # (3, n_px) channel-major
    tgt = tgt[:, jnp.asarray(perm)]  # align with the balanced pixel order
    tgt = jnp.concatenate(
        [tgt, jnp.zeros((3, n_px_pad - n_px), dtype)], axis=1)
    w = jnp.concatenate([jnp.ones((n_px,), dtype),
                         jnp.zeros((n_px_pad - n_px,), dtype)])
    denom = jnp.asarray(n_px * 3, dtype)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS),
                  P(None, RAY_AXIS), P(RAY_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def loss_and_grad(params, ring_blk, xs, ys, t, wt):
        def local_loss(params_):
            s = apply_params(scene, params_)
            if s.poses is not None:
                # fold object poses into world verts BEFORE the ring refit so
                # the accel shards track the posed geometry
                from tpu_ray.scene.transform import realize_scene

                s = realize_scene(s)
            s = _maybe_refit(s, refit_accel)
            if ring_blk is not None:
                from tpu_ray.dist.scene_shard import ring_local, refit_ring_packet

                r = ring_local(ring_blk)
                # poses.* params move geometry too (realize_scene above has
                # already folded them into s.mesh.verts by this point)
                moving_mesh = refit_accel or any(
                    k.split(".")[0] in ("mesh", "poses") for k in params_)
                if moving_mesh:
                    # vertex fits: refit this device's accel shard to the
                    # CURRENT verts before the ring rotation starts (ADVICE
                    # r2 — otherwise the geometry pass intersects frozen
                    # build-time geometry while verts move)
                    r = refit_ring_packet(r, s.mesh.verts, s.mesh.tris)
                s = s.replace(ring=r)
            px = render_pixels_flat(s, cfg, xs, ys, method)  # (3, px_shard)
            return jnp.sum(wt[None, :] * (px - t) ** 2) / denom

        loss, grads = jax.value_and_grad(local_loss)(params)
        grads = psum_buckets(grads, RAY_AXIS, grad_buckets)
        loss = jax.lax.psum(loss, RAY_AXIS)
        return loss, grads

    @jax.jit
    def step(params: ParamDict, opt_state):
        loss, grads = loss_and_grad(params, ring, flat_x, flat_y, tgt, w)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# The loop
# ---------------------------------------------------------------------------

def fit(scene: Scene, cfg: RenderConfig, target: jnp.ndarray,
        trainable: Sequence[str], fit_cfg: FitConfig = FitConfig(),
        mesh=None, verbose: bool = True) -> Tuple[Scene, list]:
    """Optimize `trainable` scene leaves to match `target`. Returns
    (fitted_scene, loss_history). Checkpoints + resume if checkpoint_dir set."""
    from tpu_ray.utils import checkpoint as ckpt_lib

    if "sdf.mb_power" in trainable and scene.sdf.mb_pow8:
        # the trig-free power-8 fast path hard-codes power=8 and ignores the
        # mb_power array — switch back to the generic DE so power gradients
        # exist (tpu_ray/sdf/primitives.py SdfScene.mb_pow8)
        scene = scene.replace(sdf=scene.sdf.replace(mb_pow8=False))

    refit_accel = False
    if any(p.split(".")[0] == "poses" for p in trainable):
        # object-pose fits: transform.realize_scene (called at render entry)
        # folds poses into world verts and refits the packet accel in-jit
        # every step; the host-built grid cannot follow and is dropped
        from tpu_ray.render.render import use_pallas

        scene = scene.replace(grid=None)
        if not (scene.packet is not None
                and use_pallas(cfg, scene.mesh.verts.dtype)):
            # packet path unusable (absent, or pallas off / f64): drop it and
            # fall back to brute MT so the render stays correct, mirroring
            # the mesh.* branch below
            scene = scene.replace(packet=None)
            if cfg.method == "mesh_grid":
                cfg = cfg.replace(method="mesh_brute")
    if any(p.split(".")[0] == "mesh" for p in trainable):
        # vertex positions are being optimized: the grid was voxelized from
        # the INITIAL vertices and would go stale as vertices move. The
        # packet accel, however, can be REFIT to the current verts inside
        # every jitted step (accel/packet.refit_packet_accel — pure jnp,
        # exact AABBs, Morton order kept), so the Pallas path keeps its
        # acceleration during vertex fits; only the grid/brute fallback
        # remains for non-Pallas backends.
        from tpu_ray.render.render import use_pallas

        scene = scene.replace(grid=None)
        if scene.packet is not None and use_pallas(cfg, scene.mesh.verts.dtype):
            refit_accel = True
        else:
            scene = scene.replace(packet=None)
            if cfg.method == "mesh_grid":
                cfg = cfg.replace(method="mesh_brute")

    params = extract_params(scene, trainable)
    optimizer = optax.adam(fit_cfg.learning_rate)
    opt_state = optimizer.init(params)
    start_step = 0

    mngr = None
    if fit_cfg.checkpoint_dir:
        mngr = ckpt_lib.make_manager(fit_cfg.checkpoint_dir)
        restored = ckpt_lib.restore_latest(mngr, params, opt_state)
        if restored is not None:
            params, opt_state, start_step = restored
            if verbose:
                print(f"[fit] resumed from step {start_step}")

    if mesh is not None:
        step_fn = make_sharded_fit_step(scene, cfg, target, optimizer, mesh,
                                        refit_accel=refit_accel)
    else:
        step_fn = make_fit_step(scene, cfg, target, optimizer,
                                refit_accel=refit_accel)

    history = []
    for i in range(start_step, fit_cfg.steps):
        params, opt_state, loss = step_fn(params, opt_state)
        history.append(float(loss))
        if verbose and (i % fit_cfg.log_every == 0 or i == fit_cfg.steps - 1):
            print(f"[fit] step {i} loss {float(loss):.3e}")
        if mngr is not None and (i + 1) % fit_cfg.checkpoint_every == 0:
            ckpt_lib.save(mngr, i + 1, params, opt_state)
    if mngr is not None:
        ckpt_lib.save(mngr, fit_cfg.steps, params, opt_state)
        mngr.wait_until_finished()
    return apply_params(scene, params), history
