"""Differentiable per-object rigid transforms (TRS) on mesh instances.

TPU-native equivalent of the reference's object/world transform stage
(SURVEY.md §2a #1 `Matrix44` / #16 "transform to world"; VERDICT r2 missing
#3): instead of a 4x4 matrix per object baked host-side, each mesh instance
carries a translate / axis-angle-rotate / scale leaf that is applied IN-JIT
before intersection — so object poses are first-class differentiable
parameters (fit "poses.translate", "poses.rotate", "poses.scale") and a
rigid pose can be recovered by inverse rendering.

Design notes (TPU-first):
  * axis-angle (Rodrigues) instead of matrices or quaternions: 3 parameters,
    no re-normalization constraint, smooth at the identity via the
    sinc-series guard below — the natural chart for gradient descent;
  * vertices map to instances by a static (V,) id array; applying a pose is
    one gather of per-instance params + fused element-wise math — XLA turns
    the whole thing into a few kernels regardless of instance count;
  * `realize_scene` folds poses into world-space vertices once per step and
    refits the packet accel (accel/packet.refit_packet_accel — pure jnp), so
    every downstream consumer (geometry pass, differentiable recompute,
    shadow queries) sees ordinary world-space geometry. Gradients flow
    verts -> poses through the fold automatically, including through the
    hand-written Pallas shade backward (its vertex cotangents chain into the
    pose pullback outside the kernel).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MeshPoses:
    """Per-instance TRS applied to `Scene.mesh.verts` in object space.

    translate: (K, 3); rotate: (K, 3) axis-angle (direction = axis, norm =
    angle in radians); scale: (K,) isotropic. vert_instance: (V,) int32
    instance id per vertex (-1 = static vertex, untouched)."""

    translate: jnp.ndarray
    rotate: jnp.ndarray
    scale: jnp.ndarray
    vert_instance: jnp.ndarray

    @staticmethod
    def identity(n_instances: int, vert_instance, dtype=jnp.float32
                 ) -> "MeshPoses":
        return MeshPoses(
            translate=jnp.zeros((n_instances, 3), dtype),
            rotate=jnp.zeros((n_instances, 3), dtype),
            scale=jnp.ones((n_instances,), dtype),
            vert_instance=jnp.asarray(np.asarray(vert_instance, np.int32)),
        )


def rodrigues_apply(rot: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by axis-angle rot (..., 3), smooth at 0.

    R v = v + sinc(θ)·(r × v) + ((1-cosθ)/θ²)·(r × (r × v)),  r = rot, θ=|r|.
    Both coefficient functions have removable singularities at θ=0; a Taylor
    switch keeps the VJP finite and exact through the identity pose (the
    starting point of every pose fit)."""
    th2 = jnp.sum(rot * rot, axis=-1, keepdims=True)
    small = th2 < 1e-8
    # sin(θ)/θ and (1-cos θ)/θ² with 2-term Taylor guards. The untaken
    # branch of a `where` is still differentiated, so the exact branch must
    # see a safe θ² (the classic where-NaN-grad trap) — at θ=0 the Taylor
    # branch supplies both the value and the (exact) gradient.
    th2_safe = jnp.where(small, 1.0, th2)
    th = jnp.sqrt(th2_safe)
    sinc = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    cosc = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2_safe)
    rxv = jnp.cross(rot, v)
    rxrxv = jnp.cross(rot, rxv)
    return v + sinc * rxv + cosc * rxrxv


def apply_poses(poses: MeshPoses, verts: jnp.ndarray) -> jnp.ndarray:
    """Object -> world: v' = R(rotate) · (scale · v) + translate, per vertex
    by its instance id; id -1 leaves the vertex untouched (static geometry)."""
    idx = jnp.clip(poses.vert_instance, 0, poses.translate.shape[0] - 1)
    moved = poses.vert_instance >= 0
    s = poses.scale[idx][..., None]
    r = poses.rotate[idx]
    t = poses.translate[idx]
    world = rodrigues_apply(r, verts * s) + t
    return jnp.where(moved[..., None], world, verts)


def realize_scene(scene):
    """Fold scene.poses into world-space mesh vertices (pure jnp, in-jit).

    Returns a scene with posed verts, poses=None (idempotent), and — when a
    packet accel is present — the accel refit to the posed vertices, so the
    selection pass stays exact while objects move. The uniform grid cannot be
    refit in-jit (its CSR topology is host-built); it is dropped and callers
    fall back to packet/brute, mirroring fit()'s vertex-optimization policy."""
    if getattr(scene, "poses", None) is None:
        return scene
    verts = apply_poses(scene.poses, scene.mesh.verts)
    scene = scene.replace(mesh=scene.mesh.replace(verts=verts), poses=None)
    if scene.packet is not None:
        from tpu_ray.accel.packet import refit_packet_accel

        scene = scene.replace(
            packet=[refit_packet_accel(a, verts, scene.mesh.tris)
                    for a in scene.packet],
            grid=None)
    elif scene.grid is not None:
        scene = scene.replace(grid=None)
    return scene
