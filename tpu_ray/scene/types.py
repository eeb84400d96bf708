"""Scene containers: materials, lights, and the top-level Scene pytree.

The reference hard-codes scenes in C++ setup functions with compile-time
constants (SURVEY.md §2 #17, §5 config). Here a scene is a single pytree whose
float leaves are ALL differentiable parameters — SDF params, mesh vertices,
camera pose, materials, lights — which is what `fit()` optimizes
(BASELINE.json north_star: "gradients w.r.t. vertex positions, SDF parameters,
camera pose, and shading/material params").
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from tpu_ray.render.camera import Camera
from tpu_ray.scene.mesh import MeshScene
from tpu_ray.sdf.primitives import SdfScene


@struct.dataclass
class Materials:
    albedo: jnp.ndarray  # (K, 3) Lambertian albedo per material id

    @staticmethod
    def make(albedos, dtype=jnp.float32):
        return Materials(albedo=jnp.asarray(albedos, dtype))


@struct.dataclass
class Lights:
    """Directional and point lights plus a constant ambient term.

    `direction` points FROM the surface TOWARD the light (normalized at use).
    `position` lights illuminate with inverse-square falloff (`pos_color` is
    the radiance at unit distance) and cast shadows along per-ray directions
    clamped at the light distance; their positions are differentiable
    (inverse lighting, examples/inverse_lighting.py).
    """

    direction: jnp.ndarray  # (L, 3)
    color: jnp.ndarray  # (L, 3)
    ambient: jnp.ndarray  # (3,)
    position: jnp.ndarray  # (P, 3) point-light positions
    pos_color: jnp.ndarray  # (P, 3) point-light radiance at unit distance

    @staticmethod
    def make(directions, colors, ambient=(0.05, 0.05, 0.05), dtype=jnp.float32,
             positions=None, pos_colors=None):
        z3 = jnp.zeros((0, 3), dtype)
        return Lights(
            direction=jnp.asarray(directions, dtype).reshape(-1, 3),
            color=jnp.asarray(colors, dtype).reshape(-1, 3),
            ambient=jnp.asarray(ambient, dtype),
            position=(z3 if positions is None
                      else jnp.asarray(positions, dtype).reshape(-1, 3)),
            pos_color=(z3 if pos_colors is None
                       else jnp.asarray(pos_colors, dtype).reshape(-1, 3)),
        )

    @property
    def num_shadowed(self) -> int:
        """Total lights that cast shadow rays (directional + point)."""
        return self.direction.shape[0] + self.position.shape[0]


@struct.dataclass
class Scene:
    camera: Camera
    sdf: SdfScene
    mesh: MeshScene
    materials: Materials
    lights: Lights
    bg_top: jnp.ndarray  # (3,) sky gradient top color
    bg_bottom: jnp.ndarray  # (3,)
    # mesh acceleration structures (selection-only, not differentiable):
    # `grid`   — uniform grid + DDA (tpu_ray/accel/grid_build.py), the XLA path;
    # `packet` — Morton-chunked packet accel (tpu_ray/accel/packet.py), the
    #            Pallas TPU path. Both None until built.
    # `ring`   — per-device packet-accel shard for ring scene sharding
    #            (tpu_ray/dist/scene_shard.RingPacket); set only INSIDE a
    #            shard_map region by the sharded render/fit entry points.
    grid: Optional[object] = None
    packet: Optional[object] = None
    ring: Optional[object] = None
    # `poses`  — optional per-object differentiable TRS transforms
    #            (tpu_ray/scene/transform.MeshPoses), folded into world-space
    #            verts in-jit by transform.realize_scene at render entry
    poses: Optional[object] = None

    def with_grid(self, density: float = 5.0) -> "Scene":
        """Build the mesh acceleration structures (host-side)."""
        import numpy as np

        from tpu_ray.accel.grid_build import build_grid

        verts = np.asarray(self.mesh.verts)
        tris = np.asarray(self.mesh.tris)
        return self.with_packet().replace(
            grid=build_grid(verts, tris, density=density))

    def with_packet(self) -> "Scene":
        """Build only the packet accel (host-side) — the TPU hot path.

        For meshes too large for the uniform grid's CSR to be worth
        building (e.g. the 1M-tri streamed-kernel scenes), skip with_grid:
        the streamed packet kernel needs no grid and has no size cap."""
        import numpy as np

        from tpu_ray.accel.packet import build_packet_parts

        tris = np.asarray(self.mesh.tris)
        # one whole-mesh accel by default (HBM-streamed kernel; legacy
        # streamed=False builds split into VMEM-sized sequential parts)
        packet = (build_packet_parts(np.asarray(self.mesh.verts), tris)
                  if tris.shape[0] else None)
        return self.replace(packet=packet)

    @property
    def has_sdf(self) -> bool:
        return self.sdf.num_primitives > 0

    @property
    def has_mesh(self) -> bool:
        return self.mesh.num_tris > 0


def background_color(scene: Scene, d: jnp.ndarray) -> jnp.ndarray:
    """Vertical sky gradient by ray direction: (..., 3) -> (..., 3)."""
    s = 0.5 * (d[..., 1] + 1.0)
    return scene.bg_bottom + (scene.bg_top - scene.bg_bottom) * s[..., None]
