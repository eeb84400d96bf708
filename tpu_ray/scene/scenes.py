"""Scene registry mirroring the five BASELINE.json benchmark configs.

TPU-native equivalent of the reference's hard-coded scene setup functions
(SURVEY.md §2 #17). Every scene is deterministic (fixed numpy seed where
randomized), so renders are bit-identical across runs — one of the
determinism gates in SURVEY.md §4.5.

    sphere      — config 1: single-sphere SDF, 256², Lambertian (PR1 golden)
    triangles   — config 2: 10 triangles + ground plane, brute MT, 512², 1 spp
    bunny       — config 3: ~70k-tri mesh (bunny stand-in) in a uniform grid,
                  512² with shadows
    mandelbulb  — config 4: Mandelbulb DE, 1024², 4× supersampling, soft
                  shadows + AO
    mixed       — config 5: tri-mesh + SDF scene, 1080p, 16 spp AA (the
                  distributed headline scene)
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from tpu_ray.render.camera import Camera
from tpu_ray.scene.mesh import MeshScene, bunny_standin, concat_meshes, ground_plane_quad
from tpu_ray.scene.types import Lights, Materials, Scene
from tpu_ray.sdf.primitives import SdfScene
from tpu_ray.utils.config import RenderConfig

_REGISTRY: Dict[str, Callable[..., Tuple[Scene, RenderConfig]]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def scene_names():
    return sorted(_REGISTRY)


def build_scene(name: str, dtype=jnp.float32) -> Tuple[Scene, RenderConfig]:
    return _REGISTRY[name](dtype=dtype)


def _base(dtype, camera, sdf=None, mesh=None, albedos=None, light_dir=(0.6, 0.8, 0.3),
          light_color=(1.0, 1.0, 1.0), ambient=(0.08, 0.09, 0.11)):
    return Scene(
        camera=camera,
        sdf=sdf if sdf is not None else SdfScene.empty(dtype),
        mesh=mesh if mesh is not None else MeshScene.empty(dtype),
        materials=Materials.make(albedos if albedos is not None else [[0.8, 0.8, 0.8]], dtype),
        lights=Lights.make([light_dir], [light_color], ambient, dtype),
        bg_top=jnp.asarray([0.45, 0.65, 0.95], dtype),
        bg_bottom=jnp.asarray([0.9, 0.93, 1.0], dtype),
    )


def _f(a, dtype):
    return jnp.asarray(a, dtype)


def _i(a):
    return jnp.asarray(a, jnp.int32)


@register("sphere")
def sphere_scene(dtype=jnp.float32):
    """BASELINE config 1: single-sphere SDF, pinhole, Lambertian."""
    sdf = SdfScene.empty(dtype).replace(
        sph_center=_f([[0.0, 0.0, 0.0]], dtype),
        sph_radius=_f([1.0], dtype),
        sph_mat=_i([0]),
    )
    cam = Camera.make((0.0, 0.4, 3.5), (0.0, 0.0, 0.0), vfov_deg=45.0, dtype=dtype)
    scene = _base(dtype, cam, sdf=sdf, albedos=[[0.9, 0.35, 0.25]])
    cfg = RenderConfig(width=256, height=256, spp=1, method="sdf",
                       shadow="none", max_steps=96, eps=1e-3, t_far=20.0)
    return scene, cfg


@register("triangles")
def triangles_scene(dtype=jnp.float32):
    """BASELINE config 2: 10 triangles + ground plane, brute-force MT."""
    rng = np.random.default_rng(42)
    centers = rng.uniform([-1.6, 0.1, -1.6], [1.6, 1.6, 1.6], (10, 3))
    tris = []
    for c in centers:
        # a deterministic "random" triangle around each center
        e0 = rng.normal(size=3) * 0.45
        e1 = rng.normal(size=3) * 0.45
        tris.append([c - e0, c + e1, c + e0 - e1])
    verts = np.asarray(tris, np.float64).reshape(-1, 3)
    faces = np.arange(30, dtype=np.int32).reshape(10, 3)
    mesh = MeshScene.from_numpy(verts, faces, mat_id=np.arange(10, dtype=np.int32) % 3, dtype=dtype)
    gv, gf = ground_plane_quad(0.0, 8.0)
    ground = MeshScene.from_numpy(gv, gf, mat_id=3, dtype=dtype)
    mesh = concat_meshes(mesh, ground)
    cam = Camera.make((0.0, 1.6, 4.5), (0.0, 0.7, 0.0), vfov_deg=50.0, dtype=dtype)
    scene = _base(
        dtype, cam, mesh=mesh,
        albedos=[[0.9, 0.3, 0.25], [0.25, 0.8, 0.35], [0.3, 0.4, 0.9], [0.75, 0.72, 0.68]],
    )
    cfg = RenderConfig(width=512, height=512, spp=1, method="mesh_brute",
                       shadow="hard", t_far=40.0)
    return scene, cfg


@register("bunny")
def bunny_scene(dtype=jnp.float32):
    """BASELINE config 3: ~70k-tri mesh voxelized into a uniform grid, shadows."""
    bv, bf = bunny_standin()
    bv = bv + np.array([0.0, 1.02, 0.0])  # rest on the ground plane
    body = MeshScene.from_numpy(bv, bf, mat_id=0, dtype=dtype)
    gv, gf = ground_plane_quad(0.0, 8.0)
    ground = MeshScene.from_numpy(gv, gf, mat_id=1, dtype=dtype)
    mesh = concat_meshes(body, ground)
    cam = Camera.make((0.0, 1.7, 3.6), (0.0, 0.9, 0.0), vfov_deg=45.0, dtype=dtype)
    scene = _base(dtype, cam, mesh=mesh,
                  albedos=[[0.82, 0.71, 0.55], [0.7, 0.73, 0.72]]).with_grid()
    cfg = RenderConfig(width=512, height=512, spp=1, method="mesh_grid",
                       shadow="hard", t_far=40.0)
    return scene, cfg


@register("knot1m")
def knot1m_scene(dtype=jnp.float32):
    """Streamed-kernel showcase: a ~1.05M-triangle torus knot whose packet
    accel (72 MB) is 5.5x the VMEM budget — renderable ONLY because the
    HBM-streamed kernel (pallas_mt.intersect_packet_streamed) walks the
    whole mesh in one kernel. No uniform grid is built (with_packet): the
    mesh exceeds what the reference's grid+DDA design was sized for, which
    is the point of the scene.
    """
    from tpu_ray.scene.mesh import torus_knot

    kv, kf = torus_knot(2, 3, 724, 724)
    kv = kv + np.array([0.0, 1.12, 0.0])  # rest on the ground plane
    body = MeshScene.from_numpy(kv, kf, mat_id=0, dtype=dtype)
    gv, gf = ground_plane_quad(0.0, 8.0)
    ground = MeshScene.from_numpy(gv, gf, mat_id=1, dtype=dtype)
    mesh = concat_meshes(body, ground)
    cam = Camera.make((0.0, 1.9, 3.4), (0.0, 1.0, 0.0), vfov_deg=45.0, dtype=dtype)
    scene = _base(dtype, cam, mesh=mesh,
                  albedos=[[0.62, 0.7, 0.82], [0.7, 0.73, 0.72]]).with_packet()
    cfg = RenderConfig(width=1024, height=1024, spp=1, method="mesh_grid",
                       shadow="hard", t_far=40.0, block_size=1 << 16)
    return scene, cfg


@register("knot8m")
def knot8m_scene(dtype=jnp.float32):
    """Streamed-kernel scale demo (VERDICT r2 item 10): an ~8.39M-triangle
    torus knot — one order of magnitude past knot1m, ~45x the VMEM budget.
    Exercises every large-mesh guard at once: the candidate SMEM budget
    forces the ray-batch auto-split (pallas_mt.intersect_packet_streamed),
    the super count grows past 4k, and the accel stays under the f32
    tri-slot limit (2^24) asserted at build time. Host accel build is ~20 s
    and the one-time HBM upload is ~580 MB — use a persistent process
    (turntable / bench loops), not per-frame CLI invocations.
    """
    from tpu_ray.scene.mesh import torus_knot

    kv, kf = torus_knot(3, 5, 2048, 2048, radius=0.65, tube=0.16)
    kv = kv + np.array([0.0, 1.12, 0.0])  # rest on the ground plane
    body = MeshScene.from_numpy(kv, kf, mat_id=0, dtype=dtype)
    gv, gf = ground_plane_quad(0.0, 8.0)
    ground = MeshScene.from_numpy(gv, gf, mat_id=1, dtype=dtype)
    mesh = concat_meshes(body, ground)
    cam = Camera.make((0.0, 1.9, 3.4), (0.0, 1.0, 0.0), vfov_deg=45.0, dtype=dtype)
    scene = _base(dtype, cam, mesh=mesh,
                  albedos=[[0.82, 0.55, 0.38], [0.7, 0.73, 0.72]]).with_packet()
    cfg = RenderConfig(width=1024, height=1024, spp=1, method="mesh_grid",
                       shadow="hard", t_far=40.0, block_size=1 << 16)
    return scene, cfg


@register("mandelbulb")
def mandelbulb_scene(dtype=jnp.float32):
    """BASELINE config 4: Mandelbulb DE, 4× supersampling, soft shadows + AO."""
    sdf = SdfScene.empty(dtype).replace(
        mb_center=_f([[0.0, 1.1, 0.0]], dtype),
        mb_scale=_f([1.0], dtype),
        mb_power=_f([8.0], dtype),
        mb_mat=_i([0]),
        mb_pow8=True,  # power is exactly 8 -> trig-free DE fast path
        pln_normal=_f([[0.0, 1.0, 0.0]], dtype),
        pln_offset=_f([0.0], dtype),
        pln_mat=_i([1]),
    )
    cam = Camera.make((0.0, 1.9, 3.2), (0.0, 1.0, 0.0), vfov_deg=45.0, dtype=dtype)
    scene = _base(dtype, cam, sdf=sdf,
                  albedos=[[0.85, 0.5, 0.3], [0.6, 0.62, 0.65]],
                  light_dir=(0.5, 0.75, 0.45))
    # diff_vis=False: forward renders use the Pallas shadow/AO marches; flip
    # it on only when optimizing THROUGH soft-shadow/AO factors
    cfg = RenderConfig(width=1024, height=1024, spp=4, method="sdf",
                       shadow="soft", ao="sdf5", max_steps=128, eps=6e-4,
                       t_far=20.0, block_size=1 << 16, diff_vis=False)
    return scene, cfg


@register("pointlight")
def pointlight_scene(dtype=jnp.float32):
    """Point-light demo: sphere + rounded box on a plane lit by one point
    light with inverse-square falloff and soft shadows. Exercises per-ray
    shadow directions and distance-clamped shadow marches; the light position
    is differentiable (examples/inverse_lighting.py)."""
    sdf = SdfScene.empty(dtype).replace(
        sph_center=_f([[-0.7, 0.6, 0.0]], dtype),
        sph_radius=_f([0.6], dtype),
        sph_mat=_i([0]),
        box_center=_f([[0.9, 0.45, -0.2]], dtype),
        box_half=_f([[0.45, 0.45, 0.45]], dtype),
        box_round=_f([0.08], dtype),
        box_mat=_i([2]),
        pln_normal=_f([[0.0, 1.0, 0.0]], dtype),
        pln_offset=_f([0.0], dtype),
        pln_mat=_i([1]),
    )
    cam = Camera.make((0.0, 1.7, 4.2), (0.0, 0.6, 0.0), vfov_deg=45.0, dtype=dtype)
    scene = _base(dtype, cam, sdf=sdf,
                  albedos=[[0.85, 0.4, 0.3], [0.66, 0.68, 0.7], [0.3, 0.55, 0.85]])
    scene = scene.replace(lights=Lights.make(
        [[0.5, 0.8, 0.4]], [[0.25, 0.25, 0.25]], ambient=(0.06, 0.06, 0.07),
        dtype=dtype, positions=[[1.3, 2.6, 1.4]], pos_colors=[[6.0, 5.7, 5.2]]))
    cfg = RenderConfig(width=512, height=512, spp=1, method="sdf",
                       shadow="soft", t_far=30.0, diff_vis=False)
    return scene, cfg


@register("mixed")
def mixed_scene(dtype=jnp.float32):
    """BASELINE config 5: tri-mesh + SDF, 1080p, 16 spp — the headline scene."""
    bv, bf = bunny_standin()
    bv = 0.8 * bv + np.array([-1.3, 0.82, 0.0])
    body = MeshScene.from_numpy(bv, bf, mat_id=0, dtype=dtype)
    gv, gf = ground_plane_quad(0.0, 10.0)
    mesh = concat_meshes(body, MeshScene.from_numpy(gv, gf, mat_id=1, dtype=dtype))
    sdf = SdfScene.empty(dtype).replace(
        mb_center=_f([[1.4, 1.05, 0.0]], dtype),
        mb_scale=_f([0.9], dtype),
        mb_power=_f([8.0], dtype),
        mb_mat=_i([2]),
        mb_pow8=True,  # power is exactly 8 -> trig-free DE fast path
        sph_center=_f([[0.0, 0.55, -1.6]], dtype),
        sph_radius=_f([0.55], dtype),
        sph_mat=_i([3]),
    )
    cam = Camera.make((0.1, 1.9, 4.6), (0.0, 0.9, 0.0), vfov_deg=48.0, dtype=dtype)
    scene = _base(dtype, cam, sdf=sdf, mesh=mesh,
                  albedos=[[0.82, 0.71, 0.55], [0.68, 0.7, 0.7],
                           [0.85, 0.45, 0.3], [0.3, 0.5, 0.85]]).with_grid()
    # hard-shadow visibility is a 0/1 step with zero gradient, so
    # diff_vis=False costs nothing and keeps the Pallas shadow kernel active
    # 32k-ray blocks: re-measured on chip at the (16,128) ray tile — 32k
    # fwd 2.80 s / fwd+bwd 3.60 s vs 64k 2.91 / 3.66 (lax.map pipelining
    # overlaps the XLA candidate pre-pass with the packet kernel; smaller
    # blocks pipeline deeper now that each block holds half as many tiles)
    cfg = RenderConfig(width=1920, height=1080, spp=16, method="mixed",
                       shadow="hard", max_steps=96, eps=1e-3, t_far=40.0,
                       block_size=1 << 15, diff_vis=False)
    return scene, cfg
