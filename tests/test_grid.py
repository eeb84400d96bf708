"""Uniform-grid + DDA tests: build invariants and the classic accelerator
correctness oracle (grid hit == brute-force hit; SURVEY.md §4.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_ray.accel.grid_build import build_grid, grid_stats
from tpu_ray.kernels import moller_trumbore as mt
from tpu_ray.kernels.dda import any_hit_grid, intersect_grid
from tpu_ray.scene.mesh import MeshScene, torus_knot
from tpu_ray.scene.scenes import build_scene


def _soup(n_tris=200, seed=7, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-2, 2, (n_tris, 3))
    e0 = rng.normal(size=(n_tris, 3)) * 0.35
    e1 = rng.normal(size=(n_tris, 3)) * 0.35
    verts = np.stack([c - e0, c + e1, c + e0 - e1], axis=1).reshape(-1, 3)
    faces = np.arange(3 * n_tris, dtype=np.int32).reshape(-1, 3)
    return MeshScene.from_numpy(verts, faces, dtype=dtype)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_build_covers_all_triangles():
    mesh = _soup(100)
    grid = build_grid(np.asarray(mesh.verts), np.asarray(mesh.tris))
    present = np.unique(np.asarray(grid.tri_idx))
    assert present.size == 100 and present.min() == 0 and present.max() == 99
    st = grid_stats(grid)
    assert st["pairs"] >= 100 and st["max_per_cell"] >= 1


def test_grid_oracle_matches_brute_random_soup():
    mesh = _soup(200)
    grid = build_grid(np.asarray(mesh.verts), np.asarray(mesh.tris))
    o, d = _rays(512, 1)
    g = intersect_grid(mesh, grid, o, d)
    b = mt.intersect_brute(mesh, o, d)
    np.testing.assert_array_equal(np.asarray(g.hit), np.asarray(b.hit))
    hits = np.asarray(g.hit)
    np.testing.assert_allclose(np.asarray(g.t)[hits], np.asarray(b.t)[hits], rtol=1e-10)
    np.testing.assert_array_equal(np.asarray(g.tri)[hits], np.asarray(b.tri)[hits])


def test_grid_oracle_knot_mesh():
    # a structured closed surface (the bunny stand-in family) + rays from outside
    v, f = torus_knot(2, 3, 48, 48)
    mesh = MeshScene.from_numpy(v, f, dtype=jnp.float64)
    grid = build_grid(np.asarray(mesh.verts), np.asarray(mesh.tris))
    o, d = _rays(512, 5)
    g = intersect_grid(mesh, grid, o, d)
    b = mt.intersect_brute(mesh, o, d)
    np.testing.assert_array_equal(np.asarray(g.hit), np.asarray(b.hit))
    hits = np.asarray(g.hit)
    np.testing.assert_allclose(np.asarray(g.t)[hits], np.asarray(b.t)[hits], rtol=1e-10)


def test_any_hit_grid_matches_brute():
    mesh = _soup(150, seed=9)
    grid = build_grid(np.asarray(mesh.verts), np.asarray(mesh.tris))
    o, d = _rays(512, 2)
    a = np.asarray(any_hit_grid(mesh, grid, o, d, t_max=5.0))
    b = np.asarray(mt.any_hit_brute(mesh, o, d, t_max=5.0))
    np.testing.assert_array_equal(a, b)


def test_rays_inside_grid_and_axis_parallel():
    mesh = _soup(50, seed=11)
    grid = build_grid(np.asarray(mesh.verts), np.asarray(mesh.tris))
    # origins inside the grid bbox; axis-parallel directions (d has zeros)
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform(-1.5, 1.5, (96, 3)))
    dirs = np.zeros((96, 3))
    dirs[np.arange(96), rng.integers(0, 3, 96)] = rng.choice([-1.0, 1.0], 96)
    d = jnp.asarray(dirs)
    g = intersect_grid(mesh, grid, o, d)
    b = mt.intersect_brute(mesh, o, d)
    np.testing.assert_array_equal(np.asarray(g.hit), np.asarray(b.hit))
    hits = np.asarray(g.hit)
    np.testing.assert_allclose(np.asarray(g.t)[hits], np.asarray(b.t)[hits], rtol=1e-10)


def test_soup_render_grid_matches_brute_render():
    """Cheap DEFAULT-gate end-to-end render oracle (ADVICE r3): the full
    pipeline (raygen -> accel intersect -> shadows -> shade) on a small soup
    scene, grid vs brute, f64. Keeps a full-pipeline regression gate in the
    default run while the 70k-tri bunny variant stays in --runslow."""
    from tpu_ray.render.render import render_image
    from tpu_ray.scene.scenes import _base
    from tpu_ray.render.camera import Camera
    from tpu_ray.utils.config import RenderConfig

    mesh = _soup(120, seed=21)
    cam = Camera.make((0.0, 1.0, 5.5), (0.0, 0.0, 0.0), vfov_deg=50.0,
                      dtype=jnp.float64)
    scene = _base(jnp.float64, cam, mesh=mesh).with_grid()
    cfg = RenderConfig(width=24, height=24, spp=1, shadow="hard",
                       t_far=40.0, block_size=0)
    img_grid = np.asarray(render_image(scene, cfg.replace(method="mesh_grid")))
    img_brute = np.asarray(render_image(scene, cfg.replace(method="mesh_brute")))
    np.testing.assert_allclose(img_grid, img_brute, atol=1e-10)


@pytest.mark.slow  # ~75 s: the 70k-tri full-render oracle; the cheap default
# variant above covers the same pipeline; runs in the --runslow gate
def test_bunny_render_grid_matches_brute_render():
    # full-pipeline oracle at render level (BASELINE config 3, small frame)
    from tpu_ray.render.render import render_image

    scene, cfg = build_scene("bunny", dtype=jnp.float64)
    cfg = cfg.replace(width=28, height=28, block_size=0)
    img_grid = np.asarray(render_image(scene, cfg.replace(method="mesh_grid")))
    img_brute = np.asarray(render_image(scene, cfg.replace(method="mesh_brute")))
    np.testing.assert_allclose(img_grid, img_brute, atol=1e-10)


def test_determinism_same_render_twice():
    from tpu_ray.render.render import render_image

    scene, cfg = build_scene("bunny", dtype=jnp.float32)
    cfg = cfg.replace(width=24, height=24, block_size=0)
    a = np.asarray(render_image(scene, cfg))
    b = np.asarray(render_image(scene, cfg))
    np.testing.assert_array_equal(a, b)


def test_vertex_gradients_grid_equals_brute():
    """Gradients flow through the same differentiable hit recompute for both
    paths, so d(loss)/d(verts) must agree between mesh_grid and mesh_brute."""
    import jax
    from tpu_ray.render.render import render_image

    scene, cfg = build_scene("bunny", dtype=jnp.float64)
    cfg = cfg.replace(width=16, height=16, shadow="none", block_size=0)

    def loss(verts, method):
        s = scene.replace(mesh=scene.mesh.replace(verts=verts))
        return jnp.mean(render_image(s, cfg.replace(method=method)) ** 2)

    g_grid = jax.grad(lambda v: loss(v, "mesh_grid"))(scene.mesh.verts)
    g_brute = jax.grad(lambda v: loss(v, "mesh_brute"))(scene.mesh.verts)
    ga, gb = np.asarray(g_grid), np.asarray(g_brute)
    assert np.isfinite(ga).all()
    np.testing.assert_allclose(ga, gb, atol=1e-12)
    assert np.abs(ga).max() > 0.0  # gradients actually flow
