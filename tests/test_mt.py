"""Möller–Trumbore kernel tests vs the scalar CPU reference (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from ref import cpu_renderer
from tpu_ray.kernels import moller_trumbore as mt
from tpu_ray.render.render import render_image
from tpu_ray.scene.scenes import build_scene


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_brute_matches_cpu_reference():
    scene, _ = build_scene("triangles", dtype=jnp.float64)
    scene_np = cpu_renderer.to_numpy_scene(scene)
    o, d = _random_rays(256, 1)
    res = mt.intersect_brute(scene.mesh, jnp.asarray(o), jnp.asarray(d))
    for i in range(o.shape[0]):
        t_ref, tri_ref, hit_ref = cpu_renderer.intersect_mesh(scene_np.mesh, o[i], d[i])
        assert bool(res.hit[i]) == hit_ref
        if hit_ref:
            assert int(res.tri[i]) == tri_ref
            np.testing.assert_allclose(float(res.t[i]), t_ref, rtol=1e-10)


def test_chunked_matches_unchunked():
    scene, _ = build_scene("triangles", dtype=jnp.float64)
    o, d = _random_rays(128, 2)
    a = mt.intersect_brute(scene.mesh, jnp.asarray(o), jnp.asarray(d))
    b = mt.intersect_brute(scene.mesh, jnp.asarray(o), jnp.asarray(d), chunk=5)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))


def test_recompute_hit_consistent():
    scene, _ = build_scene("triangles", dtype=jnp.float64)
    o, d = _random_rays(128, 3)
    res = mt.intersect_brute(scene.mesh, jnp.asarray(o), jnp.asarray(d))
    t, u, v, n = mt.recompute_hit(scene.mesh, jnp.asarray(o), jnp.asarray(d), res.tri)
    hits = np.asarray(res.hit)
    np.testing.assert_allclose(np.asarray(t)[hits], np.asarray(res.t)[hits], rtol=1e-12)
    uu, vv = np.asarray(u)[hits], np.asarray(v)[hits]
    assert (uu >= -1e-12).all() and (vv >= -1e-12).all() and (uu + vv <= 1 + 1e-12).all()
    nn = np.asarray(n)[hits]
    np.testing.assert_allclose(np.linalg.norm(nn, axis=-1), 1.0, rtol=1e-9)


def test_triangles_scene_golden():
    scene, cfg = build_scene("triangles", dtype=jnp.float64)
    cfg = cfg.replace(width=24, height=24, block_size=0)
    img = np.asarray(render_image(scene, cfg))
    ref_img = cpu_renderer.render_image(scene, cfg)
    np.testing.assert_allclose(img, ref_img, atol=5e-6)


def test_edge_margin_corners_analytic():
    """edge_margin_corners (the mesh soft-silhouette margin) must equal the
    true in-plane distance to the nearest edge: for the centroid of an
    equilateral triangle of side s that is s*sqrt(3)/6, and a point at
    barycentric (1/2, 1/2, 0) lies ON an edge (margin 0)."""
    s = 2.0
    v0 = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float64)
    v1 = jnp.asarray([[s, 0.0, 0.0]], jnp.float64)
    v2 = jnp.asarray([[s / 2, s * np.sqrt(3) / 2, 0.0]], jnp.float64)
    # centroid: u = v = 1/3
    third = jnp.asarray([1.0 / 3.0], jnp.float64)
    m = mt.edge_margin_corners(v0, v1, v2, third, third)
    np.testing.assert_allclose(np.asarray(m), s * np.sqrt(3) / 6, rtol=1e-12)
    # edge point between v1 and v2: b0 = 0 -> margin 0
    half = jnp.asarray([0.5], jnp.float64)
    m0 = mt.edge_margin_corners(v0, v1, v2, half, half)
    np.testing.assert_allclose(np.asarray(m0), 0.0, atol=1e-12)
    # translation/rotation invariance: rigidly move the triangle
    off = jnp.asarray([[1.0, -2.0, 3.0]], jnp.float64)
    m2 = mt.edge_margin_corners(v0 + off, v1 + off, v2 + off, third, third)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), rtol=1e-12)
