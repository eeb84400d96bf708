"""Trig-free power-8 Mandelbulb DE (tpu_ray/sdf/mandelbulb.mandelbulb_de_pow8):
must agree with the generic spherical-coordinate formulation at power=8.0 in
values and gradients, through the march, and through the full render."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_ray.render.render import render_image
from tpu_ray.scene.scenes import build_scene
from tpu_ray.sdf.mandelbulb import mandelbulb_de, mandelbulb_de_pow8
from tpu_ray.sdf.primitives import sdf_distance


def _points(n=8192, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1.5, 1.5, (n, 3)), dtype)


def test_pow8_matches_generic_values_f64():
    p = _points()
    dg = np.asarray(mandelbulb_de(p, 8.0, iters=12))
    d8 = np.asarray(mandelbulb_de_pow8(p, iters=12))
    # double-angle identities vs atan2/sin/cos: pure rounding differences,
    # amplified only for points deep near the chaotic set boundary
    err = np.abs(dg - d8)
    assert np.quantile(err, 0.999) < 1e-12
    assert err.max() < 1e-9


def test_pow8_matches_generic_gradients_f64():
    p = _points(n=4096, seed=1)
    dg = np.asarray(mandelbulb_de(p, 8.0, iters=12))
    g_gen = np.asarray(jax.grad(lambda q: jnp.sum(mandelbulb_de(q, 8.0, 12)))(p))
    g_p8 = np.asarray(jax.grad(lambda q: jnp.sum(mandelbulb_de_pow8(q, 12)))(p))
    # compare away from the set boundary, where the field is smooth
    mask = np.abs(dg) > 0.05
    np.testing.assert_allclose(g_p8[mask], g_gen[mask], atol=1e-5)


@pytest.mark.slow  # ~34 s full-render f64 oracle; the fast DE-level value and
# gradient agreement tests above keep the pow8 path gated in the default run
def test_pow8_render_matches_generic_f64():
    scene, cfg = build_scene("mandelbulb", dtype=jnp.float64)
    assert scene.sdf.mb_pow8  # the registry enables the fast path
    cfg = cfg.replace(width=24, height=24, spp=1, block_size=0)
    img8 = np.asarray(render_image(scene, cfg))
    img_gen = np.asarray(render_image(
        scene.replace(sdf=scene.sdf.replace(mb_pow8=False)), cfg))
    # marches step through identical fields up to rounding; a few silhouette
    # pixels may flip hit/miss, so the gate is quantile-based like the golden
    err = np.abs(img8 - img_gen)
    assert np.quantile(err, 0.99) < 1e-6
    assert err.max() < 0.2


def test_pow8_scene_distance_dispatch():
    scene, _ = build_scene("mixed", dtype=jnp.float64)
    p = _points(n=512, seed=2) + jnp.asarray([1.4, 1.05, 0.0])
    d_fast = np.asarray(sdf_distance(scene.sdf, p))
    d_gen = np.asarray(sdf_distance(scene.sdf.replace(mb_pow8=False), p))
    err = np.abs(d_fast - d_gen)
    assert np.quantile(err, 0.99) < 1e-10
