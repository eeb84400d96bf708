import numpy as np
import jax
import jax.numpy as jnp

from tpu_ray.kernels.sphere_trace import make_sphere_tracer, march, surface_normal
from tpu_ray.scene.scenes import build_scene
from tpu_ray.sdf.primitives import sdf_distance


def _rays(n=64, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    o = np.tile([0.0, 0.0, 3.5], (n, 1))
    # aim at the unit sphere with some spread (mostly hits)
    target = rng.uniform(-0.6, 0.6, (n, 3)) * [1, 1, 0]
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, dtype), jnp.asarray(d, dtype)


def test_march_matches_analytic_sphere():
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    o, d = _rays()
    t, hit, steps, _tm = march(sdf_distance, scene.sdf, o, d, t0=0.0,
                          max_steps=256, eps=1e-7, t_far=20.0)
    # analytic ray-sphere: |o + t d| = 1
    oc = np.asarray(o)
    dd = np.asarray(d)
    b = np.sum(oc * dd, -1)
    c = np.sum(oc * oc, -1) - 1.0
    disc = b * b - c
    analytic_hit = disc > 0
    t_analytic = -b - np.sqrt(np.maximum(disc, 0))
    np.testing.assert_array_equal(np.asarray(hit), analytic_hit)
    # sphere tracing converges from below to the analytic root within ~eps
    err = np.abs(np.asarray(t)[analytic_hit] - t_analytic[analytic_hit])
    assert err.max() < 1e-5


def test_ift_gradient_matches_finite_differences():
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    o, d = _rays(32)
    tracer = make_sphere_tracer(sdf_distance, max_steps=256, eps=1e-9, t_far=20.0)

    def mean_t(radius):
        sdf = scene.sdf.replace(sph_radius=radius[None])
        t, hit, _, _tm = tracer(sdf, o, d)
        return jnp.sum(jnp.where(hit, t, 0.0))

    r0 = jnp.asarray(1.0, jnp.float64)
    g_ad = jax.grad(mean_t)(r0)
    eps = 1e-6
    g_fd = (mean_t(r0 + eps) - mean_t(r0 - eps)) / (2 * eps)
    np.testing.assert_allclose(g_ad, g_fd, rtol=1e-5)


def test_ift_gradient_wrt_origin_and_dir():
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    o, d = _rays(8)
    tracer = make_sphere_tracer(sdf_distance, max_steps=256, eps=1e-9, t_far=20.0)

    def f(od):
        o_, d_ = od[:, :3], od[:, 3:]
        t, hit, _, _tm = tracer(scene.sdf, o_, d_)
        return jnp.sum(jnp.where(hit, t, 0.0) * jnp.arange(1.0, 9.0))

    od0 = jnp.concatenate([o, d], -1)
    g_ad = np.asarray(jax.grad(f)(od0))
    eps = 1e-6
    for (i, j) in [(0, 0), (1, 2), (3, 4), (7, 5)]:
        e = np.zeros_like(od0)
        e[i, j] = eps
        fd = (float(f(od0 + e)) - float(f(od0 - e))) / (2 * eps)
        np.testing.assert_allclose(g_ad[i, j], fd, rtol=1e-4, atol=1e-9)


def test_surface_normal_is_radial_on_sphere():
    scene, _ = build_scene("sphere", dtype=jnp.float64)
    rng = np.random.default_rng(3)
    p = rng.normal(size=(32, 3))
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    n = surface_normal(sdf_distance, scene.sdf, jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(n), p, atol=1e-9)


def test_miss_rays_have_zero_gradient():
    scene, _ = build_scene("sphere", dtype=jnp.float64)
    o = jnp.asarray([[0.0, 0.0, 3.5]], jnp.float64)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float64)  # misses
    tracer = make_sphere_tracer(sdf_distance, max_steps=64, eps=1e-7, t_far=20.0)

    def f(radius):
        t, hit, _, _tm = tracer(scene.sdf.replace(sph_radius=radius[None]), o, d)
        return jnp.sum(t)

    assert float(jax.grad(f)(jnp.asarray(1.0))) == 0.0
