import numpy as np
import jax.numpy as jnp

from tpu_ray.core import math3d
from tpu_ray.core.aabb import ray_aabb, safe_inv_dir


def test_dot_cross_normalize_match_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(64, 3))
    b = rng.normal(size=(64, 3))
    np.testing.assert_allclose(math3d.dot(jnp.asarray(a), jnp.asarray(b)),
                               np.sum(a * b, -1), rtol=1e-12)
    np.testing.assert_allclose(math3d.cross(jnp.asarray(a), jnp.asarray(b)),
                               np.cross(a, b), rtol=1e-12, atol=1e-12)
    n = np.asarray(math3d.normalize(jnp.asarray(a)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-9)


def test_normalize_zero_vector_finite():
    import jax
    g = jax.grad(lambda v: jnp.sum(math3d.normalize(v)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_ray_aabb_vs_brute_sampling():
    # SURVEY.md §4.2 property test: slab result agrees with dense t-sampling
    rng = np.random.default_rng(1)
    box_min = jnp.asarray([-1.0, -0.5, -2.0])
    box_max = jnp.asarray([1.0, 1.5, 0.5])
    o = rng.uniform(-4, 4, (256, 3))
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    te, tx, hit = ray_aabb(jnp.asarray(o), safe_inv_dir(jnp.asarray(d)), box_min, box_max)
    ts = np.linspace(0, 20, 4001)
    pts = o[:, None, :] + ts[None, :, None] * d[:, None, :]
    inside = np.all((pts >= np.asarray(box_min) - 1e-9) & (pts <= np.asarray(box_max) + 1e-9), -1)
    brute_hit = inside.any(1)
    # sampling may miss grazing corner hits; require agreement away from grazing
    agree = np.asarray(hit) == brute_hit
    assert agree.mean() > 0.99
    for i in np.where(np.asarray(hit) & brute_hit)[0][:50]:
        t_first = ts[np.argmax(inside[i])]
        assert abs(float(te[i]) - t_first) < 6e-3


def test_ray_aabb_inside_box():
    te, tx, hit = ray_aabb(jnp.zeros(3), safe_inv_dir(jnp.asarray([1.0, 0.0, 0.0])),
                           jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]))
    assert bool(hit) and float(te) == 0.0 and abs(float(tx) - 1.0) < 1e-12
