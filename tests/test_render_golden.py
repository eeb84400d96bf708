"""Golden-image tests: TPU-path renderer vs the scalar numpy CPU reference.

SURVEY.md §4.1 — every kernel must allclose the CPU reference. Small
resolutions keep the scalar reference tolerable.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ref import cpu_renderer
from tpu_ray.render.render import render_image, render_image_jit
from tpu_ray.scene.scenes import build_scene


def _compare(name, size, dtype, atol, spp=None, **cfg_kw):
    scene, cfg = build_scene(name, dtype=dtype)
    cfg = cfg.replace(width=size, height=size, block_size=0, **cfg_kw)
    if spp is not None:
        cfg = cfg.replace(spp=spp)
    img = np.asarray(render_image(scene, cfg))
    ref_img = cpu_renderer.render_image(scene, cfg)
    np.testing.assert_allclose(img, ref_img, atol=atol)
    return img


def test_sphere_golden_f64():
    _compare("sphere", 32, jnp.float64, atol=5e-6)


def test_sphere_golden_f32():
    _compare("sphere", 32, jnp.float32, atol=3e-3)


def test_sphere_golden_spp4():
    _compare("sphere", 24, jnp.float64, atol=5e-6, spp=4)


def test_sphere_with_hard_shadow_and_plane():
    # add a ground plane so shadows actually land somewhere
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    sdf = scene.sdf.replace(
        pln_normal=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float64),
        pln_offset=jnp.asarray([-1.0], jnp.float64),
        pln_mat=jnp.asarray([0], jnp.int32),
    )
    scene = scene.replace(sdf=sdf)
    cfg = cfg.replace(width=32, height=32, shadow="hard")
    img = np.asarray(render_image(scene, cfg))
    ref_img = cpu_renderer.render_image(scene, cfg)
    np.testing.assert_allclose(img, ref_img, atol=5e-6)


def test_mandelbulb_golden_small():
    # The CPU reference computes normals by central differences, the TPU path
    # by autodiff; on the rough fractal surface these genuinely differ at a
    # few pixels, so the gate is quantile-based (99% tight, max loose).
    scene, cfg = build_scene("mandelbulb", dtype=jnp.float64)
    cfg = cfg.replace(width=24, height=24, block_size=0, spp=1)
    img = np.asarray(render_image(scene, cfg))
    ref_img = cpu_renderer.render_image(scene, cfg)
    d = np.abs(img - ref_img).max(-1)
    assert np.quantile(d, 0.99) < 2e-4
    assert d.max() < 2e-2


def test_blocked_render_matches_unblocked():
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    cfg0 = cfg.replace(width=32, height=32, block_size=0)
    cfg1 = cfg.replace(width=32, height=32, block_size=128)
    a = np.asarray(render_image(scene, cfg0))
    b = np.asarray(render_image(scene, cfg1))
    # blocking changes XLA fusion boundaries, so bit-equality is not expected
    # across block sizes (it IS expected across runs at a fixed config);
    # agreement must still be at rounding level.
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_jit_matches_eager():
    scene, cfg = build_scene("sphere", dtype=jnp.float32)
    cfg = cfg.replace(width=16, height=16)
    a = np.asarray(render_image(scene, cfg))
    b = np.asarray(render_image_jit(scene, cfg))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_soft_silhouette_golden():
    """The TPU soft-silhouette path must match the CPU reference's coverage
    blend (oracle-divergence fix: the reference previously ignored it)."""
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    cfg = cfg.replace(width=24, height=24, soft_silhouette=0.05)
    img = np.asarray(render_image(scene, cfg))
    ref_img = cpu_renderer.render_image(scene, cfg)
    np.testing.assert_allclose(img, ref_img, atol=5e-6)


def test_jittered_aa_golden():
    """Seeded-jitter AA vs the CPU reference: the oracle reproduces the exact
    jax.random sample sequence (ref/cpu_renderer.jitter_offsets), so the
    jittered path gets a real correctness gate, not just determinism."""
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    cfg = cfg.replace(width=20, height=20, spp=4, jitter_seed=3)
    img = np.asarray(render_image(scene, cfg))
    ref_img = cpu_renderer.render_image(scene, cfg)
    np.testing.assert_allclose(img, ref_img, atol=5e-6)


def test_jitter_determinism_and_seed_sensitivity():
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    cfg = cfg.replace(width=16, height=16, spp=4)
    a = np.asarray(render_image(scene, cfg.replace(jitter_seed=7)))
    b = np.asarray(render_image(scene, cfg.replace(jitter_seed=7)))
    c = np.asarray(render_image(scene, cfg.replace(jitter_seed=8)))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0.0


@pytest.mark.slow  # ~45 s: the mixed chain is covered fast by test_jit_
# matches_eager + per-kernel goldens; full CPU-oracle match runs in --runslow
def test_mixed_scene_golden_small():
    """Mixed mesh+SDF shading path vs the CPU reference (small crop, brute)."""
    scene, cfg = build_scene("mixed", dtype=jnp.float64)
    cfg = cfg.replace(width=16, height=16, spp=1, block_size=0,
                      method="mixed", max_steps=64)
    scene = scene.replace(grid=None, packet=None)  # force brute mesh path
    img = np.asarray(render_image(scene, cfg))
    ref_img = cpu_renderer.render_image(scene, cfg)
    d = np.abs(img - ref_img).max(-1)
    # fractal pixels: central-diff vs autodiff normals (see mandelbulb golden)
    assert np.quantile(d, 0.95) < 1e-4 and d.max() < 0.05


@pytest.mark.slow  # ~34 s: AO math is gated fast by test_pallas_shade mixed_ao
# backward parity + the shading unit tests; full CPU golden runs in --runslow
def test_mixed_ao_golden_small():
    """Mesh-aware DF-AO (ao=sdf5 on the mixed scene): mesh occludes and
    receives the 5-tap AO via the ao_tmesh residual; must match the scalar
    CPU oracle's mirrored formula."""
    scene, cfg = build_scene("mixed", dtype=jnp.float64)
    cfg = cfg.replace(width=16, height=16, spp=1, block_size=0,
                      method="mixed", max_steps=64, ao="sdf5",
                      ao_strength=1.5, ao_step=0.06)
    scene = scene.replace(grid=None, packet=None)  # force brute mesh path
    img = np.asarray(render_image(scene, cfg))
    ref_img = cpu_renderer.render_image(scene, cfg)
    d = np.abs(img - ref_img).max(-1)
    assert np.quantile(d, 0.95) < 1e-4 and d.max() < 0.05


def test_bunny_mesh_only_ao():
    """Pure-mesh AO: with no SDF in the scene, ao=sdf5 still darkens contact
    regions through the mesh tap term (it was previously a no-op)."""
    from tpu_ray.scene.scenes import build_scene as bs

    scene, cfg = bs("triangles", dtype=jnp.float64)
    cfg = cfg.replace(width=16, height=16, spp=1, block_size=0, ao="sdf5",
                      ao_strength=1.5, ao_step=0.08)
    img_ao = np.asarray(render_image(scene, cfg))
    img_no = np.asarray(render_image(scene, cfg.replace(ao="none")))
    ref_img = cpu_renderer.render_image(scene, cfg)
    d = np.abs(img_ao - ref_img).max(-1)
    assert np.quantile(d, 0.95) < 1e-4 and d.max() < 0.05
    assert img_ao.sum() < img_no.sum()  # AO only ever darkens
