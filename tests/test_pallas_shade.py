"""Hand-written Pallas backward for the SDF shade path (pallas_shade.py):
its cotangents must match jax.grad of the XLA shade (the custom_vjp's own
primal), for every parameter group it handles."""

import numpy as np
import jax
import jax.numpy as jnp

import tpu_ray.render.render as rr
from tpu_ray.fit import apply_params, extract_params
from tpu_ray.kernels import pallas_shade
from tpu_ray.render.camera import generate_rays
from tpu_ray.scene.scenes import build_scene

GROUPS = ["materials.albedo", "lights.color", "lights.direction",
          "lights.ambient", "camera.origin", "camera.look_at"]


def _grads(scene_name, extra_groups, width=16):
    # the conftest x64 default would silently promote the f32 kernel trace
    # to f64 (pathologically slow through the unrolled second-order DE in
    # interpret mode); this comparison is f32-vs-f32 by design
    with jax.enable_x64(False):
        scene, cfg = build_scene(scene_name, dtype=jnp.float32)
        cfg = cfg.replace(width=width, height=width, spp=1, block_size=0,
                          diff_vis=False, max_steps=64, pallas="on")
        method = rr.resolve_method(scene, cfg)
        assert pallas_shade.applicable(scene, cfg, method, jnp.float32)
        sx, sy = rr.pixel_sample_coords(cfg, jnp.float32)
        o, d = generate_rays(scene.camera, sx.ravel(), sy.ravel(), width, width)
        res = rr.geometry_residuals(scene, cfg, o, d, method)
        params = extract_params(scene, GROUPS + extra_groups)

        def loss(fn, pp):
            s = apply_params(scene, pp)
            oo, dd = generate_rays(s.camera, sx.ravel(), sy.ravel(),
                                   width, width)
            return jnp.mean(fn(s, cfg, oo, dd, res, method) ** 2)

        gk = jax.jit(jax.grad(
            lambda pp: loss(rr.shade_with_residuals, pp)))(params)
        gx = jax.jit(jax.grad(lambda pp: loss(rr._shade_xla, pp)))(params)
        return (jax.tree_util.tree_map(np.asarray, gk),
                jax.tree_util.tree_map(np.asarray, gx))


def test_kernel_backward_matches_xla_sphere():
    """Smooth field: the fused backward kernel is exact (measured vs an f64
    reference it matches XLA f32 to ~1e-7; here gate at f32 noise level)."""
    gk, gx = _grads("sphere", ["sdf.sph_radius", "sdf.sph_center"])
    for k in gk:
        a, b = np.asarray(gk[k]), np.asarray(gx[k])
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 1e-4, (k, rel)


def test_kernel_backward_matches_xla_mandelbulb():
    """Chaotic field: boundary pixels amplify f32 reassociation through the
    14-iteration fractal Hessian, so the two f32 estimates agree to ~1e-3
    (both are equally far from the f64 reference — conditioning, not error);
    smooth parameter groups stay exact."""
    gk, gx = _grads("mandelbulb", ["sdf.mb_scale", "sdf.mb_center"])
    for k in ("materials.albedo", "lights.color", "lights.ambient",
              "lights.direction"):
        a, b = np.asarray(gk[k]), np.asarray(gx[k])
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 1e-4, (k, rel)
    for k in ("sdf.mb_scale", "sdf.mb_center", "camera.origin",
              "camera.look_at"):
        a, b = np.asarray(gk[k]).ravel(), np.asarray(gx[k]).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert cos > 0.999 and rel < 5e-2, (k, cos, rel)


def test_kernel_backward_gate_fallbacks():
    """Unsupported configurations must fall back to the XLA backward."""
    scene, cfg = build_scene("mandelbulb", dtype=jnp.float32)
    base = cfg.replace(diff_vis=False, pallas="on")
    assert pallas_shade.applicable(scene, base, "sdf", jnp.float32)
    assert not pallas_shade.applicable(scene, base, "mixed", jnp.float32)
    assert not pallas_shade.applicable(scene, base.replace(diff_vis=True),
                                       "sdf", jnp.float32)
    assert not pallas_shade.applicable(
        scene, base.replace(soft_silhouette=0.01), "sdf", jnp.float32)
    assert not pallas_shade.applicable(scene, base, "sdf", jnp.float64)
    pl_scene, pl_cfg = build_scene("pointlight", dtype=jnp.float32)
    assert not pallas_shade.applicable(
        pl_scene, pl_cfg.replace(diff_vis=False, pallas="on"),
        rr.resolve_method(pl_scene, pl_cfg), jnp.float32)
