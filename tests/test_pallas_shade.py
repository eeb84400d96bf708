"""Hand-written Pallas backward for the fused shade path (pallas_shade.py):
its cotangents must match jax.grad of the XLA shade (the custom_vjp's own
primal), for every parameter group and every method family it handles
(sdf / mesh / mixed, directional + point lights, mesh-aware AO)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tpu_ray.render.render as rr
from tpu_ray.fit import apply_params, extract_params
from tpu_ray.kernels import pallas_shade
from tpu_ray.render.camera import generate_rays
from tpu_ray.scene.scenes import build_scene

GROUPS = ["materials.albedo", "lights.color", "lights.direction",
          "lights.ambient", "camera.origin", "camera.look_at"]


def _small_mixed(dtype=jnp.float32):
    """Tiny mixed scene (10 tris + ground + one SDF sphere) — the headline
    config's shade chain at interpret-mode-testable size."""
    scene, cfg = build_scene("triangles", dtype=dtype)
    scene = scene.replace(sdf=scene.sdf.replace(
        sph_center=jnp.asarray([[0.4, 0.8, 0.3]], dtype),
        sph_radius=jnp.asarray([0.62], dtype),
        sph_mat=jnp.asarray([1], jnp.int32)))
    return scene, cfg.replace(method="mixed")


def _grads_scene(scene, cfg, groups, width=16, method=None, **overrides):
    # the conftest x64 default would silently promote the f32 kernel trace
    # to f64 (pathologically slow through the unrolled second-order DE in
    # interpret mode); this comparison is f32-vs-f32 by design
    with jax.enable_x64(False):
        cfg = cfg.replace(width=width, height=width, spp=1, block_size=0,
                          diff_vis=False, max_steps=64, pallas="on")
        if overrides:
            cfg = cfg.replace(**overrides)
        method = method or rr.resolve_method(scene, cfg)
        assert pallas_shade.applicable(scene, cfg, method, jnp.float32)
        sx, sy = rr.pixel_sample_coords(cfg, jnp.float32)
        o, d = generate_rays(scene.camera, sx.ravel(), sy.ravel(), width, width)
        res = rr.geometry_residuals(scene, cfg, o, d, method)
        params = extract_params(scene, groups)

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


def _grads(scene_name, extra_groups, width=16, **overrides):
    scene, cfg = build_scene(scene_name, dtype=jnp.float32)
    return _grads_scene(scene, cfg, GROUPS + extra_groups, width, **overrides)


def _assert_close(gk, gx, keys=None, rel_tol=1e-4):
    for k in (keys or gk):
        a, b = np.asarray(gk[k]), np.asarray(gx[k])
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < rel_tol, (k, rel)


def test_kernel_backward_matches_xla_sphere():
    """Smooth field: the fused backward kernel is exact (measured vs an f64
    reference it matches XLA f32 to ~1e-7; here gate at f32 noise level)."""
    gk, gx = _grads("sphere", ["sdf.sph_radius", "sdf.sph_center"])
    _assert_close(gk, gx)


@pytest.mark.slow
def test_kernel_backward_matches_xla_mandelbulb():
    """Chaotic field: boundary pixels amplify f32 reassociation through the
    fractal Hessian, so the two f32 estimates agree to ~1e-3 (both are
    equally far from the f64 reference — conditioning, not error); smooth
    parameter groups stay exact. 6 fractal iterations keep the chaotic
    second-order structure while bounding the interpret-mode cost (the
    12-iteration chain runs on chip in tools/parity_tpu.py every round)."""
    scene, cfg = build_scene("mandelbulb", dtype=jnp.float32)
    scene = scene.replace(sdf=scene.sdf.replace(mb_iters=6))
    gk, gx = _grads_scene(scene, cfg,
                          GROUPS + ["sdf.mb_scale", "sdf.mb_center"], 16)
    _assert_close(gk, gx, ("materials.albedo", "lights.color",
                           "lights.ambient", "lights.direction"))
    for k in ("sdf.mb_scale", "sdf.mb_center", "camera.origin",
              "camera.look_at"):
        a, b = np.asarray(gk[k]).ravel(), np.asarray(gx[k]).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert cos > 0.999 and rel < 5e-2, (k, cos, rel)


def test_kernel_backward_matches_xla_mesh():
    """Pure-mesh chain (VERDICT r2 item 1): MT re-solve of the selected
    triangle in-kernel, corner cotangents scattered to verts outside."""
    scene, cfg = build_scene("triangles", dtype=jnp.float32)
    gk, gx = _grads_scene(scene, cfg, GROUPS + ["mesh.verts"], width=20)
    _assert_close(gk, gx)


def test_kernel_backward_matches_xla_mixed():
    """The headline mixed chain: IFT + MT branches, stop-grad closest-select,
    vertex scatter AND sdf cotangents from one kernel."""
    scene, cfg = _small_mixed()
    gk, gx = _grads_scene(
        scene, cfg,
        GROUPS + ["mesh.verts", "sdf.sph_radius", "sdf.sph_center"], width=20)
    _assert_close(gk, gx)


def test_kernel_backward_matches_xla_mixed_ao():
    """Mixed chain with mesh-aware DF-AO (ao_tmesh residual taps)."""
    scene, cfg = _small_mixed()
    cfg = cfg.replace(ao="sdf5")
    gk, gx = _grads_scene(
        scene, cfg,
        GROUPS + ["mesh.verts", "sdf.sph_radius", "sdf.sph_center"], width=16)
    _assert_close(gk, gx)


def test_kernel_backward_matches_xla_soft_penumbra():
    """diff_vis soft shadows (VERDICT r4 item 2): the penumbra factor is
    recomputed in-kernel from ONE DE eval at the saved argmin parameter
    sh_ts; its pullback must match the XLA occluder recompute."""
    gk, gx = _grads("sphere", ["sdf.sph_radius", "sdf.sph_center"],
                    shadow="soft", diff_vis=True)
    _assert_close(gk, gx)


def test_kernel_backward_matches_xla_silhouette():
    """Soft silhouettes (VERDICT r4 item 2): sigmoid coverage from one DE
    eval at the saved closest-approach tmin; miss lanes carry real
    cotangents, so every tile class must run the full chain."""
    gk, gx = _grads("sphere", ["sdf.sph_radius", "sdf.sph_center"],
                    soft_silhouette=0.05)
    _assert_close(gk, gx)


def test_kernel_backward_matches_xla_mixed_softvis_silhouette():
    """The README fit invocation's chain: mixed scene, soft shadows with
    diff_vis AND soft silhouettes AND mesh-aware AO, in one kernel."""
    scene, cfg = _small_mixed()
    gk, gx = _grads_scene(
        scene, cfg,
        GROUPS + ["mesh.verts", "sdf.sph_radius", "sdf.sph_center"],
        width=20, shadow="soft", diff_vis=True, soft_silhouette=0.05,
        ao="sdf5")
    _assert_close(gk, gx)


def test_kernel_backward_matches_xla_mesh_silhouette():
    """Mesh edge-band coverage (VERDICT r4 item 3): the barycentric margin
    recompute and its vertex pullback, pure-mesh and mixed."""
    scene, cfg = build_scene("triangles", dtype=jnp.float32)
    gk, gx = _grads_scene(scene, cfg, GROUPS + ["mesh.verts"], width=20,
                          mesh_silhouette=0.06)
    _assert_close(gk, gx)
    mscene, mcfg = _small_mixed()
    gk, gx = _grads_scene(
        mscene, mcfg,
        GROUPS + ["mesh.verts", "sdf.sph_radius", "sdf.sph_center"],
        width=20, mesh_silhouette=0.06, soft_silhouette=0.05)
    _assert_close(gk, gx)


def test_kernel_backward_matches_xla_pointlight_penumbra():
    """Point-light diff_vis penumbra: the DE eval rides the OFFSET segment
    p_off -> light (the ray the geometry pass marched)."""
    scene, cfg = build_scene("pointlight", dtype=jnp.float32)
    gk, gx = _grads_scene(
        scene, cfg,
        GROUPS + ["lights.position", "lights.pos_color", "sdf.sph_radius"],
        width=16, shadow="soft", diff_vis=True)
    _assert_close(gk, gx)


def test_kernel_backward_matches_xla_pointlight():
    """Point lights: per-ray direction + inverse-square falloff, light
    position and radiance cotangents."""
    scene, cfg = build_scene("pointlight", dtype=jnp.float32)
    gk, gx = _grads_scene(
        scene, cfg,
        GROUPS + ["lights.position", "lights.pos_color",
                  "sdf.sph_radius", "sdf.box_center"], width=16)
    _assert_close(gk, gx)


def test_kernel_backward_tile_classes():
    """The kernel's per-tile class dispatch (full / mesh-only / miss-only)
    must emit cotangents identical to the XLA backward on a batch that
    contains one tile of EACH class (1024-ray tiles built explicitly)."""
    scene, cfg = _small_mixed()
    with jax.enable_x64(False):
        cfg = cfg.replace(diff_vis=False, max_steps=64, pallas="on",
                          block_size=0)
        method = "mixed"
        o0 = np.asarray(scene.camera.origin, np.float32)
        rng = np.random.default_rng(7)

        def dirs_to(targets):
            d = targets - o0
            return d / np.linalg.norm(d, axis=-1, keepdims=True)

        # tile A: sky (straight up with jitter — hits nothing)
        d_sky = dirs_to(o0 + np.stack([rng.uniform(-.2, .2, 1024),
                                       np.full(1024, 5.0),
                                       rng.uniform(-.2, .2, 1024)], -1))
        # tile B: ground far from the SDF sphere (mesh-only)
        tg = np.stack([rng.uniform(-3.0, -2.2, 1024),
                       np.zeros(1024),
                       rng.uniform(-3.0, -2.2, 1024)], -1)
        d_mesh = dirs_to(tg)
        # tile C: straight at the SDF sphere (sdf-selected)
        c = np.asarray(scene.sdf.sph_center[0], np.float32)
        tc = c + rng.uniform(-.2, .2, (1024, 3)).astype(np.float32) * 0.3
        d_sdf = dirs_to(tc)

        d = jnp.asarray(np.concatenate([d_sky, d_mesh, d_sdf]), jnp.float32)
        o = jnp.broadcast_to(jnp.asarray(o0), d.shape)
        res = rr.geometry_residuals(scene, cfg, o, d, method)
        hs = np.asarray(res["sdf_hit"]).reshape(3, 1024)
        hm = np.asarray(res["mesh_hit"]).reshape(3, 1024)
        assert not hs[0].any() and not hm[0].any(), "tile A must be sky"
        assert hm[1].all() and not hs[1].any(), "tile B must be mesh-only"
        assert hs[2].any(), "tile C must select the SDF"

        groups = GROUPS + ["mesh.verts", "sdf.sph_radius", "sdf.sph_center"]
        params = extract_params(scene, groups)

        def loss(fn, pp):
            s = apply_params(scene, pp)
            return jnp.mean(fn(s, cfg, o, d, res, method) ** 2)

        gk = jax.jit(jax.grad(
            lambda pp: loss(rr.shade_with_residuals, pp)))(params)
        gx = jax.jit(jax.grad(lambda pp: loss(rr._shade_xla, pp)))(params)
        _assert_close(jax.tree_util.tree_map(np.asarray, gk),
                      jax.tree_util.tree_map(np.asarray, gx))


@pytest.mark.parametrize("scene_name,method", [
    ("sphere", "sdf"), ("triangles", "mesh_brute"), ("pointlight", "sdf")])
def test_kernel_forward_matches_xla(scene_name, method):
    """The fused Pallas FORWARD (round 4) must match the XLA shade chain it
    mirrors to f32 reassociation tolerance, per method family. (The kernel
    is exercised directly — _FWD_RULE_IMPL selects XLA by default because it
    measured faster on chip, but the kernel stays a gated capability.)"""
    scene, cfg = build_scene(scene_name, dtype=jnp.float32)
    _assert_fwd_close(scene, cfg, method)


def test_kernel_forward_matches_xla_mixed_ao():
    scene, cfg = _small_mixed()
    _assert_fwd_close(scene, cfg.replace(ao="sdf5"), "mixed")


def _assert_fwd_close(scene, cfg, method, width=16):
    with jax.enable_x64(False):
        cfg = cfg.replace(width=width, height=width, spp=1, block_size=0,
                          diff_vis=False, max_steps=64, pallas="on")
        assert pallas_shade.applicable(scene, cfg, method, jnp.float32)
        sx, sy = rr.pixel_sample_coords(cfg, jnp.float32)
        o, d = generate_rays(scene.camera, sx.ravel(), sy.ravel(),
                             width, width)
        res = rr.geometry_residuals(scene, cfg, o, d, method)
        a = np.asarray(pallas_shade.apply_fwd_kernel(scene, cfg, o, d, res,
                                                     method))
        b = np.asarray(rr._shade_xla(scene, cfg, o, d, res, method))
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_kernel_backward_gate_fallbacks():
    """The round-5 widening covers every shipped shade chain (diff_vis soft
    penumbra, soft silhouettes); only f64 / method-scene mismatches fall
    back to the XLA backward."""
    scene, cfg = build_scene("mandelbulb", dtype=jnp.float32)
    base = cfg.replace(diff_vis=False, pallas="on")
    assert pallas_shade.applicable(scene, base, "sdf", jnp.float32)
    # mixed requires BOTH an sdf and a mesh; the mandelbulb scene has no mesh
    assert not pallas_shade.applicable(scene, base, "mixed", jnp.float32)
    # round 5: the differentiable-visibility chains run the fused backward
    assert pallas_shade.applicable(scene, base.replace(diff_vis=True),
                                   "sdf", jnp.float32)
    assert pallas_shade.applicable(
        scene, base.replace(soft_silhouette=0.01), "sdf", jnp.float32)
    assert not pallas_shade.applicable(scene, base, "sdf", jnp.float64)

    mixed_scene, mixed_cfg = _small_mixed()
    assert pallas_shade.applicable(
        mixed_scene, mixed_cfg.replace(pallas="on"), "mixed", jnp.float32)
    tri_scene, tri_cfg = build_scene("triangles", dtype=jnp.float32)
    assert pallas_shade.applicable(
        tri_scene, tri_cfg.replace(pallas="on"), "mesh_brute", jnp.float32)
    pl_scene, pl_cfg = build_scene("pointlight", dtype=jnp.float32)
    assert pallas_shade.applicable(
        pl_scene, pl_cfg.replace(diff_vis=False, pallas="on"),
        rr.resolve_method(pl_scene, pl_cfg), jnp.float32)
    assert pallas_shade.applicable(
        pl_scene, pl_cfg.replace(diff_vis=True, pallas="on"),
        rr.resolve_method(pl_scene, pl_cfg), jnp.float32)
