"""Distributed tests on the fake 8-device CPU mesh (SURVEY.md §4.4).

Asserts: sharded render == single-device render; DP fit-step gradients ==
single-device gradients (psum correctness); ring scene-shard intersection ==
brute force; determinism across shardings.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpu_ray.dist.scene_shard import intersect_ring, partition_mesh
from tpu_ray.dist.sharding import RAY_AXIS, make_mesh, render_image_sharded
from tpu_ray.fit import extract_params, make_fit_step, make_sharded_fit_step
from tpu_ray.kernels import moller_trumbore as mt
from tpu_ray.render.render import render_image
from tpu_ray.scene.scenes import build_scene


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must force 8 fake CPU devices"
    return make_mesh(jax.devices()[:8])


def test_sharded_render_matches_single_device(mesh8):
    for name in ("sphere", "triangles"):
        scene, cfg = build_scene(name, dtype=jnp.float64)
        cfg = cfg.replace(width=40, height=24, block_size=0)
        single = np.asarray(render_image(scene, cfg))
        sharded = np.asarray(jax.jit(
            lambda s: render_image_sharded(s, cfg, mesh8))(scene))
        np.testing.assert_allclose(sharded, single, atol=1e-12)


def test_sharded_render_non_divisible_ray_count(mesh8):
    # 27x9 pixels * spp 1 = 243 rays, not divisible by 8 -> padding path
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    cfg = cfg.replace(width=27, height=9, block_size=0)
    single = np.asarray(render_image(scene, cfg))
    sharded = np.asarray(jax.jit(
        lambda s: render_image_sharded(s, cfg, mesh8))(scene))
    np.testing.assert_allclose(sharded, single, atol=1e-12)


def test_sharded_fit_grads_match_single_device(mesh8):
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    cfg = cfg.replace(width=24, height=24, block_size=0)
    target = render_image(scene, cfg) + 0.07
    trainable = ("sdf.sph_radius", "camera.origin", "materials.albedo")
    params = extract_params(scene, trainable)
    opt = optax.sgd(0.0)  # lr 0: step returns untouched params; we compare loss
    single = make_fit_step(scene, cfg, target, opt)
    sharded = make_sharded_fit_step(scene, cfg, target, opt, mesh8)
    st = opt.init(params)
    _, _, loss_single = single(params, st)
    _, _, loss_sharded = sharded(params, st)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single), rtol=1e-12)

    # gradients: use adam with real lr and compare the updated params
    opt = optax.adam(1e-2)
    st = opt.init(params)
    p1, _, _ = make_fit_step(scene, cfg, target, opt)(params, st)
    p2, _, _ = make_sharded_fit_step(scene, cfg, target, opt, mesh8)(params, st)
    for k in params:
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(p1[k]), atol=1e-9)


def test_sharded_fit_loss_decreases(mesh8):
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    cfg = cfg.replace(width=16, height=16, block_size=0)
    target = render_image(
        scene.replace(sdf=scene.sdf.replace(sph_radius=jnp.asarray([1.25]))), cfg)
    trainable = ("sdf.sph_radius",)
    params = extract_params(scene, trainable)
    opt = optax.adam(2e-2)
    st = opt.init(params)
    step = make_sharded_fit_step(scene, cfg, target, opt, mesh8)
    losses, best = [], (np.inf, None)
    for _ in range(30):
        prev = params
        params, st, loss = step(params, st)
        losses.append(float(loss))
        if losses[-1] < best[0]:
            best = (losses[-1], prev)
    # silhouette pixels carry no gradient, so adam can overshoot the sharp
    # minimum; the best iterate must still recover the target radius
    assert best[0] < losses[0] * 0.05
    assert abs(float(best[1]["sdf.sph_radius"][0]) - 1.25) < 0.1


def test_ring_scene_shard_matches_brute(mesh8):
    rng = np.random.default_rng(4)
    n_tris = 97  # deliberately not divisible by 8 -> padding shard path
    c = rng.uniform(-2, 2, (n_tris, 3))
    e0 = rng.normal(size=(n_tris, 3)) * 0.4
    e1 = rng.normal(size=(n_tris, 3)) * 0.4
    verts = np.stack([c - e0, c + e1, c + e0 - e1], 1).reshape(-1, 3)
    faces = np.arange(3 * n_tris).reshape(-1, 3)
    from tpu_ray.scene.mesh import MeshScene

    mesh_scene = MeshScene.from_numpy(verts, faces, dtype=jnp.float64)
    R = 8 * 16
    o = jnp.asarray(rng.uniform(-4, 4, (R, 3)))
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    v0, v1, v2, tid = partition_mesh(verts, faces, 8)
    ring = shard_map(
        lambda o_, d_, a, b, c_, i: intersect_ring(o_, d_, a[0], b[0], c_[0], i[0]),
        mesh=mesh8,
        in_specs=(P(RAY_AXIS),) * 6,
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )
    got = jax.jit(ring)(o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                        jnp.asarray(tid))
    want = mt.intersect_brute(mesh_scene, o, d)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    hits = np.asarray(want.hit)
    np.testing.assert_allclose(np.asarray(got.t)[hits], np.asarray(want.t)[hits],
                               rtol=1e-10)
    np.testing.assert_array_equal(np.asarray(got.tri)[hits],
                                  np.asarray(want.tri)[hits])


def test_determinism_across_shardings(mesh8):
    scene, cfg = build_scene("sphere", dtype=jnp.float32)
    cfg = cfg.replace(width=32, height=32, block_size=0)
    mesh4 = make_mesh(jax.devices()[:4])
    a = np.asarray(jax.jit(lambda s: render_image_sharded(s, cfg, mesh8))(scene))
    b = np.asarray(jax.jit(lambda s: render_image_sharded(s, cfg, mesh4))(scene))
    # same per-lane math, different shard boundaries: identical is the goal
    np.testing.assert_array_equal(a, b)


def test_sharded_fit_objective_matches_single_device_spp4(mesh8):
    """With spp > 1 the sharded loss must be the MSE of the spp-AVERAGED
    image (same objective as make_fit_step), not a per-sample MSE."""
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    cfg = cfg.replace(width=16, height=16, spp=4, block_size=0)
    target = render_image(scene, cfg) + 0.05
    params = extract_params(scene, ("sdf.sph_radius", "materials.albedo"))
    opt = optax.adam(1e-2)
    st = opt.init(params)
    p1, _, l1 = make_fit_step(scene, cfg, target, opt)(params, st)
    p2, _, l2 = make_sharded_fit_step(scene, cfg, target, opt, mesh8)(params, st)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-12)
    for k in params:
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(p1[k]), atol=1e-9)


def test_sharded_render_blocked_matches_unblocked(mesh8):
    scene, cfg = build_scene("sphere", dtype=jnp.float64)
    a = np.asarray(jax.jit(lambda s: render_image_sharded(
        s, cfg.replace(width=32, height=16, block_size=0), mesh8))(scene))
    b = np.asarray(jax.jit(lambda s: render_image_sharded(
        s, cfg.replace(width=32, height=16, block_size=128), mesh8))(scene))
    np.testing.assert_allclose(a, b, atol=1e-12)


@pytest.mark.slow
def test_ring_packet_render_matches_replicated(mesh8):
    """VERDICT r1 item 3: a full frame rendered with the scene partitioned
    around the ring (packet kernel + ppermute + running-t fold) must match
    the replicated-scene render. 2 devices: one ring rotation exercises the
    ppermute + running-t fold, and each extra shard duplicates the
    interpret-mode kernel cost (gate budget)."""
    mesh4 = make_mesh(jax.devices()[:2])
    scene, cfg = build_scene("triangles", dtype=jnp.float32)
    scene = scene.with_grid()
    cfg = cfg.replace(width=16, height=8, block_size=0, pallas="on",
                      method="mesh_grid")
    replicated = np.asarray(jax.jit(
        lambda s: render_image_sharded(s, cfg, mesh4))(scene))
    # the ring accel builds host-side from concrete verts -> close over scene
    ringed = np.asarray(render_image_sharded(scene, cfg, mesh4,
                                             scene_shards=True))
    np.testing.assert_allclose(ringed, replicated, atol=2e-6)


@pytest.mark.slow
def test_ring_packet_mixed_scene_and_fit_step(mesh8):
    """Ring scene-shard inside the differentiable fit step: loss and vertex
    gradients must match the replicated sharded step exactly (the ring only
    replaces the geometry pass; the diff recompute reads the raw mesh)."""
    import optax as _optax

    mesh4 = make_mesh(jax.devices()[:2])  # one rotation; gate budget
    scene, cfg = build_scene("triangles", dtype=jnp.float64)
    scene = scene.with_grid()
    cfg = cfg.replace(width=8, height=8, block_size=0, pallas="on",
                      method="mesh_grid", shadow="none")
    target = render_image(scene, cfg) + 0.05
    trainable = ("mesh.verts", "camera.origin")
    params = extract_params(scene, trainable)
    opt = _optax.sgd(1e-3)
    st = opt.init(params)
    rep = make_sharded_fit_step(scene, cfg, target, opt, mesh4)
    ring = make_sharded_fit_step(scene, cfg, target, opt, mesh4,
                                 scene_shards=True)
    p_rep, _, loss_rep = rep(params, st)
    p_ring, _, loss_ring = ring(params, st)
    np.testing.assert_allclose(float(loss_ring), float(loss_rep), rtol=1e-12)
    for k in params:
        np.testing.assert_allclose(np.asarray(p_ring[k]), np.asarray(p_rep[k]),
                                   atol=1e-12)


@pytest.mark.slow
def test_ring_packet_refits_moved_verts(mesh8):
    """ADVICE r2: a vertex fit with scene_shards=True must intersect the
    CURRENT geometry, not the frozen build-time ring accel. Step from verts
    perturbed well past the build AABBs and compare loss + updates against
    the single-device refit-accel oracle."""
    import optax as _optax

    from tpu_ray.fit import make_fit_step

    # 2 shards / 8x8 / no shadows: one ring rotation catches a stale accel,
    # and every extra shard or shadow query duplicates the interpret-mode
    # kernel cost (gate budget). The oracle step runs BRUTE MT (pallas off,
    # no accel at all) — gradient equality against an accel-free path is the
    # strongest form of the check.
    mesh4 = make_mesh(jax.devices()[:2])
    scene, cfg = build_scene("triangles", dtype=jnp.float64)
    scene = scene.with_grid()
    cfg = cfg.replace(width=8, height=8, block_size=0, pallas="on",
                      method="mesh_grid", shadow="none")
    target = render_image(scene, cfg) + 0.05
    params = extract_params(scene, ["mesh.verts"])
    # move every vert far enough to change hits vs the build-time accel
    rng = np.random.default_rng(3)
    params["mesh.verts"] = params["mesh.verts"] + jnp.asarray(
        rng.normal(size=params["mesh.verts"].shape) * 0.2)
    opt = _optax.sgd(1e-3)
    st = opt.init(params)
    cfg_oracle = cfg.replace(pallas="off", method="mesh_brute")
    p_one, _, l_one = make_fit_step(scene.replace(grid=None, packet=None),
                                    cfg_oracle, target, opt,
                                    refit_accel=False)(params, st)
    ring = make_sharded_fit_step(scene, cfg, target, opt, mesh4,
                                 scene_shards=True)
    p_ring, _, l_ring = ring(params, st)
    np.testing.assert_allclose(float(l_ring), float(l_one), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p_ring["mesh.verts"]),
                               np.asarray(p_one["mesh.verts"]), atol=1e-10)


def test_balanced_pixel_perm_properties():
    # the shard load-balancer must be a bijection over pixels, and each
    # shard's slice must sample the whole frame (rows from everywhere)
    from tpu_ray.dist.sharding import balanced_pixel_perm
    from tpu_ray.utils.config import RenderConfig

    for w, h in ((64, 40), (27, 9)):  # block-divisible and not
        cfg = RenderConfig(width=w, height=h, spp=1)
        perm = balanced_pixel_perm(cfg, 8)
        assert sorted(perm.tolist()) == list(range(w * h))
        rows = perm // w
        per = len(perm) // 8
        for s in range(8):
            span = rows[s * per:(s + 1) * per]
            assert span.max() - span.min() >= h // 2, (
                "shard %d covers rows %d..%d only" % (s, span.min(), span.max()))


@pytest.mark.slow
def test_ring_pose_fit_matches_single_device(mesh8):
    """scene_shards + poses.* trainables: the ring accel shards must track
    the POSED geometry (refit per step + posed-vert build), so the ring-path
    loss equals the single-device oracle (review r3: the ring previously
    froze build-time unposed geometry, zeroing pose gradients)."""
    from tpu_ray.scene.transform import MeshPoses

    scene, cfg = build_scene("triangles", dtype=jnp.float32)
    nv = scene.mesh.verts.shape[0]
    inst = np.full((nv,), -1, np.int32)
    inst[:30] = 0
    scene = scene.replace(
        poses=MeshPoses.identity(1, inst, dtype=jnp.float32)).with_packet()
    cfg = cfg.replace(width=16, height=16, block_size=0, pallas="off",
                      shadow="none")
    start = scene.replace(poses=scene.poses.replace(
        translate=jnp.asarray([[0.2, 0.1, 0.0]], jnp.float32)))
    target = render_image(scene, cfg)
    params = extract_params(start, ["poses.translate"])
    opt = optax.adam(1e-2)
    st = opt.init(params)
    _, _, loss_ring = make_sharded_fit_step(
        start, cfg, target, opt, mesh8, scene_shards=True)(params, st)
    _, _, loss_one = make_fit_step(start, cfg, target, opt)(params, st)
    np.testing.assert_allclose(float(loss_ring), float(loss_one), rtol=1e-5)
    assert float(loss_ring) > 1e-3  # posed-start must actually mismatch
