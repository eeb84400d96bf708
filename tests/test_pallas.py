"""Pallas kernel tests (interpret mode on CPU, SURVEY.md §4.4): the fused
tile kernels must reproduce the jnp reference paths exactly (same op order),
and gradients through the pallas-forward tracer must equal the jnp-forward
tracer (shared IFT backward)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from tpu_ray.kernels.pallas_sdf import de_tile, march_pallas, shadow_pallas
from tpu_ray.kernels.sphere_trace import make_sphere_tracer, march
from tpu_ray.render import shading
from tpu_ray.render.render import render_image
from tpu_ray.scene.scenes import build_scene
from tpu_ray.sdf.primitives import sdf_distance


def _rays(n=300, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    o = np.tile([0.0, 1.2, 3.2], (n, 1))
    tgt = rng.uniform([-1.2, 0.0, -1.0], [1.2, 2.2, 1.0], (n, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, dtype), jnp.asarray(d, dtype)


def test_de_tile_matches_generic():
    for name in ("sphere", "mandelbulb", "mixed"):
        scene, _ = build_scene(name, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        p = jnp.asarray(rng.uniform(-2, 2, (8, 128, 3)), jnp.float32)
        want = np.asarray(sdf_distance(scene.sdf, p))
        got = np.asarray(de_tile(scene.sdf, p[..., 0], p[..., 1], p[..., 2]))
        err = np.abs(got - want)
        if scene.sdf.mb_center.shape[0]:
            # fractal DE is chaotic: f32 summation-order differences amplify
            # through the iteration for points near/inside the set boundary
            assert np.quantile(err, 0.995) < 1e-5 and err.max() < 0.05
        else:
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_march_pallas_matches_jnp():
    for name in ("sphere", "mandelbulb"):
        scene, cfg = build_scene(name, dtype=jnp.float32)
        o, d = _rays(300)  # non-multiple of 1024 -> padding path
        tj, hj, sj, tmj = march(sdf_distance, scene.sdf, o, d, t0=0.0,
                           max_steps=cfg.max_steps, eps=cfg.eps, t_far=cfg.t_far)
        tp, hp, sp, tmp_ = march_pallas(scene.sdf, o, d, t0=0.0,
                                  max_steps=cfg.max_steps, eps=cfg.eps,
                                  t_far=cfg.t_far, interpret=True)
        hp_, hj_ = np.asarray(hp), np.asarray(hj)
        terr = np.abs(np.asarray(tp) - np.asarray(tj))
        if name == "mandelbulb":
            # chaotic DE + polynomial atan2 (~2e-7) amplified by the
            # iteration: both marches land within an eps-band of the surface
            assert (hp_ == hj_).mean() > 0.99
            same = hp_ == hj_
            assert np.quantile(terr[same], 0.99) < 2e-3
        else:
            np.testing.assert_array_equal(hp_, hj_)
            # hits must agree (rounding drifts ~1 ulp/step); bound-culled
            # misses legitimately report t = t_far instead of the jnp
            # march's overshoot value
            np.testing.assert_allclose(np.asarray(tp)[hj_], np.asarray(tj)[hj_],
                                       rtol=1e-4, atol=1e-5)
            assert (np.asarray(tp)[~hj_] >= cfg.t_far * (1 - 1e-6)).all()
            np.testing.assert_array_equal(np.asarray(sp)[hj_], np.asarray(sj)[hj_])


def test_shadow_pallas_matches_jnp():
    scene, cfg = build_scene("mandelbulb", dtype=jnp.float32)
    o, d = _rays(200, seed=3)
    t, hit, _, _tm = march(sdf_distance, scene.sdf, o, d, t0=0.0,
                      max_steps=cfg.max_steps, eps=cfg.eps, t_far=cfg.t_far)
    p = o + t[:, None] * d
    lv = np.asarray([0.5, 0.75, 0.45])
    l = jnp.broadcast_to(jnp.asarray(lv / np.linalg.norm(lv), jnp.float32), p.shape)
    for soft in (False, True):
        if soft:
            want = shading.sdf_soft_shadow(sdf_distance, scene.sdf, p, l, cfg)
        else:
            want = shading.sdf_hard_shadow(sdf_distance, scene.sdf, p, l, cfg)
        got, got_ts = shadow_pallas(scene.sdf, p, l, soft=soft, eps=cfg.eps,
                                    t_far=cfg.t_far, steps=cfg.shadow_steps,
                                    bias=cfg.shadow_bias, soft_k=cfg.soft_k,
                                    interpret=True)
        err = np.abs(np.asarray(got) - np.asarray(want))
        # polynomial atan2 in the fractal DE shifts soft-shadow factors a bit
        assert np.quantile(err, 0.95) < 2e-3 and err.max() < 0.2
        if soft:
            # the argmin residual must reproduce the penumbra min exactly
            want_s, want_ts = shading.sdf_soft_shadow_argmin(
                sdf_distance, scene.sdf, p, l, cfg)
            np.testing.assert_allclose(np.asarray(want_s), np.asarray(want),
                                       rtol=1e-6, atol=1e-6)
            terr = np.abs(np.asarray(got_ts) - np.asarray(want_ts))
            assert np.quantile(terr, 0.95) < 1e-2


def test_tracer_gradients_pallas_forward_equals_jnp_forward():
    scene, _ = build_scene("sphere", dtype=jnp.float32)
    o, d = _rays(64, seed=5)
    kw = dict(max_steps=128, eps=1e-4, t_far=20.0)
    tr_j = make_sphere_tracer(sdf_distance, **kw, forward_impl="jnp")
    tr_p = make_sphere_tracer(sdf_distance, **kw, forward_impl="pallas")

    def loss(tracer, radius):
        t, hit, _, _tm = tracer(scene.sdf.replace(sph_radius=radius), o, d)
        return jnp.sum(jnp.where(hit, t, 0.0))

    r0 = jnp.asarray([1.0], jnp.float32)
    with jax.disable_jit():  # interpret-mode pallas inside grad trace
        g_j = jax.grad(lambda r: loss(tr_j, r))(r0)
        g_p = jax.grad(lambda r: loss(tr_p, r))(r0)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j), rtol=1e-5)


def test_render_pallas_on_matches_off():
    scene, cfg = build_scene("mandelbulb", dtype=jnp.float32)
    cfg = cfg.replace(width=24, height=24, spp=1, block_size=0, diff_vis=False)
    a = np.asarray(render_image(scene, cfg.replace(pallas="off")))
    b = np.asarray(render_image(scene, cfg.replace(pallas="on")))
    err = np.abs(a - b).max(-1)
    # polynomial atan2 inside the fractal march: small shifts everywhere,
    # occasional silhouette-pixel flip
    assert np.quantile(err, 0.95) < 5e-3 and err.max() < 1.0


@pytest.mark.slow  # ~50 s interpret-mode oracle; the on-chip parity gate
# (tools/parity_tpu.py packet_vs_brute) covers the compiled kernel every round
def test_packet_accel_matches_brute():
    """Packet-brute kernel (interpret mode) vs brute-force MT: the classic
    accelerator oracle, for the TPU-native chunk-culled structure."""
    from tpu_ray.accel.packet import build_packet_accel
    from tpu_ray.kernels.pallas_mt import any_hit_packet, intersect_packet
    from tpu_ray.kernels import moller_trumbore as mt
    from tpu_ray.scene.mesh import MeshScene, torus_knot

    v, f = torus_knot(2, 3, 24, 24)
    mesh = MeshScene.from_numpy(v, f, dtype=jnp.float32)
    accel = build_packet_accel(v, f)
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-3, 3, (500, 3)), jnp.float32)
    dd = rng.normal(size=(500, 3))
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True), jnp.float32)
    got = intersect_packet(accel, o, d, interpret=True)
    want = mt.intersect_brute(mesh, o, d)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    h = np.asarray(want.hit)
    np.testing.assert_allclose(np.asarray(got.t)[h], np.asarray(want.t)[h],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.tri)[h], np.asarray(want.tri)[h])
    ah = any_hit_packet(accel, o, d, t_max=4.0, interpret=True)
    bh = mt.any_hit_brute(mesh, o, d, t_max=4.0)
    np.testing.assert_array_equal(np.asarray(ah), np.asarray(bh))


@pytest.mark.slow
def test_bunny_render_packet_matches_grid():
    """Full-pipeline: packet-kernel render == DDA render on the bunny scene."""
    scene, cfg = build_scene("bunny", dtype=jnp.float32)
    cfg = cfg.replace(width=24, height=24, block_size=0)
    a = np.asarray(render_image(scene, cfg.replace(pallas="off")))
    b = np.asarray(render_image(scene, cfg.replace(pallas="on")))
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.slow
def test_packet_parts_split_matches_brute():
    """Meshes over the VMEM budget split into parts; the merged result must
    equal brute force (tested with an artificially tiny budget)."""
    from tpu_ray.accel.packet import build_packet_parts, packet_accel_bytes
    from tpu_ray.kernels.pallas_mt import intersect_packet_parts
    from tpu_ray.kernels import moller_trumbore as mt
    from tpu_ray.scene.mesh import MeshScene, torus_knot

    v, f = torus_knot(2, 3, 48, 48)  # 4608 tris = 2.25 supers
    mesh = MeshScene.from_numpy(v, f, dtype=jnp.float32)
    # budget of exactly one super (2048 tris) -> 3 parts (streamed=False
    # forces the legacy sequential-parts path; default is one streamed accel)
    parts = build_packet_parts(v, f, budget_bytes=packet_accel_bytes(2048),
                               streamed=False)
    assert len(parts) >= 2
    rng = np.random.default_rng(11)
    o = jnp.asarray(rng.uniform(-3, 3, (300, 3)), jnp.float32)
    dd = rng.normal(size=(300, 3))
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True), jnp.float32)
    got = intersect_packet_parts(parts, o, d, interpret=True)
    want = mt.intersect_brute(mesh, o, d)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    h = np.asarray(want.hit)
    np.testing.assert_allclose(np.asarray(got.t)[h], np.asarray(want.t)[h],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.tri)[h], np.asarray(want.tri)[h])
    ah = intersect_packet_parts(parts, o, d, t_max=4.0, any_hit=True,
                                interpret=True).hit
    bh = mt.any_hit_brute(mesh, o, d, t_max=4.0)
    np.testing.assert_array_equal(np.asarray(ah), np.asarray(bh))


@pytest.mark.slow
def test_packet_streamed_matches_brute():
    """HBM-streamed kernel (double-buffered corner DMA, per-tile candidate
    lists) vs brute-force MT — the oracle for the no-VMEM-cap path."""
    from tpu_ray.accel.packet import build_packet_accel
    from tpu_ray.kernels.pallas_mt import intersect_packet_streamed
    from tpu_ray.kernels import moller_trumbore as mt
    from tpu_ray.scene.mesh import MeshScene, torus_knot

    v, f = torus_knot(2, 3, 48, 48)  # 4608 tris = 3 supers: real stream loop
    mesh = MeshScene.from_numpy(v, f, dtype=jnp.float32)
    accel = build_packet_accel(v, f)
    rng = np.random.default_rng(13)
    o = jnp.asarray(rng.uniform(-3, 3, (700, 3)), jnp.float32)
    dd = rng.normal(size=(700, 3))
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True), jnp.float32)
    got = intersect_packet_streamed(accel, o, d, interpret=True)
    want = mt.intersect_brute(mesh, o, d)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    h = np.asarray(want.hit)
    np.testing.assert_allclose(np.asarray(got.t)[h], np.asarray(want.t)[h],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.tri)[h], np.asarray(want.tri)[h])
    # any-hit + t_init seeding (the shadow-ray configuration)
    seed = jnp.where(jnp.arange(700) % 3 == 0, 0.0, 4.0).astype(jnp.float32)
    ah = intersect_packet_streamed(accel, o, d, t_max=4.0, any_hit=True,
                                   t_init=seed, interpret=True).hit
    bh = np.asarray(mt.any_hit_brute(mesh, o, d, t_max=4.0))
    blocked = np.asarray(seed) == 0.0
    np.testing.assert_array_equal(np.asarray(ah)[~blocked], bh[~blocked])
    # t_init-seeded closest hit: only hits strictly closer than the seed
    tin = jnp.full((700,), 2.5, jnp.float32)
    got2 = intersect_packet_streamed(accel, o, d, t_init=tin, interpret=True)
    w_t = np.asarray(want.t)
    keep = np.asarray(want.hit) & (w_t < 2.5)
    np.testing.assert_array_equal(np.asarray(got2.hit), keep)
    np.testing.assert_allclose(np.asarray(got2.t)[keep], w_t[keep],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_render_mixed_pallas_on_matches_off():
    """Mixed scene with the packet kernel + SDF-hit t_init seeding (cross-
    method cull) vs the pure-XLA path: same image."""
    scene, cfg = build_scene("mixed", dtype=jnp.float32)
    cfg = cfg.replace(width=24, height=24, spp=1, block_size=0, max_steps=64)
    a = np.asarray(render_image(scene, cfg.replace(pallas="off")))
    b = np.asarray(render_image(scene, cfg.replace(pallas="on")))
    err = np.abs(a - b).max(-1)
    # fractal march rounding (see mandelbulb variant above) + f32 packet t
    assert np.quantile(err, 0.95) < 5e-3 and err.max() < 1.0


def test_knot1m_scene_streams():
    """The 1M-tri registry scene builds ONE whole-mesh packet accel over the
    VMEM budget — i.e. it renders through the streamed kernel. (The render
    itself is TPU-only: 1M tris is far too slow for interpret mode; on-chip
    coverage is tools/parity_tpu.py + the knot1m gallery render.)"""
    from tpu_ray.accel.packet import VMEM_BUDGET_BYTES, packet_accel_bytes
    from tpu_ray.scene.scenes import build_scene

    scene, cfg = build_scene("knot1m")
    assert scene.mesh.num_tris > 1_000_000
    assert scene.grid is None  # with_packet: no CSR grid for huge meshes
    assert len(scene.packet) == 1
    assert packet_accel_bytes(scene.packet[0].num_tris) > VMEM_BUDGET_BYTES


@pytest.mark.slow
def test_packet_streamed_autosplit(monkeypatch):
    """Oversize ray batches auto-split so the (nt, S) candidate array stays
    under the SMEM scalar-prefetch budget (an unblocked large frame over a
    mesh must not fail to compile). Forced tiny budget -> 2 sub-calls."""
    import tpu_ray.kernels.pallas_mt as pm
    from tpu_ray.accel.packet import build_packet_accel
    from tpu_ray.kernels import moller_trumbore as mt
    from tpu_ray.scene.mesh import MeshScene, torus_knot

    monkeypatch.setattr(pm, "_SMEM_CAND_BUDGET", 4)  # one tile per sub-call
    v, f = torus_knot(2, 3, 24, 24)
    mesh = MeshScene.from_numpy(v, f, dtype=jnp.float32)
    accel = build_packet_accel(v, f)
    rng = np.random.default_rng(17)
    o = jnp.asarray(rng.uniform(-3, 3, (1200, 3)), jnp.float32)
    dd = rng.normal(size=(1200, 3))
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True), jnp.float32)
    got = pm.intersect_packet_streamed(accel, o, d, interpret=True)
    want = mt.intersect_brute(mesh, o, d)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    h = np.asarray(want.hit)
    np.testing.assert_allclose(np.asarray(got.t)[h], np.asarray(want.t)[h],
                               rtol=1e-5, atol=1e-6)
