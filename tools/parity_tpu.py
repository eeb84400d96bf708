#!/usr/bin/env python
"""On-chip parity gate (VERDICT r1 weak #5 / item 6): run the CPU suite's
pallas==jnp assertions and small oracle goldens ON THE REAL TPU once per
round, writing PARITY_TPU_r{N}.json to the repo root.

The CPU test suite exercises every Pallas kernel in interpret mode only; a
Mosaic lowering bug would pass CI and ship straight into BENCH. This script
closes that gap: each check compares the Mosaic-compiled kernel against the
jnp reference (or the scalar CPU oracle) on identical inputs.

Usage (claims the chip; run ONE at a time):
    python tools/parity_tpu.py [round_number]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _rays(n, seed, origin, box_lo, box_hi, dtype):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    o = np.tile(origin, (n, 1))
    tgt = rng.uniform(box_lo, box_hi, (n, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, dtype), jnp.asarray(d, dtype)


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    from tpu_ray.kernels.pallas_sdf import march_pallas, shadow_pallas
    from tpu_ray.kernels.sphere_trace import march
    from tpu_ray.kernels.pallas_mt import intersect_packet
    from tpu_ray.kernels import moller_trumbore as mt
    from tpu_ray.render import shading
    from tpu_ray.render.render import render_image
    from tpu_ray.scene.scenes import build_scene
    from tpu_ray.sdf.primitives import sdf_distance
    from ref import cpu_renderer

    dev = str(jax.devices()[0])
    on_tpu = jax.default_backend() == "tpu"
    checks = {}

    def record(name, ok, detail):
        checks[name] = {"ok": bool(ok), **detail}
        print(f"[parity] {name}: {'OK' if ok else 'FAIL'} {detail}", flush=True)

    # --- march: Mosaic kernel vs jnp lockstep, per scene ---------------------
    for name in ("sphere", "mandelbulb", "mixed"):
        scene, cfg = build_scene(name)
        o, d = _rays(3000, 1, [0.0, 1.5, 3.5], [-1.5, 0.0, -1.5],
                     [1.6, 2.2, 1.6], jnp.float32)
        tj, hj, _, _ = march(sdf_distance, scene.sdf, o, d, t0=0.0,
                             max_steps=cfg.max_steps, eps=cfg.eps,
                             t_far=cfg.t_far)
        tp, hp, _, _ = march_pallas(scene.sdf, o, d, t0=0.0,
                                    max_steps=cfg.max_steps, eps=cfg.eps,
                                    t_far=cfg.t_far, interpret=not on_tpu)
        hj_, hp_ = np.asarray(hj), np.asarray(hp)
        agree = float((hj_ == hp_).mean())
        same = hj_ == hp_
        terr = np.abs(np.asarray(tp) - np.asarray(tj))[same & hj_]
        tq = float(np.quantile(terr, 0.99)) if terr.size else 0.0
        record(f"march_{name}", agree > 0.995 and tq < 5e-3,
               {"hit_agree": agree, "t_q99": tq})

    # --- shadow kernels (hard, soft, per-ray t_far) --------------------------
    scene, cfg = build_scene("mandelbulb")
    o, d = _rays(2000, 3, [0.0, 1.5, 3.5], [-1.2, 0.0, -1.2], [1.2, 2.2, 1.2],
                 jnp.float32)
    t, h, _, _ = march(sdf_distance, scene.sdf, o, d, t0=0.0,
                       max_steps=cfg.max_steps, eps=cfg.eps, t_far=cfg.t_far)
    p = o + t[:, None] * d
    lv = np.array([0.5, 0.75, 0.45]); lv /= np.linalg.norm(lv)
    l = jnp.broadcast_to(jnp.asarray(lv, jnp.float32), p.shape)
    tfr = jnp.full(p.shape[:1], 2.5, jnp.float32)
    for soft in (False, True):
        for use_tfr in (False, True):
            if soft:
                want, _ = shading.sdf_soft_shadow_argmin(
                    sdf_distance, scene.sdf, p, l, cfg,
                    t_far=tfr if use_tfr else None)
            else:
                want = shading.sdf_hard_shadow(
                    sdf_distance, scene.sdf, p, l, cfg,
                    t_far=tfr if use_tfr else None)
            got, _ = shadow_pallas(scene.sdf, p, l, soft=soft, eps=cfg.eps,
                                   t_far=cfg.t_far, steps=cfg.shadow_steps,
                                   bias=cfg.shadow_bias, soft_k=cfg.soft_k,
                                   t_far_rays=tfr if use_tfr else None,
                                   interpret=not on_tpu)
            err = np.abs(np.asarray(got) - np.asarray(want))
            q = float(np.quantile(err, 0.95))
            record(f"shadow_{'soft' if soft else 'hard'}_tfr{int(use_tfr)}",
                   q < 2e-3 and float(err.max()) < 0.5,
                   {"q95": q, "max": float(err.max())})

    # --- packet kernel vs brute (incl. t_init seeding) -----------------------
    from tpu_ray.scene.mesh import MeshScene, torus_knot
    from tpu_ray.accel.packet import build_packet_accel

    v, f = torus_knot(2, 3, 24, 24)
    mesh = MeshScene.from_numpy(v, f, dtype=jnp.float32)
    accel = build_packet_accel(v, f)
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-3, 3, (2000, 3)), jnp.float32)
    dd = rng.normal(size=(2000, 3))
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True), jnp.float32)
    got = intersect_packet(accel, o, d, interpret=not on_tpu)
    want = mt.intersect_brute(mesh, o, d)
    hit_eq = bool((np.asarray(got.hit) == np.asarray(want.hit)).all())
    h_ = np.asarray(want.hit)
    terr = np.abs(np.asarray(got.t)[h_] - np.asarray(want.t)[h_])
    record("packet_vs_brute", hit_eq and float(terr.max()) < 1e-3,
           {"hit_equal": hit_eq, "t_max_err": float(terr.max())})
    # seed slightly ABOVE each true hit: the seeded run must re-find exactly
    # the same hits (t < seed) and nothing for misses (seed culls all work)
    seed = jnp.where(got.hit, got.t + 0.5, jnp.zeros_like(got.t))
    got2 = intersect_packet(accel, o, d, t_init=seed, interpret=not on_tpu)
    h2 = np.asarray(got2.hit)
    ok_seed = (bool((h2 == np.asarray(got.hit)).all())
               and bool(np.allclose(np.asarray(got2.t)[h2],
                                    np.asarray(got.t)[h2], atol=1e-5)))
    record("packet_t_init_seed", ok_seed and int(h2.sum()) > 0,
           {"seeded_hits": int(h2.sum())})

    # --- streamed kernel (HBM-resident accel, double-buffered DMA) -----------
    from tpu_ray.kernels.pallas_mt import intersect_packet_streamed

    v, f = torus_knot(2, 3, 48, 48)  # 4608 tris = 3 supers: real stream loop
    mesh = MeshScene.from_numpy(v, f, dtype=jnp.float32)
    accel = build_packet_accel(v, f)
    o = jnp.asarray(rng.uniform(-3, 3, (2000, 3)), jnp.float32)
    dd = rng.normal(size=(2000, 3))
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True), jnp.float32)
    got = intersect_packet_streamed(accel, o, d, interpret=not on_tpu)
    want = mt.intersect_brute(mesh, o, d)
    hit_eq = bool((np.asarray(got.hit) == np.asarray(want.hit)).all())
    h_ = np.asarray(want.hit)
    terr = np.abs(np.asarray(got.t)[h_] - np.asarray(want.t)[h_])
    record("packet_streamed_vs_brute", hit_eq and float(terr.max()) < 1e-3,
           {"hit_equal": hit_eq, "t_max_err": float(terr.max())})
    # streamed ANY-HIT (shadow-ray path; VERDICT r2 item 3): blocked set must
    # equal brute's, and 0-seeded rays (already-decided shadows) stay culled
    got_ah = intersect_packet_streamed(accel, o, d, any_hit=True,
                                       interpret=not on_tpu)
    ah_eq = bool((np.asarray(got_ah.hit) == np.asarray(want.hit)).all())
    seed0 = jnp.where(want.hit, 0.0, jnp.full_like(got.t, mt.BIG))
    got_ah2 = intersect_packet_streamed(accel, o, d, any_hit=True,
                                        t_init=seed0, interpret=not on_tpu)
    # seeded: previously-blocked rays keep reporting blocked via the caller's
    # fold; here just require no NEW hits appear among true misses
    new_false = bool((np.asarray(got_ah2.hit) & ~np.asarray(want.hit)).any())
    record("packet_streamed_any_hit", ah_eq and not new_false,
           {"hit_equal": ah_eq, "false_new_hits": new_false})

    # --- fused Pallas backward vs XLA autodiff, on chip -----------------------
    # (VERDICT r2 item 3: shade_bwd cotangents were interpret-mode-only; a
    # Mosaic lowering bug in the backward would ship into BENCH unseen)
    import tpu_ray.render.render as rr
    from tpu_ray.fit import apply_params, extract_params
    from tpu_ray.kernels import pallas_shade
    from tpu_ray.render.camera import generate_rays

    def shade_grad_check(tag, scene, cfg, groups, width=24, rel_tol=1e-3,
                         **overrides):
        cfg = cfg.replace(width=width, height=width, spp=1, block_size=0,
                          diff_vis=False, pallas="on")
        if overrides:
            cfg = cfg.replace(**overrides)
        method = rr.resolve_method(scene, cfg)
        if not pallas_shade.applicable(scene, cfg, method, jnp.float32):
            record(f"shade_bwd_{tag}", False, {"applicable": False})
            return
        sx, sy = rr.pixel_sample_coords(cfg, jnp.float32)
        o, d = generate_rays(scene.camera, sx.ravel(), sy.ravel(),
                             width, width)
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
        worst = ("", 0.0)
        for k in gk:
            a, b = np.asarray(gk[k]), np.asarray(gx[k])
            rel = float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))
            if rel > worst[1]:
                worst = (k, rel)
        record(f"shade_bwd_{tag}", worst[1] < rel_tol,
               {"worst_group": worst[0], "worst_rel": worst[1]})

    def shade_fwd_check(tag, scene, cfg, width=32, tol=1e-4):
        """Round 4: the fused Pallas FORWARD shade vs the XLA chain on chip."""
        cfg = cfg.replace(width=width, height=width, spp=1, block_size=0,
                          diff_vis=False, pallas="on")
        method = rr.resolve_method(scene, cfg)
        if not pallas_shade.applicable(scene, cfg, method, jnp.float32):
            record(f"shade_fwd_{tag}", False, {"applicable": False})
            return
        sx, sy = rr.pixel_sample_coords(cfg, jnp.float32)
        o, d = generate_rays(scene.camera, sx.ravel(), sy.ravel(),
                             width, width)
        res = rr.geometry_residuals(scene, cfg, o, d, method)
        a = np.asarray(jax.jit(
            lambda: pallas_shade.apply_fwd_kernel(scene, cfg, o, d, res,
                                                  method))())
        b = np.asarray(jax.jit(
            lambda: rr._shade_xla(scene, cfg, o, d, res, method))())
        mx = float(np.abs(a - b).max())
        record(f"shade_fwd_{tag}", mx < tol, {"max_abs": mx})

    groups_base = ["materials.albedo", "lights.color", "lights.direction",
                   "lights.ambient", "camera.origin", "camera.look_at"]
    s1, c1 = build_scene("sphere")
    shade_grad_check("sphere", s1, c1,
                     groups_base + ["sdf.sph_radius", "sdf.sph_center"])
    s2, c2 = build_scene("triangles")
    shade_grad_check("mesh", s2, c2, groups_base + ["mesh.verts"])
    s3, c3 = build_scene("triangles")
    s3 = s3.replace(sdf=s3.sdf.replace(
        sph_center=jnp.asarray([[0.4, 0.8, 0.3]], jnp.float32),
        sph_radius=jnp.asarray([0.62], jnp.float32),
        sph_mat=jnp.asarray([1], jnp.int32)))
    shade_grad_check("mixed", s3, c3.replace(method="mixed"),
                     groups_base + ["mesh.verts", "sdf.sph_radius",
                                    "sdf.sph_center"])
    s4, c4 = build_scene("pointlight")
    shade_grad_check("pointlight", s4, c4,
                     groups_base + ["lights.position", "lights.pos_color",
                                    "sdf.sph_radius", "sdf.box_center"])
    s5, c5 = build_scene("mixed")  # the HEADLINE scene's exact chain (70k tris)
    shade_grad_check("mixed_headline", s5, c5,
                     groups_base + ["mesh.verts", "sdf.mb_scale"],
                     width=32, rel_tol=5e-2)
    # round 5 (VERDICT r4 item 2): the differentiable-visibility chains on
    # chip — diff_vis soft-shadow penumbra, SDF sigmoid silhouettes, mesh
    # edge-band silhouettes, and the README fit invocation's combined chain
    shade_grad_check("softvis", s1, c1,
                     groups_base + ["sdf.sph_radius", "sdf.sph_center"],
                     shadow="soft", diff_vis=True)
    shade_grad_check("silhouette", s1, c1,
                     groups_base + ["sdf.sph_radius", "sdf.sph_center"],
                     soft_silhouette=0.05)
    shade_grad_check("mesh_silhouette", s2, c2,
                     groups_base + ["mesh.verts"], mesh_silhouette=0.06)
    shade_grad_check("fit_chain", s3, c3.replace(method="mixed"),
                     groups_base + ["mesh.verts", "sdf.sph_radius",
                                    "sdf.sph_center"],
                     shadow="soft", diff_vis=True, soft_silhouette=0.05,
                     mesh_silhouette=0.06, ao="sdf5")
    shade_grad_check("softvis_pointlight", s4, c4,
                     groups_base + ["lights.position", "lights.pos_color",
                                    "sdf.sph_radius"],
                     shadow="soft", diff_vis=True)

    shade_fwd_check("sphere", s1, c1)
    shade_fwd_check("mesh", s2, c2)
    shade_fwd_check("pointlight", s4, c4)
    # the fractal chain reassociates through 14 unrolled iterations in f32
    shade_fwd_check("mixed_headline", s5, c5, tol=5e-3)

    # --- small frame goldens vs the scalar CPU oracle ------------------------
    for name in ("sphere", "pointlight", "mandelbulb", "mixed"):
        scene, cfg = build_scene(name)
        cfg = cfg.replace(width=24, height=24, spp=1, block_size=0)
        img = np.asarray(render_image(scene, cfg))
        ref_img = cpu_renderer.render_image(scene, cfg)
        err = np.abs(img - ref_img).max(-1)
        q = float(np.quantile(err, 0.95))
        mx = float(err.max())
        # f32 chip vs f64 oracle: quantile gate; fractal silhouette pixels may
        # flip (documented in the CPU golden tests)
        record(f"golden_{name}", q < 5e-3 and mx < 1.0, {"q95": q, "max": mx})

    out = {
        "round": rnd,
        "device": dev,
        "backend": jax.default_backend(),
        "elapsed_s": round(time.time() - t0, 1),
        "all_ok": all(c["ok"] for c in checks.values()),
        "checks": checks,
    }
    path = os.path.join(REPO, f"PARITY_TPU_r{rnd:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"[parity] wrote {path} all_ok={out['all_ok']}")
    return 0 if out["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
