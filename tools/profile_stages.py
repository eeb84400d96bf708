"""Per-stage wall-clock breakdown of a render config on the current backend.

Times CUMULATIVE pipelines (march -> +mesh -> +shadows -> full shade -> +bwd)
with the exact blocked structure render_image uses, so the differences
attribute cost to each stage. Used to direct perf work (VERDICT r2 items
1/4; round-4 optimization planning).

    python tools/profile_stages.py mixed
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_ray.render import render as R
from tpu_ray.render.camera import generate_rays
from tpu_ray.scene.scenes import build_scene
from tpu_ray.utils.metrics import block_and_time, rays_per_frame


def main(scene_name: str = "mixed"):
    scene, cfg = build_scene(scene_name)
    method = R.resolve_method(scene, cfg)
    sx, sy = R.pixel_sample_coords(cfg)
    fx, fy = sx.ravel(), sy.ravel()
    perm = R._block_order_perm(cfg)
    if perm is not None:
        fx = fx.reshape(-1, cfg.spp)[perm].ravel()
        fy = fy.reshape(-1, cfg.spp)[perm].ravel()
    bs = cfg.block_size or fx.shape[0]
    bs = -(-bs // cfg.spp) * cfg.spp
    pad = (-fx.shape[0]) % bs
    if pad:
        fx = jnp.concatenate([fx, jnp.broadcast_to(fx[-1:], (pad,))])
        fy = jnp.concatenate([fy, jnp.broadcast_to(fy[-1:], (pad,))])
    xb, yb = fx.reshape(-1, bs), fy.reshape(-1, bs)
    rays = rays_per_frame(cfg, scene)

    def blocked(stage_fn):
        def run(s):
            def blk(xy):
                o, d = generate_rays(s.camera, xy[0], xy[1], cfg.width,
                                     cfg.height)
                return stage_fn(s, o, d)
            return jax.lax.map(blk, (xb, yb)).sum()
        return jax.jit(run)

    def s_march(s, o, d):
        if not R._use_sdf(s, method):
            return jnp.zeros(())
        t, hit, tmin = R._march_forward(s, cfg, o, d)
        return t.sum() + tmin.sum()

    def s_mesh(s, o, d):
        acc = jnp.zeros(())
        t_seed = None
        if R._use_sdf(s, method):
            t, hit, tmin = R._march_forward(s, cfg, o, d)
            acc = t.sum() + tmin.sum()
            if method == "mixed":
                t_seed = jnp.where(hit, t, jnp.full_like(t, cfg.t_far))
        if R._use_mesh(s, method):
            tri, mhit = R._mesh_intersect(s, cfg, o, d, method, t_init=t_seed)
            acc = acc + tri.sum() + mhit.sum()
        return acc

    def s_geo(s, o, d):
        res = R.geometry_residuals(s, cfg, o, d, method)
        return sum(jnp.sum(v) for v in res.values())

    stages = [("march", s_march), ("march+mesh", s_mesh),
              ("geometry(all)", s_geo)]

    prev = 0.0
    report = []
    for name, fn in stages:
        _, sec = block_and_time(blocked(fn), scene, warmup=1, iters=2)
        report.append((name, sec, sec - prev))
        prev = sec

    fwd = jax.jit(lambda s: R.render_image(s, cfg))
    _, sec = block_and_time(fwd, scene, warmup=1, iters=2)
    report.append(("full fwd", sec, sec - prev))

    from tpu_ray.fit import apply_params, extract_params
    trainable = [p for p in ("sdf.sph_radius", "sdf.mb_scale", "camera.origin",
                             "materials.albedo", "lights.color", "mesh.verts")
                 if _has(scene, p)]
    params = extract_params(scene, trainable)
    cfg_b = cfg.replace(diff_vis=False)
    if cfg_b.block_size:
        cfg_b = cfg_b.replace(block_size=min(cfg_b.block_size, 1 << 16))

    def loss(pp):
        return jnp.mean(R.render_image(apply_params(scene, pp), cfg_b) ** 2)

    bwd = jax.jit(jax.grad(loss))
    _, sec_b = block_and_time(bwd, params, warmup=1, iters=1)
    report.append(("fwd+bwd", sec_b, sec_b - sec))

    print(f"\n== {scene_name} ({cfg.width}x{cfg.height} spp{cfg.spp}, "
          f"{rays/1e6:.1f} Mrays, method={method}) ==")
    for name, total, delta in report:
        print(f"  {name:<16} {total:8.3f}s  (+{delta:8.3f}s)  "
              f"{rays/total/1e6:6.2f} Mrays/s cumulative")


def _has(scene, path):
    try:
        from tpu_ray.fit import get_param
        v = get_param(scene, path)
        return hasattr(v, "size") and v.size > 0
    except AttributeError:
        return False


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "mixed")
