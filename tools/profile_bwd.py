"""Attribute the headline backward increment (fwd+bwd minus fwd).

VERDICT r4 item 1: the mixed 1080p x 16 spp backward costs ~0.84 s over the
2.80 s forward; nothing in-repo says where it goes. This tool breaks it down:

  1. full fwd (baseline)
  2. jax.grad with trainable subsets — dropping mesh.verts removes the
     per-block corner-gather transpose (scatter-add by triangle) and the
     per-frame triangle->vertex conversion; albedo-only keeps just the
     fused bwd kernel + raygen VJP
  3. the isolated shade_bwd_pallas kernel on one real 32k-ray frame block
     (realistic mixed content), amortized

    python tools/profile_bwd.py [scene]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import tpu_ray.render.render as rr
from tpu_ray.fit import apply_params, extract_params, get_param
from tpu_ray.render.camera import generate_rays
from tpu_ray.scene.scenes import build_scene
from tpu_ray.utils.metrics import block_and_time, rays_per_frame


def _has(scene, path):
    try:
        v = get_param(scene, path)
        return hasattr(v, "size") and v.size > 0
    except AttributeError:
        return False


def main(scene_name: str = "mixed"):
    scene, cfg = build_scene(scene_name)
    rays = rays_per_frame(cfg, scene)
    cfg_b = cfg.replace(diff_vis=False)
    if cfg_b.block_size:
        cfg_b = cfg_b.replace(block_size=min(cfg_b.block_size, 1 << 16))

    fwd = jax.jit(lambda s: rr.render_image(s, cfg))
    _, fwd_s = block_and_time(fwd, scene, warmup=1, iters=2)
    print(f"full fwd                     {fwd_s:8.3f}s  "
          f"({rays / fwd_s / 1e6:6.2f} Mrays/s)")

    groups = {
        "all": ["sdf.sph_radius", "sdf.mb_scale", "camera.origin",
                "materials.albedo", "lights.color", "mesh.verts"],
        "no-verts": ["sdf.sph_radius", "sdf.mb_scale", "camera.origin",
                     "materials.albedo", "lights.color"],
        "verts-only": ["mesh.verts"],
        "albedo-only": ["materials.albedo"],
    }
    only = [a for a in sys.argv[2:]]
    for tag, paths in groups.items():
        if only and tag not in only:
            continue
        paths = [p for p in paths if _has(scene, p)]
        if not paths:
            continue
        params = extract_params(scene, paths)

        def loss(pp):
            return jnp.mean(rr.render_image(apply_params(scene, pp),
                                            cfg_b) ** 2)

        g = jax.jit(jax.grad(loss))
        _, sec = block_and_time(g, params, warmup=1, iters=3)
        print(f"fwd+bwd [{tag:<12}]        {sec:8.3f}s  (+{sec - fwd_s:6.3f}s"
              f" over fwd, {rays / sec / 1e6:6.2f} Mrays/s)")

    # --- isolated per-block pieces on one real frame block -----------------
    method = rr.resolve_method(scene, cfg)
    bs = cfg_b.block_size or (1 << 16)
    sx, sy = rr.pixel_sample_coords(cfg)
    fx, fy = sx.ravel()[:bs], sy.ravel()[:bs]
    o, d = generate_rays(scene.camera, fx, fy, cfg.width, cfg.height)
    rows = rr.mesh_table(scene.mesh) if scene.has_mesh else None
    res = rr.geometry_residuals(scene, cfg_b, o, d, method, mesh_rows=rows)
    res = jax.tree_util.tree_map(jax.block_until_ready, res)
    n_blocks = -(-rays // bs)

    paths = [p for p in groups["all"] if _has(scene, p)]

    def shade_loss(pp, rows_in):
        return jnp.mean(rr.shade_with_residuals(
            apply_params(scene, pp), cfg_b, o, d, res, method,
            mesh_rows=rows_in) ** 2)

    prm = extract_params(scene, paths)
    g2 = jax.jit(jax.grad(shade_loss, argnums=(0, 1) if rows is not None
                          else 0))
    _, blk = block_and_time(g2, prm, rows, warmup=1, iters=5)
    print(f"one-block shade fwd+bwd      {blk * 1e3:8.2f} ms x {n_blocks} "
          f"blocks = {blk * n_blocks:6.3f}s")

    f2 = jax.jit(lambda s, r: jnp.mean(rr.shade_with_residuals(
        s, cfg_b, o, d, res, method, mesh_rows=r) ** 2))
    _, blkf = block_and_time(f2, scene, rows, warmup=1, iters=5)
    print(f"one-block shade fwd          {blkf * 1e3:8.2f} ms x {n_blocks} "
          f"blocks = {blkf * n_blocks:6.3f}s  (bwd increment "
          f"{(blk - blkf) * 1e3:.2f} ms/block)")

    # geometry pass alone per block
    f3 = jax.jit(lambda s: sum(
        jnp.sum(v) for v in rr.geometry_residuals(
            s, cfg_b, o, d, method,
            mesh_rows=rows).values()))
    _, blkg = block_and_time(f3, scene, warmup=1, iters=5)
    print(f"one-block geometry           {blkg * 1e3:8.2f} ms x {n_blocks} "
          f"blocks = {blkg * n_blocks:6.3f}s")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "mixed")
