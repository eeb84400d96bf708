"""Split the shadow-stage cost of a config: SDF shadow march vs mesh any-hit.

Ablates each sub-stage by monkeypatching it to a constant (XLA then DCEs the
kernel), so `full - ablated` attributes its cost.

    python tools/profile_shadow.py mixed
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_ray.render import render as R
from tpu_ray.scene.scenes import build_scene
from tpu_ray.utils.metrics import block_and_time, rays_per_frame


def time_fwd(scene, cfg):
    fwd = jax.jit(lambda s: R.render_image(s, cfg))
    _, sec = block_and_time(fwd, scene, warmup=1, iters=2)
    return sec


def main(scene_name: str = "mixed"):
    scene, cfg = build_scene(scene_name)
    rays = rays_per_frame(cfg, scene)

    base = time_fwd(scene, cfg)
    print(f"full fwd          {base:7.3f}s   {rays/base/1e6:6.2f} Mrays/s")

    # ablate the mesh any-hit (shadow occlusion by the mesh)
    orig_any = R._mesh_any_hit_generic
    R._mesh_any_hit_generic = (
        lambda scene, cfg_, p, d, t_max, sort, method, t_init=None:
        jnp.zeros(p.shape[:-1], bool))
    try:
        no_mesh_sh = time_fwd(scene, cfg)
    finally:
        R._mesh_any_hit_generic = orig_any
    print(f"- mesh any-hit    {no_mesh_sh:7.3f}s   (any-hit cost "
          f"{base - no_mesh_sh:6.3f}s)")

    # ablate the SDF shadow march
    import tpu_ray.kernels.pallas_sdf as ps
    orig_sh = ps.shadow_pallas

    def fake_shadow(sdf, p, l_dir, **kw):
        ones = jnp.ones(p.shape[:-1], p.dtype)
        return ones, ones * 0.0
    ps.shadow_pallas = fake_shadow
    try:
        no_sdf_sh = time_fwd(scene, cfg)
    finally:
        ps.shadow_pallas = orig_sh
    print(f"- sdf shadow      {no_sdf_sh:7.3f}s   (sdf shadow cost "
          f"{base - no_sdf_sh:6.3f}s)")

    # ablate both (leaves march + mesh closest-hit + reconstruct + shade)
    R._mesh_any_hit_generic = (
        lambda scene, cfg_, p, d, t_max, sort, method, t_init=None:
        jnp.zeros(p.shape[:-1], bool))
    ps.shadow_pallas = fake_shadow
    try:
        no_shadow = time_fwd(scene, cfg)
    finally:
        R._mesh_any_hit_generic = orig_any
        ps.shadow_pallas = orig_sh
    print(f"- both            {no_shadow:7.3f}s   (shadow stage total "
          f"{base - no_shadow:6.3f}s)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "mixed")
