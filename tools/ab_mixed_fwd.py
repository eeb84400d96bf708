#!/usr/bin/env python
"""On-chip A/B of TPU_RAY_MT_TILE_ROWS on the FULL mixed 1080p x 16spp
forward (and optionally fwd+bwd): the end-to-end check for tile-height
changes (the raw-kernel A/B uses coherent scanline rays; the render's 8x8
pixel blocks have wider tile frusta at taller tiles).

    python tools/ab_mixed_fwd.py <rows> [bwd]
"""

import os
import sys

rows = sys.argv[1] if len(sys.argv) > 1 else "8"
os.environ["TPU_RAY_MT_TILE_ROWS"] = rows

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_ray.render import render as R  # noqa: E402
from tpu_ray.scene.scenes import build_scene  # noqa: E402
from tpu_ray.utils.metrics import block_and_time, rays_per_frame  # noqa: E402


def main():
    scene, cfg = build_scene("mixed")
    rays = rays_per_frame(cfg, scene)
    print(f"[ab-mixed] rows={rows} device={jax.devices()[0]}", flush=True)
    fwd = jax.jit(lambda s: R.render_image(s, cfg))
    _, sec = block_and_time(fwd, scene, warmup=1, iters=2)
    print(f"[ab-mixed] rows={rows} fwd: {sec:.3f}s = "
          f"{rays/sec/1e6:.2f} Mrays/s", flush=True)
    if len(sys.argv) > 2 and sys.argv[2] == "bwd":
        from tpu_ray.fit import apply_params, extract_params

        params = extract_params(scene, ["sdf.mb_scale", "camera.origin",
                                        "materials.albedo", "mesh.verts"])
        cfg_b = cfg.replace(diff_vis=False)

        def loss(pp):
            return jnp.mean(R.render_image(apply_params(scene, pp), cfg_b) ** 2)

        bwd = jax.jit(jax.grad(loss))
        _, sec_b = block_and_time(bwd, params, warmup=1, iters=1)
        print(f"[ab-mixed] rows={rows} fwd+bwd: {sec_b:.3f}s = "
              f"{rays/sec_b/1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
