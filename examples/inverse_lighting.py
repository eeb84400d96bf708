"""Inverse-lighting demo: recover a point light's position from one image.

Run from the repo root (TPU or CPU):

    python examples/inverse_lighting.py [outdir]

Renders a target image of the point-light scene, displaces the light, then
optimizes the light position (and intensity) back by image MSE. Gradients
flow through the inverse-square falloff, the N·L term, and the
differentiable soft-shadow penumbra (the argmin-residual recompute in
tpu_ray/render/render.py — diff_vis=True). Writes target / initial / fitted PNGs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from tpu_ray.fit import apply_params, fit
from tpu_ray.render.render import render_image_jit
from tpu_ray.scene.scenes import build_scene
from tpu_ray.utils.config import FitConfig
from tpu_ray.utils.image_io import write_png


def main(outdir: str = "."):
    os.makedirs(outdir, exist_ok=True)
    scene, cfg = build_scene("pointlight")
    cfg = cfg.replace(width=256, height=256, diff_vis=True)

    target = render_image_jit(scene, cfg)
    write_png(f"{outdir}/light_target.png", np.asarray(target))

    init = apply_params(scene, {
        "lights.position": jnp.asarray([[-1.0, 2.0, 2.2]], jnp.float32),
        "lights.pos_color": jnp.asarray([[4.0, 4.0, 4.0]], jnp.float32),
    })
    write_png(f"{outdir}/light_init.png", np.asarray(render_image_jit(init, cfg)))

    fitted, history = fit(
        init, cfg, target, ["lights.position", "lights.pos_color"],
        FitConfig(steps=150, learning_rate=3e-2))
    write_png(f"{outdir}/light_fitted.png",
              np.asarray(render_image_jit(fitted, cfg)))

    true_pos = np.asarray(scene.lights.position[0])
    got_pos = np.asarray(fitted.lights.position[0])
    print(f"true light position   {true_pos}")
    print(f"fitted light position {got_pos}")
    print(f"position error        {np.linalg.norm(true_pos - got_pos):.4f}")
    print(f"loss {history[0]:.3e} -> {history[-1]:.3e}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
