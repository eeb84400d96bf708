"""Differentiable pinhole camera.

TPU-native equivalent of the reference camera + per-pixel primary-ray
generation inside the tile kernel (SURVEY.md §2 #5, §3.2). The camera pose
(origin, look_at, up) and field of view are leaves of a pytree, so
`jax.grad` flows through ray generation — gradients w.r.t. camera pose are an
acceptance criterion (BASELINE.json north_star).

Conventions:
  * image row 0 is the TOP of the image;
  * pixel (x, y) sample positions are (x + sx, y + sy) with subpixel offsets
    sx, sy in [0, 1) supplied by the AA sampler (0.5 = pixel center);
  * right-handed basis: forward = look_at - origin, right = forward x up.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from tpu_ray.core.math3d import cross, normalize


@struct.dataclass
class Camera:
    origin: jnp.ndarray  # (3,)
    look_at: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    vfov_deg: jnp.ndarray  # () vertical field of view in degrees

    @staticmethod
    def make(origin, look_at, up=(0.0, 1.0, 0.0), vfov_deg=45.0, dtype=jnp.float32):
        return Camera(
            origin=jnp.asarray(origin, dtype),
            look_at=jnp.asarray(look_at, dtype),
            up=jnp.asarray(up, dtype),
            vfov_deg=jnp.asarray(vfov_deg, dtype),
        )

    def basis(self):
        fwd = normalize(self.look_at - self.origin)
        right = normalize(cross(fwd, self.up))
        up = cross(right, fwd)
        return fwd, right, up


def generate_rays(cam: Camera, xs: jnp.ndarray, ys: jnp.ndarray, width: int, height: int):
    """Primary rays for sample positions (xs, ys) in pixel coordinates.

    xs, ys: any matching shape (...,). Returns (origins (..., 3), dirs (..., 3))
    with dirs normalized. Aspect ratio is width/height; vfov is vertical.
    """
    fwd, right, up = cam.basis()
    half_h = jnp.tan(jnp.deg2rad(cam.vfov_deg) * 0.5)
    aspect = width / height
    # NDC in [-1, 1], y up (row 0 at image top).
    px = (2.0 * xs / width - 1.0) * half_h * aspect
    py = (1.0 - 2.0 * ys / height) * half_h
    d = fwd + px[..., None] * right + py[..., None] * up
    d = normalize(d)
    o = jnp.broadcast_to(cam.origin, d.shape)
    return o, d
