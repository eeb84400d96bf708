"""Mandelbulb distance estimator.

TPU-native equivalent of the reference's fractal DE (SURVEY.md §2 #9,
BASELINE config 4). The classic formulation: iterate z <- z^power + p in
spherical coordinates, track the running derivative dr, and estimate distance
as 0.5 * log(r) * r / dr.

TPU-first details:
  * fixed iteration count via `lax.fori_loop` with a live-mask instead of the
    reference's early `break` — all VPU lanes run the same trip count and
    escaped lanes are frozen by `where` (SURVEY.md §3.3);
  * fully batched over both query points and bulb instances: p is (..., 3);
  * differentiable w.r.t. p and power; r is clamped away from 0 so the
    spherical-coordinate derivatives stay finite at the interior fixed point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BAILOUT = 4.0
_RMIN = 1e-6


def mandelbulb_de(p: jnp.ndarray, power: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Distance estimate to the Mandelbulb set.

    p: (..., 3) query points in the bulb's local frame (canonical bulb fits in
    radius ~1.2). power: scalar or broadcastable to p.shape[:-1]. Returns (...,).
    """
    power = jnp.broadcast_to(jnp.asarray(power, p.dtype), p.shape[:-1])

    def body(_, carry):
        z, dr, r, live = carry
        r_new = jnp.sqrt(jnp.maximum(jnp.sum(z * z, axis=-1), _RMIN * _RMIN))
        # record |z| for every lane still live at loop entry — including the
        # escaping iteration (classic formulation: `r = |z|; if r > bailout break`)
        r = jnp.where(live, r_new, r)
        live_new = live & (r_new <= _BAILOUT)
        # cap at the bailout: live lanes always satisfy r <= bailout, and
        # without the cap dead lanes compute r^(power) -> inf in f32, whose
        # NaN leaks through jnp.where in the BACKWARD pass (inf * 0 cotangent)
        r_safe = jnp.clip(r_new, _RMIN, _BAILOUT)
        # polar angle via atan2(hypot(x,y), z): same value as acos(z/r) but
        # with a finite gradient at the poles (acos' blows up at |z/r|=1)
        rho = jnp.sqrt(jnp.maximum(z[..., 0] ** 2 + z[..., 1] ** 2, _RMIN * _RMIN))
        theta = jnp.arctan2(rho, z[..., 2])
        phi = jnp.arctan2(z[..., 1], z[..., 0])
        r_pm1 = jnp.power(r_safe, power - 1.0)
        dr_new = r_pm1 * power * dr + 1.0
        zr = r_pm1 * r_safe  # r^power
        th = theta * power
        ph = phi * power
        sin_th = jnp.sin(th)
        z_next = zr[..., None] * jnp.stack(
            [sin_th * jnp.cos(ph), jnp.sin(ph) * sin_th, jnp.cos(th)], axis=-1
        ) + p
        # freeze escaped lanes (mask replaces the reference's `break`)
        z_out = jnp.where(live_new[..., None], z_next, z)
        dr_out = jnp.where(live_new, dr_new, dr)
        return z_out, dr_out, r, live_new

    z0 = p
    dr0 = jnp.ones(p.shape[:-1], p.dtype)
    r0 = jnp.sqrt(jnp.maximum(jnp.sum(p * p, axis=-1), _RMIN * _RMIN))
    live0 = jnp.ones(p.shape[:-1], bool)
    z, dr, r, _ = jax.lax.fori_loop(0, iters, body, (z0, dr0, r0, live0))
    r = jnp.maximum(r, _RMIN)
    return 0.5 * jnp.log(r) * r / dr
