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


def mandelbulb_de_pow8_components(px, py, pz, iters: int = 12,
                                  unroll: bool = False):
    """Trig-free power-8 Mandelbulb DE on same-shape component arrays.

    For the default integer power 8, z -> z^8 in spherical coordinates needs
    no transcendentals at all: sin/cos of theta and phi come from Cartesian
    ratios (one rsqrt-style normalize each) and the *8 angle multiplication is
    three double-angle steps (s,c) -> (2sc, c^2-s^2); r^8 and r^7 are plain
    multiplies. This removes the 2x atan2, 3x sin, 2x cos and the pow that the
    generic formulation burns per iteration (the march was transcendental-
    bound on TPU — see BASELINE.md round-2 milestones).

    Component-array form (px, py, pz all the same shape) so the SAME function
    serves both the batched jnp path and the Pallas (8,128) tile kernels —
    Mosaic-safe: no stack/concat, f32 mask carries, all carries derived from
    the inputs. Escape/freeze semantics mirror `mandelbulb_de` exactly.
    """
    r0 = jnp.sqrt(jnp.maximum(px * px + py * py + pz * pz, _RMIN * _RMIN))
    one = px * 0.0 + 1.0  # tiled-layout-safe constant (Mosaic carry rule)

    def body(_, carry):
        zx, zy, zz, dr, r, live = carry
        r_new = jnp.sqrt(jnp.maximum(zx * zx + zy * zy + zz * zz, _RMIN * _RMIN))
        live_b = live > 0.5
        r = jnp.where(live_b, r_new, r)
        live = live * (r_new <= _BAILOUT).astype(live.dtype)
        live_nb = live > 0.5
        # r_new >= _RMIN by construction and live lanes satisfy r_new <= bailout,
        # so the clip only rescues DEAD lanes from overflowing r^7 (f32 inf
        # leaks NaN through jnp.where in backward — same guard as the generic)
        r_safe = jnp.clip(r_new, _RMIN, _BAILOUT)
        rho2 = jnp.maximum(zx * zx + zy * zy, _RMIN * _RMIN)
        rho = jnp.sqrt(rho2)
        h = jnp.sqrt(rho2 + zz * zz)
        inv_h = 1.0 / h
        st, ct = rho * inv_h, zz * inv_h  # theta = atan2(rho, z)
        inv_rho = 1.0 / rho
        sp, cp = zy * inv_rho, zx * inv_rho  # phi = atan2(y, x)
        for _ in range(3):  # angle*8 = three double-angle steps
            st, ct = 2.0 * st * ct, ct * ct - st * st
            sp, cp = 2.0 * sp * cp, cp * cp - sp * sp
        r2s = r_safe * r_safe
        r4 = r2s * r2s
        r7 = r4 * r2s * r_safe
        r8 = r4 * r4
        dr_new = 8.0 * r7 * dr + 1.0
        nzx = r8 * st * cp + px
        nzy = r8 * st * sp + py
        nzz = r8 * ct + pz
        zx = jnp.where(live_nb, nzx, zx)
        zy = jnp.where(live_nb, nzy, zy)
        zz = jnp.where(live_nb, nzz, zz)
        dr = jnp.where(live_nb, dr_new, dr)
        return zx, zy, zz, dr, r, live

    carry = (px, py, pz, one, r0, one)
    if unroll:
        # static Python unroll: autodiff of this form is a flat elementwise
        # chain — required INSIDE Pallas kernels that differentiate the DE
        # (Mosaic cannot lower the scan a fori_loop VJP produces); identical
        # math to the loop below
        for _ in range(iters):
            carry = body(0, carry)
        _, _, _, dr, r, _ = carry
    else:
        _, _, _, dr, r, _ = jax.lax.fori_loop(0, iters, body, carry)
    r = jnp.maximum(r, _RMIN)
    return 0.5 * jnp.log(r) * r / dr


def mandelbulb_de_pow8(p: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Batched (..., 3) wrapper over the trig-free power-8 components DE."""
    return mandelbulb_de_pow8_components(p[..., 0], p[..., 1], p[..., 2], iters)


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
