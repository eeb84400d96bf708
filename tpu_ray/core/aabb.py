"""Axis-aligned bounding boxes and the ray/box slab test.

TPU-native equivalent of the reference's AABB helper (SURVEY.md §2 #2): the
slab test is fully vectorized over ray batches and branch-free, since on the
VPU every lane runs the same code under masks. Used as the uniform-grid entry
point (find t_enter for DDA initialisation, SURVEY.md §3.4).
"""

from __future__ import annotations

import jax.numpy as jnp


def ray_aabb(
    origin: jnp.ndarray,  # (..., 3)
    inv_dir: jnp.ndarray,  # (..., 3) precomputed 1/d (with inf for d==0)
    box_min: jnp.ndarray,  # (3,) or broadcastable
    box_max: jnp.ndarray,
):
    """Branch-free slab test.

    Returns (t_enter, t_exit, hit_mask). A ray starting inside the box reports
    t_enter clamped to 0. Relies on IEEE inf semantics for axis-parallel rays:
    (box - o) * inf -> +/-inf ordered correctly by min/max; NaNs from 0*inf are
    avoided by the caller ensuring origin is never exactly on a slab with d==0
    (jnp.minimum/maximum propagate the non-NaN operand on TPU anyway).
    """
    t0 = (box_min - origin) * inv_dir
    t1 = (box_max - origin) * inv_dir
    t_near = jnp.minimum(t0, t1)
    t_far = jnp.maximum(t0, t1)
    t_enter = jnp.max(t_near, axis=-1)
    t_exit = jnp.min(t_far, axis=-1)
    hit = (t_exit >= jnp.maximum(t_enter, 0.0))
    return jnp.maximum(t_enter, 0.0), t_exit, hit


def safe_inv_dir(d: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """1/d with the sign of d preserved and |d| floored, avoiding NaN at d==0."""
    s = jnp.where(d >= 0.0, 1.0, -1.0)
    return s / jnp.maximum(jnp.abs(d), eps)
