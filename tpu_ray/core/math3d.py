"""3D vector math helpers on jnp arrays.

TPU-native replacement for the reference's C++ vector library (SURVEY.md §2 #1,
reference `lin_alg.h`): instead of a Vec3 class, everything here operates on
arrays whose *last* axis is the xyz component axis, so the same helpers work for
a single vector ``(3,)``, a ray batch ``(R, 3)``, or a tile ``(H, W, S, 3)``.
All helpers are differentiable; `normalize` and friends are guarded so their
VJPs are finite at degenerate inputs (zero-length vectors), which matters
because gradients flow through surface normals.
"""

from __future__ import annotations

import jax.numpy as jnp

# Epsilon used to keep rsqrt/div VJPs finite. Scale-free guards: callers that
# need tighter control pass their own eps.
_EPS = 1e-12


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the trailing xyz axis, keepdims dropped: (..., 3) -> (...,)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product over the trailing axis; written out so it fuses as 6 mul + 3 sub."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def length2(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def length(a: jnp.ndarray) -> jnp.ndarray:
    # sqrt(x) has an infinite derivative at 0; clamp keeps backward finite for
    # degenerate vectors (e.g. a ray exactly through a sphere center).
    return jnp.sqrt(jnp.maximum(length2(a), _EPS))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    return a / length(a)[..., None]


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect direction d about unit normal n."""
    return d - 2.0 * dot(d, n)[..., None] * n


def lerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    return a + (b - a) * t


def clamp01(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0.0, 1.0)
