"""Gradcheck harness: central finite differences vs autodiff VJP.

Required new component (SURVEY.md §2c): "gradcheck-clean backward" is an
acceptance criterion of BASELINE.json. Visibility discontinuities (object
silhouettes) carry measure-zero Dirac gradients that finite differences see
but the VJP (correctly) does not, so checks are restricted to *interior*
pixels via an eroded hit mask (SURVEY.md §7 hard part 3, §4.3).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp


def erode_mask(mask: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """Binary erosion of an (H, W) mask — keeps pixels whose 3×3 neighborhood
    is fully inside, dropping silhouette pixels."""
    m = mask.astype(jnp.float32)
    for _ in range(iters):
        acc = jnp.ones_like(m)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc = acc * jnp.roll(jnp.roll(m, dy, 0), dx, 1)
        m = acc
    return m > 0.5


def interior_mask(hit_image: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """Mask that is 1 strictly inside both the hit and the miss regions —
    i.e. everywhere except a band around silhouettes."""
    inside = erode_mask(hit_image, iters)
    outside = erode_mask(~hit_image, iters)
    return inside | outside


def finite_diff_grad(f: Callable[[np.ndarray], float], x0: np.ndarray,
                     eps: float = 1e-4) -> np.ndarray:
    """Central finite differences of a scalar function, elementwise."""
    x0 = np.asarray(x0, np.float64)
    g = np.zeros_like(x0)
    flat = x0.ravel()
    gf = g.ravel()
    for i in range(flat.size):
        xp = flat.copy(); xp[i] += eps
        xm = flat.copy(); xm[i] -= eps
        gf[i] = (f(xp.reshape(x0.shape)) - f(xm.reshape(x0.shape))) / (2 * eps)
    return g


def check_grad(loss_fn: Callable, x0, eps: float = 1e-4,
               rtol: float = 2e-3, atol: float = 1e-6):
    """Compare jax.grad(loss_fn)(x) against central differences.

    loss_fn: scalar-valued, differentiable in its (array) argument.
    Returns (autodiff_grad, fd_grad); raises AssertionError on mismatch.
    """
    x0 = jnp.asarray(x0, jnp.float64)
    g_ad = np.asarray(jax.grad(loss_fn)(x0), np.float64)
    g_fd = finite_diff_grad(lambda x: float(loss_fn(jnp.asarray(x))), np.asarray(x0), eps)
    denom = np.maximum(np.abs(g_fd), np.maximum(np.abs(g_ad), 1e-8))
    rel = np.abs(g_ad - g_fd) / denom
    ok = (np.abs(g_ad - g_fd) <= atol) | (rel <= rtol)
    if not np.all(ok):
        bad = np.argwhere(~ok)
        raise AssertionError(
            f"gradcheck failed at {bad[:5].tolist()}: ad={g_ad[~ok][:5]} fd={g_fd[~ok][:5]} rel={rel[~ok][:5]}"
        )
    return g_ad, g_fd
