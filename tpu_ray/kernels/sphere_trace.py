"""Sphere tracing (SDF ray march) as a fixed-budget scan with an
implicit-function-theorem backward pass.

TPU-native equivalent of the reference's march loop (SURVEY.md §2 #10, §3.3:
`t += DE(o + t*d)` until `DE < eps` or budget exhausted). Two deliberate
departures from the C++ structure, both required by the north star
(BASELINE.json):

  * the data-dependent `while` becomes a *fixed-budget* `lax.fori_loop` over
    the whole ray batch with per-lane live masks — every VPU lane runs the
    same trip count, converged lanes are frozen by `where`;
  * the backward pass does NOT differentiate through the march iterations.
    The hit time t* satisfies DE(o + t* d; theta) = eps, so by the implicit
    function theorem  dt*/dtheta = -(dDE/dtheta) / (dDE/dt)  evaluated at the
    hit. The custom VJP runs the march under stop_gradient and then applies
    one VJP of the distance field at the hit point — O(1) memory in the step
    count, and exact for interior (non-silhouette) rays.

`make_sphere_tracer` closes over the distance function and static config and
returns a `jax.custom_vjp` function of (scene_params, origins, dirs).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# |dDE/dt| is clamped to at least this before dividing, guarding grazing hits
# where the ray is nearly tangent to the level set (SURVEY.md §7 hard part 6).
_DENOM_MIN = 1e-6


def march(de_fn: Callable, scene, o, d, *, t0, max_steps: int, eps: float, t_far: float):
    """Forward march only (no custom gradient): returns (t, hit, steps, t_min).

    de_fn(scene, p) evaluates the distance field batched: (..., 3) -> (...,).
    o, d: (..., 3); t0: scalar or (...,) initial distance along the ray.
    t_min is the ray parameter at which the smallest DE was observed — the
    closest-approach point, used for differentiable soft silhouettes
    (render.py): re-evaluating DE there with gradients gives a smooth
    signed "miss distance" even for rays that never hit.
    """
    dtype = o.dtype
    t_init = jnp.broadcast_to(jnp.asarray(t0, dtype), o.shape[:-1])
    hit0 = jnp.zeros(o.shape[:-1], bool)
    steps0 = jnp.zeros(o.shape[:-1], jnp.int32)
    dmin0 = jnp.full(o.shape[:-1], 1e10, dtype)
    tmin0 = t_init

    def body(_, carry):
        t, hit, steps, dmin, tmin = carry
        active = (~hit) & (t < t_far)
        dist = de_fn(scene, o + t[..., None] * d)
        closer = active & (dist < dmin)
        dmin = jnp.where(closer, dist, dmin)
        tmin = jnp.where(closer, t, tmin)
        hit_now = active & (dist < eps)
        hit = hit | hit_now
        advance = active & (~hit_now)
        t = jnp.where(advance, t + dist, t)
        steps = steps + active.astype(jnp.int32)
        return t, hit, steps, dmin, tmin

    t, hit, steps, _dmin, tmin = jax.lax.fori_loop(
        0, max_steps, body, (t_init, hit0, steps0, dmin0, tmin0))
    return t, hit, steps, tmin


def make_ift_attach(de_fn: Callable):
    """Build attach(scene, o, d, t_bar, hit_f) -> t: value-identity on the
    non-differentiated march result t_bar, with the implicit-function-theorem
    pullback as its gradient.

    This is the residual-based "hand-derived backward" building block
    (BASELINE.json north_star; VERDICT r1 item 1): the expensive fixed-point
    march runs ONCE outside the autodiff region and emits t_bar as a compact
    residual; attaching gradients costs one DE JVP (the denominator
    dDE/dt) plus one DE VJP (the numerator pullback) at the hit point —
    O(1) in the step count, and never recomputed by rematerialization.

    hit_f: float mask (1.0 = hit). Misses contribute zero gradient.
    """

    @jax.custom_vjp
    def attach(scene, o, d, t_bar, hit_f):
        return t_bar

    def fwd(scene, o, d, t_bar, hit_f):
        return t_bar, (scene, o, d, t_bar, hit_f)

    def bwd(res, ct_t):
        scene, o, d, t_bar, hit_f = res

        # g(scene, o, d) = DE(o + t̄ d; scene) with t̄ held fixed.
        def g(scene_, o_, d_):
            return de_fn(scene_, o_ + t_bar[..., None] * d_)

        # dDE/dt = <grad_p DE, d> via a JVP in the ray direction.
        def de_of_t(tt):
            return de_fn(scene, o + tt[..., None] * d)

        _, denom = jax.jvp(de_of_t, (t_bar,), (jnp.ones_like(t_bar),))
        denom_safe = jnp.where(
            jnp.abs(denom) < _DENOM_MIN,
            jnp.where(denom < 0, -_DENOM_MIN, _DENOM_MIN),
            denom,
        )
        # dt*/d(inputs) = -(dDE/d(inputs)) / (dDE/dt); zero for misses.
        scale = jnp.where(hit_f > 0.5, -ct_t / denom_safe, 0.0).astype(t_bar.dtype)
        _, pullback = jax.vjp(g, scene, o, d)
        gs, go, gd = pullback(scale)
        return gs, go, gd, jnp.zeros_like(t_bar), jnp.zeros_like(hit_f)

    attach.defvjp(fwd, bwd)
    return attach


def make_sphere_tracer(de_fn: Callable, *, max_steps: int, eps: float, t_far: float,
                       t0: float = 0.0, forward_impl: str = "jnp"):
    """Build a differentiable tracer trace(scene, o, d) -> (t, hit, steps).

    Gradients flow into scene params, o and d via the IFT at the hit point
    (make_ift_attach); non-hit rays contribute zero gradient. `steps` is
    diagnostic (int32).

    forward_impl: "jnp" (lockstep batch march) or "pallas" (fused (8,128)
    ray-tile kernel with per-tile early exit, tpu_ray/kernels/pallas_sdf.py).
    The backward pass is the SAME IFT pullback either way — only the forward
    fixed-point solver changes, so gradients are bit-compatible.
    """
    attach = make_ift_attach(de_fn)

    def trace(scene, o, d):
        scene_s = jax.lax.stop_gradient(scene)
        o_s = jax.lax.stop_gradient(o)
        d_s = jax.lax.stop_gradient(d)
        if forward_impl == "pallas":
            from tpu_ray.kernels.pallas_sdf import march_pallas

            t, hit, steps, tmin = march_pallas(
                scene_s, o_s, d_s, t0=t0, max_steps=max_steps, eps=eps,
                t_far=t_far)
        else:
            t, hit, steps, tmin = march(
                de_fn, scene_s, o_s, d_s, t0=t0, max_steps=max_steps, eps=eps,
                t_far=t_far)
        t = attach(scene, o, d, t, hit.astype(o.dtype))
        return t, hit, steps, tmin

    return trace


def surface_normal(de_fn: Callable, scene, p: jnp.ndarray) -> jnp.ndarray:
    """Unit surface normal = normalized grad_p DE, batched over rays.

    One VJP with a ones cotangent gives per-row gradients exactly, because each
    output of the batched DE depends only on its own query point.
    """
    _, pullback = jax.vjp(lambda pp: de_fn(scene, pp), p)
    (grad_p,) = pullback(jnp.ones(p.shape[:-1], p.dtype))
    n2 = jnp.sum(grad_p * grad_p, axis=-1, keepdims=True)
    return grad_p / jnp.sqrt(jnp.maximum(n2, 1e-12))
