"""Hand-written Pallas backward kernel for the fused SDF shade path.

The north-star structure (BASELINE.json north_star "Pallas kernels with a
hand-derived backward pass"; reference hot loop trace.cpp per SURVEY.md §2
#13): the forward march runs once and emits compact residuals (t, hit,
shadow visibility — tpu_ray/render/render.py geometry_residuals); the
differentiable shade reconstructs color from them. This module replaces the
XLA-autodiff backward of that reconstruction with ONE fused Pallas kernel:
per (8,128) ray tile it recomputes the shade chain in registers from the
residuals — IFT hit attach, ∇DE normal, DF-AO taps, Lambert — and applies
the exact vector-Jacobian pullback in-tile, accumulating parameter
cotangents across the grid and writing per-ray (o, d) cotangents for the
camera chain. No shade intermediate ever round-trips HBM, and the albedo
gather's backward becomes masked sums (no scatter).

The forward stays the existing XLA path (bit-identical images); only the
backward is replaced, via jax.custom_vjp. Gradients are exact up to FP
reassociation — gated by tests against jax.grad of the XLA path.

The gradient math mirrors, term for term:
  * kernels/sphere_trace.make_ift_attach — t is written as the value-
    identity  t̄ - hit·(DE(p̄) - sg(DE(p̄)))/sg(dDE/dt)  whose derivative IS
    the IFT pullback (-∂DE/∂inputs / (dDE/dt), zero for misses);
  * kernels/sphere_trace.surface_normal — n = ∇p DE / max(‖·‖, 1e-12),
    differentiable (the outer VJP carries the DE Hessian term);
  * render/shading.shade — two-sided flip, 5-tap DF AO, directional
    Lambert with static (stop-grad) shadow visibility, albedo select,
    sky-gradient background for misses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ray.kernels.pallas_sdf import (TILE, _flatten_sdf, _full_spec,
                                        _ray_specs, _tileize, _use_interpret,
                                        de_tile)

_DENOM_MIN = 1e-6  # mirrors kernels/sphere_trace._DENOM_MIN


def applicable(scene, cfg, method: str, dtype) -> bool:
    """Pallas-backward gate: the pure-SDF shade chain it implements.

    Everything else (mixed/mesh methods, diff_vis soft shadows, soft
    silhouettes, point lights, f64) falls back to XLA autodiff.
    """
    from tpu_ray.render.render import use_pallas

    return (method == "sdf"
            and scene.has_sdf
            and use_pallas(cfg, dtype)
            and dtype == jnp.float32
            and not cfg.diff_vis
            and cfg.soft_silhouette <= 0.0
            and cfg.ao in ("none", "sdf5")
            and scene.lights.direction.shape[0] > 0
            and scene.lights.position.shape[0] == 0)


def _local_shade(cfg, rebuild, t_bar, hit_f, mat_f, vis_rows,
                 ops, albedo, ldir, lcol, amb, bgt, bgb,
                 ox, oy, oz, dx, dy, dz):
    """Tile-level shade: the differentiable function the kernel VJPs.

    All ray-shaped values are (8,128) component tiles; t_bar/hit_f/mat_f/
    vis_rows are stop-gradient residual tiles (closed over, not diff args).
    Mirrors render.reconstruct_hits (sdf branch) + shading.shade exactly.
    """
    sdf = rebuild(ops)
    sg = jax.lax.stop_gradient
    # leave zero-size leaves as plain numpy (stop_gradient would trace them;
    # Mosaic cannot carry 0-extent constants)
    sdf_sg = jax.tree_util.tree_map(
        lambda x: sg(x) if (hasattr(x, "dtype") and x.size > 0) else x, sdf)

    # p̄ = o + t̄ d  (t̄ stop-grad; o/d differentiable for the camera chain)
    bx = ox + t_bar * dx
    by = oy + t_bar * dy
    bz = oz + t_bar * dz

    # stop-grad denominator dDE/dt = <∇DE(p̄), d> (sphere_trace attach's JVP)
    _, pb = jax.vjp(lambda x, y, z: de_tile(sdf_sg, x, y, z, unroll=True),
                    sg(bx), sg(by), sg(bz))
    gx, gy, gz = pb(jnp.ones_like(t_bar))
    denom = gx * sg(dx) + gy * sg(dy) + gz * sg(dz)
    denom_safe = jnp.where(jnp.abs(denom) < _DENOM_MIN,
                           jnp.where(denom < 0, -_DENOM_MIN, _DENOM_MIN),
                           denom)

    # IFT value-identity: value t̄, gradient -∂DE/∂(θ,o,d) / (dDE/dt) on hits
    de_val = de_tile(sdf, bx, by, bz, unroll=True)
    t = t_bar - hit_f * (de_val - sg(de_val)) / sg(denom_safe)

    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz

    # differentiable normal = ∇p DE / max(‖·‖, 1e-12) (surface_normal)
    _, pb2 = jax.vjp(lambda x, y, z: de_tile(sdf, x, y, z, unroll=True), px, py, pz)
    nx, ny, nz = pb2(jnp.ones_like(t_bar))
    inv = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-12))
    nx, ny, nz = nx * inv, ny * inv, nz * inv
    # two-sided: face against the incoming ray (shading.shade)
    flip = jnp.where(nx * dx + ny * dy + nz * dz > 0.0, -1.0, 1.0)
    nx, ny, nz = nx * flip, ny * flip, nz * flip

    # 5-tap distance-field AO (shading.sdf_ambient_occlusion, SDF term only)
    if cfg.ao == "sdf5":
        occ = jnp.zeros_like(t_bar)
        w = 1.0
        for i in range(1, 6):
            h = cfg.ao_step * i
            dd = de_tile(sdf, px + h * nx, py + h * ny, pz + h * nz, unroll=True)
            occ = occ + w * (h - dd)
            w *= 0.7
        ao = jnp.clip(1.0 - cfg.ao_strength * occ, 0.0, 1.0)
    else:
        ao = jnp.ones_like(t_bar)

    rad = [amb[c] * ao for c in range(3)]
    for li in range(ldir.shape[0]):
        lx, ly, lz = ldir[li, 0], ldir[li, 1], ldir[li, 2]
        ln = jnp.sqrt(lx * lx + ly * ly + lz * lz)  # math3d.normalize (no eps)
        lx, ly, lz = lx / ln, ly / ln, lz / ln
        ndotl = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
        term = ndotl * vis_rows[li]  # static visibility residual
        for c in range(3):
            rad[c] = rad[c] + lcol[li, c] * term

    out = []
    s_bg = 0.5 * (dy + 1.0)  # sky gradient (types.background_color)
    for c in range(3):
        alb = jnp.zeros_like(t_bar)
        for m in range(albedo.shape[0]):  # gather -> masked sum (no scatter)
            alb = alb + jnp.where(mat_f == float(m), albedo[m, c], 0.0)
        color = alb * rad[c]
        bg = bgb[c] + (bgt[c] - bgb[c]) * s_bg
        out.append(jnp.where(hit_f > 0.5, color, bg))
    return tuple(out)


def shade_bwd_pallas(scene, cfg, o, d, res, mat, ct, method: str,
                     interpret: bool | None = None):
    """One fused backward kernel: cotangents of the SDF shade chain.

    Inputs: primal rays o/d (R,3), geometry residuals, stop-grad material
    ids (R,), upstream color cotangent ct (R,3). Returns
    (d_sdf_ops list, d_albedo, d_ldir, d_lcol, d_ambient, d_bg_top,
    d_bg_bottom, d_o, d_d).
    """
    if interpret is None:
        interpret = _use_interpret()
    dtype = o.dtype
    n_lights = scene.lights.direction.shape[0]
    have_vis = "sh_vis" in res and cfg.shadow != "none"

    ray_cols = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                jax.lax.stop_gradient(res["sdf_t"]).astype(dtype),
                res["sdf_hit"].astype(dtype),
                mat.astype(dtype)]
    for li in range(n_lights):
        ray_cols.append(jax.lax.stop_gradient(res["sh_vis"][li]).astype(dtype)
                        if have_vis else jnp.ones_like(ray_cols[0]))
    ray_cols += [ct[:, 0], ct[:, 1], ct[:, 2]]
    tiles = []
    R = nt = None
    for c in ray_cols:
        tc, R, nt = _tileize(c)
        tiles.append(tc)
    # padded lanes replicate the last real ray: zero their cotangent so the
    # parameter accumulators see each ray exactly once
    if nt * TILE[0] * TILE[1] != R:
        pad_mask = jnp.concatenate(
            [jnp.ones((R,), dtype),
             jnp.zeros((nt * TILE[0] * TILE[1] - R,), dtype)]
        ).reshape(nt * TILE[0], TILE[1])
        tiles[-3:] = [tc * pad_mask for tc in tiles[-3:]]
    n_ray_ops = len(tiles)

    ops, rebuild = _flatten_sdf(scene.sdf)
    params = [jnp.asarray(scene.materials.albedo, dtype),
              jnp.asarray(scene.lights.direction, dtype),
              jnp.asarray(scene.lights.color, dtype),
              jnp.asarray(scene.lights.ambient, dtype),
              jnp.asarray(scene.bg_top, dtype),
              jnp.asarray(scene.bg_bottom, dtype)]
    diff_small = list(ops) + params
    n_small = len(diff_small)

    def kernel(*refs):
        ray_refs = refs[:n_ray_ops]
        small_refs = refs[n_ray_ops:n_ray_ops + n_small]
        out_small = refs[n_ray_ops + n_small:n_ray_ops + 2 * n_small]
        out_rays = refs[n_ray_ops + 2 * n_small:]

        ox, oy, oz, dx, dy, dz = (ray_refs[i][:] for i in range(6))
        t_bar = ray_refs[6][:]
        hit_f = ray_refs[7][:]
        mat_f = ray_refs[8][:]
        vis_rows = [ray_refs[9 + li][:] for li in range(n_lights)]
        ctr = ray_refs[9 + n_lights][:]
        ctg = ray_refs[10 + n_lights][:]
        ctb = ray_refs[11 + n_lights][:]
        small_vals = [r[:] for r in small_refs]

        def local(*diff_args):
            ops_v = list(diff_args[:len(ops)])
            albedo, ldir, lcol, amb, bgt, bgb = diff_args[len(ops):n_small]
            lox, loy, loz, ldx, ldy, ldz = diff_args[n_small:]
            return _local_shade(cfg, rebuild, t_bar, hit_f, mat_f, vis_rows,
                                ops_v, albedo, ldir, lcol, amb, bgt, bgb,
                                lox, loy, loz, ldx, ldy, ldz)

        _, pullback = jax.vjp(local, *small_vals, ox, oy, oz, dx, dy, dz)
        cots = pullback((ctr, ctg, ctb))
        # int leaves (material-id arrays) pull back float0 — store zeros
        small_cots = [jnp.zeros(v.shape, dtype)
                      if c.dtype == jax.dtypes.float0 else c
                      for c, v in zip(cots[:n_small], small_vals)]
        ray_cots = cots[n_small:]

        i = pl.program_id(0)
        for k in range(n_small):
            @pl.when(i == 0)
            def _(k=k):
                out_small[k][...] = small_cots[k]

            @pl.when(i != 0)
            def _(k=k):
                out_small[k][...] = out_small[k][...] + small_cots[k]
        for k in range(6):
            out_rays[k][...] = ray_cots[k]

    small_specs = [_full_spec(x) for x in diff_small]
    out_shapes = ([jax.ShapeDtypeStruct(x.shape, dtype) for x in diff_small]
                  + [jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), dtype)
                     for _ in range(6)])
    out_specs = small_specs + _ray_specs(6)
    outs = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=_ray_specs(n_ray_ops) + small_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        # the unrolled second-order DE chain's live set slightly exceeds the
        # default 16 MB scoped-VMEM budget at 14 fractal iterations
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*tiles, *diff_small)

    small_cots = outs[:n_small]
    ray_cots = [r.reshape(-1)[:R] for r in outs[n_small:]]
    d_o = jnp.stack(ray_cots[0:3], -1)
    d_d = jnp.stack(ray_cots[3:6], -1)
    d_ops = small_cots[:len(ops)]
    (d_albedo, d_ldir, d_lcol, d_amb, d_bgt, d_bgb) = small_cots[len(ops):]
    return d_ops, d_albedo, d_ldir, d_lcol, d_amb, d_bgt, d_bgb, d_o, d_d


def _zero_cot(x):
    """Cotangent zero matching jax's conventions (float0 for int leaves)."""
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    if hasattr(x, "dtype"):
        return np.zeros(x.shape, jax.dtypes.float0)
    return None


def make_shade_sdf_vjp(cfg, method: str, xla_shade):
    """custom_vjp wrapper: XLA forward (unchanged), Pallas fused backward.

    xla_shade(scene, cfg, o, d, res, method) is the existing shade body —
    passed in to avoid a circular import with render.py.
    """

    @jax.custom_vjp
    def f(scene, o, d, res):
        return xla_shade(scene, cfg, o, d, res, method)

    def fwd(scene, o, d, res):
        from tpu_ray.sdf.primitives import sdf_distance_and_mat

        # stop-grad material ids at the saved hit points (matches the mat
        # reconstruct_hits computes; recomputed here so it rides the saved
        # residuals into the backward kernel)
        sg = jax.lax.stop_gradient
        p_bar = sg(o) + sg(res["sdf_t"])[..., None] * sg(d)
        _, mat = sdf_distance_and_mat(sg(scene.sdf), p_bar)
        return f(scene, o, d, res), (scene, o, d, res, sg(mat))

    def bwd(saved, ct):
        scene, o, d, res, mat = saved
        (d_ops, d_albedo, d_ldir, d_lcol, d_amb, d_bgt, d_bgb,
         d_o, d_d) = shade_bwd_pallas(scene, cfg, o, d, res, mat, ct, method)

        # scatter the small cotangents back into a full scene-cotangent tree
        it = iter(d_ops)
        sdf_leaves, sdf_treedef = jax.tree_util.tree_flatten(scene.sdf)
        d_sdf_leaves = []
        for l in sdf_leaves:
            if hasattr(l, "size") and l.size > 0:
                c = next(it)  # kernel emits f32 zeros for int leaves
                d_sdf_leaves.append(
                    c if jnp.issubdtype(l.dtype, jnp.floating)
                    else _zero_cot(l))
            else:
                d_sdf_leaves.append(_zero_cot(l))
        d_sdf = jax.tree_util.tree_unflatten(sdf_treedef, d_sdf_leaves)
        d_scene = jax.tree_util.tree_map(_zero_cot, scene)
        d_scene = d_scene.replace(
            sdf=d_sdf,
            materials=d_scene.materials.replace(albedo=d_albedo),
            lights=d_scene.lights.replace(
                direction=d_ldir, color=d_lcol, ambient=d_amb),
            bg_top=d_bgt, bg_bottom=d_bgb)
        d_res = jax.tree_util.tree_map(_zero_cot, res)
        return d_scene, d_o, d_d, d_res

    f.defvjp(fwd, bwd)
    return f
