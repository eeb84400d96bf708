"""Hand-written Pallas backward kernel for the fused shade path.

The north-star structure (BASELINE.json north_star "Pallas kernels with a
hand-derived backward pass"; reference hot loop trace.cpp per SURVEY.md §2
#13): the forward geometry pass runs once and emits compact residuals (march
t, selected triangle, shadow visibility — tpu_ray/render/render.py
geometry_residuals); the differentiable shade reconstructs color from them.
This module replaces the XLA-autodiff backward of that reconstruction with
ONE fused Pallas kernel: per (8,128) ray tile it recomputes the shade chain
in registers from the residuals — IFT hit attach, ∇DE normal, the selected
triangle's Möller–Trumbore re-solve, closest-select, DF-AO taps, Lambert with
directional AND point lights — and applies the exact vector-Jacobian pullback
in-tile, accumulating parameter cotangents across the grid and writing
per-ray cotangents for the camera chain (o, d) and the selected triangle's
corners (scattered into vertex gradients outside the kernel — gather/scatter
stays in XLA where it belongs; the dense per-ray math stays in VMEM). No
shade intermediate ever round-trips HBM, and the albedo gather's backward
becomes masked sums (no scatter).

Round 3 (VERDICT r2 item 1) widened coverage from pure-SDF/directional to the
FULL static-visibility shade family: methods sdf / mesh_brute / mesh_grid /
mixed, point lights (inverse-square falloff, differentiable positions),
mesh-aware DF-AO (ao_tmesh residual taps). Round 5 (VERDICT r4 item 2) adds
the differentiable-visibility chains: the diff_vis soft-shadow penumbra
recompute (one DE evaluation at the saved argmin parameter sh_ts per light —
render.make_residual_occluder) and soft silhouettes (sigmoid coverage from
one DE evaluation at the saved closest-approach sdf_tmin —
render._sdf_from_res), so the README's own `fit` invocation runs the fused
backward. Only f64 and non-TPU backends fall back to XLA autodiff.

The forward stays the existing XLA path (bit-identical images); only the
backward is replaced, via jax.custom_vjp. Gradients are exact up to FP
reassociation — gated by tests against jax.grad of the XLA path (CPU
interpret mode) and by the on-chip parity gate (tools/parity_tpu.py).

The gradient math mirrors, term for term:
  * kernels/sphere_trace.make_ift_attach — t is written as the value-
    identity  t̄ - hit·(DE(p̄) - sg(DE(p̄)))/sg(dDE/dt)  whose derivative IS
    the IFT pullback (-∂DE/∂inputs / (dDE/dt), zero for misses);
  * kernels/sphere_trace.surface_normal — n = ∇p DE / max(‖·‖, 1e-12),
    differentiable (the outer VJP carries the DE Hessian term);
  * kernels/moller_trumbore.recompute_hit — t/normal of the SELECTED
    triangle re-solved from its gathered corners (differentiable w.r.t.
    corners, o, d; the discrete selection is the stop-grad residual);
  * render/render.reconstruct_hits (mixed) — closest-select between the two
    branches by the stop-grad sdf_closer mask;
  * render/shading.shade — two-sided flip, 5-tap DF AO (SDF term and/or the
    |t_mesh - h| mesh term), directional + point-light Lambert with static
    (stop-grad) shadow visibility, albedo select, sky-gradient background.
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
_DET_EPS = 1e-10  # mirrors kernels/moller_trumbore._DET_EPS
_BIG = 1e10


def _spec(scene, cfg, method: str):
    """Static shape of the shade chain (what the kernel must recompute)."""
    use_sdf = method in ("sdf", "mixed") and scene.has_sdf
    use_mesh = (method in ("mesh_brute", "mesh_grid", "mixed")
                and scene.has_mesh)
    return {
        "use_sdf": use_sdf,
        "use_mesh": use_mesh,
        "mixed": use_sdf and use_mesh,
        # AO's SDF term is gated by scene CONTENT (render.make_ao); its mesh
        # term by the ao_tmesh residual (present when the method traces a
        # non-empty mesh)
        "ao_sdf": cfg.ao == "sdf5" and scene.has_sdf,
        "ao_mesh": cfg.ao == "sdf5" and use_mesh,
        "n_dir": scene.lights.direction.shape[0],
        "n_pos": scene.lights.position.shape[0],
        "shadows": cfg.shadow != "none",
        # differentiable-visibility chains (render.make_residual_occluder /
        # render._sdf_from_res): one extra DE eval + pullback each
        "soft_diff": (cfg.shadow == "soft" and cfg.diff_vis and use_sdf),
        "soft_sil": cfg.soft_silhouette > 0.0 and use_sdf,
        # mesh edge-band coverage (render._mesh_from_res): recomputed from
        # the corners already in-tile — no extra residuals
        "mesh_sil": cfg.mesh_silhouette > 0.0 and use_mesh,
    }


def applicable(scene, cfg, method: str, dtype) -> bool:
    """Pallas-backward gate: every shade chain render.py ships — the
    static-visibility family (VERDICT r2 item 1: mixed/mesh, point lights)
    plus the differentiable-visibility chains (VERDICT r4 item 2: diff_vis
    soft-shadow penumbra, soft silhouettes).

    Only f64 and non-Pallas backends fall back to XLA autodiff.
    """
    from tpu_ray.render.render import use_pallas

    s = _spec(scene, cfg, method)
    if not (s["use_sdf"] or s["use_mesh"]):
        return False
    if method == "mixed" and not (s["use_sdf"] and s["use_mesh"]):
        return False
    return (use_pallas(cfg, dtype)
            and dtype == jnp.float32
            and cfg.ao in ("none", "sdf5")
            and s["n_dir"] + s["n_pos"] > 0)


def _local_shade(cfg, spec, rebuild, resid, ops, prm, rays):
    """Tile-level shade: the differentiable function the kernel VJPs.

    resid: dict of stop-gradient residual tiles (closed over, not diff args);
    ops/prm/rays: the differentiable leaves — sdf operand arrays, small
    parameter arrays (albedo/lights/bg), and per-ray component tiles
    (ox..dz and, with a mesh, the selected triangle's 9 corner components).
    Mirrors render.reconstruct_hits + shading.shade exactly.
    """
    sg = jax.lax.stop_gradient
    ox, oy, oz, dx, dy, dz = rays[:6]
    zero = ox * 0.0

    # the AO taps and the differentiable-visibility chains need the field
    # even when the hit chain is mesh-only (a tile-class variant, or a
    # mesh-method scene that still contains an SDF)
    sdf = (rebuild(ops) if (spec["use_sdf"] or spec["ao_sdf"]
                            or spec["soft_diff"] or spec["soft_sil"])
           else None)

    # --- SDF branch: IFT t + ∇DE normal (render._sdf_from_res) -------------
    if spec["use_sdf"]:
        sdf_sg = jax.tree_util.tree_map(
            lambda x: sg(x) if (hasattr(x, "dtype") and x.size > 0) else x, sdf)
        t_bar, hs_f = resid["t_bar"], resid["hs_f"]

        # p̄ = o + t̄ d  (t̄ stop-grad; o/d differentiable for the camera chain)
        bx = ox + t_bar * dx
        by = oy + t_bar * dy
        bz = oz + t_bar * dz
        # stop-grad denominator dDE/dt = <∇DE(p̄), d> (sphere_trace attach)
        _, pb = jax.vjp(lambda x, y, z: de_tile(sdf_sg, x, y, z, unroll=True),
                        sg(bx), sg(by), sg(bz))
        gx, gy, gz = pb(jnp.ones_like(t_bar))
        denom = gx * sg(dx) + gy * sg(dy) + gz * sg(dz)
        denom_safe = jnp.where(jnp.abs(denom) < _DENOM_MIN,
                               jnp.where(denom < 0, -_DENOM_MIN, _DENOM_MIN),
                               denom)
        # IFT value-identity: value t̄, gradient -∂DE/∂(θ,o,d)/(dDE/dt) on hits
        de_val = de_tile(sdf, bx, by, bz, unroll=True)
        ts = t_bar - hs_f * (de_val - sg(de_val)) / sg(denom_safe)
        if spec["soft_sil"]:
            # soft-silhouette coverage (render._sdf_from_res): one DE eval
            # WITH gradients at the closest-approach parameter tmin (a
            # stop-grad sampling location); sigmoid of the miss distance
            # gives silhouette motion real cotangents on miss lanes
            tmin = resid["tmin"]
            d_min = de_tile(sdf, ox + tmin * dx, oy + tmin * dy,
                            oz + tmin * dz, unroll=True)
            cov_miss = jax.nn.sigmoid(-d_min / cfg.soft_silhouette)
            hs_b = hs_f > 0.5
            cov_s = jnp.where(hs_b, jnp.ones_like(cov_miss), cov_miss)
            ts_eff = jnp.where(hs_b, ts, tmin)
        else:
            cov_s = hs_f
            ts_eff = ts

    # --- Mesh branch: MT re-solve of the selected triangle -----------------
    # (moller_trumbore.recompute_hit on component tiles; corners are the
    # differentiable per-ray gathered values, scattered to verts outside)
    if spec["use_mesh"]:
        hm_f = resid["hm_f"]
        (v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z) = rays[6:15]
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        det_safe = jnp.where(jnp.abs(det) > _DET_EPS, det,
                             jnp.where(det >= 0, _DET_EPS, -_DET_EPS))
        inv_det = 1.0 / det_safe
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        tm = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        tm = jnp.where(hm_f > 0.5, tm, _BIG)  # render._mesh_from_res
        # geometric normal normalize(cross(e1, e2)) (math3d.normalize)
        cnx = e1y * e2z - e1z * e2y
        cny = e1z * e2x - e1x * e2z
        cnz = e1x * e2y - e1y * e2x
        cinv = 1.0 / jnp.sqrt(jnp.maximum(cnx * cnx + cny * cny + cnz * cnz,
                                          1e-12))
        nmx, nmy, nmz = cnx * cinv, cny * cinv, cnz * cinv
        if spec["mesh_sil"]:
            # mesh edge-band coverage (moller_trumbore.edge_margin_corners):
            # barycentrics u, v of the selected triangle, world distance to
            # the nearest edge = min_i b_i · 2A / L_i, ramped over the band
            um = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            vm = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            two_area = jnp.sqrt(jnp.maximum(
                cnx * cnx + cny * cny + cnz * cnz, 1e-24))
            ex, ey, ez = v2x - v1x, v2y - v1y, v2z - v1z
            l0 = jnp.sqrt(jnp.maximum(ex * ex + ey * ey + ez * ez, 1e-24))
            l1 = jnp.sqrt(jnp.maximum(e2x * e2x + e2y * e2y + e2z * e2z,
                                      1e-24))
            l2 = jnp.sqrt(jnp.maximum(e1x * e1x + e1y * e1y + e1z * e1z,
                                      1e-24))
            margin = jnp.minimum(
                (1.0 - um - vm) * two_area / l0,
                jnp.minimum(um * two_area / l1, vm * two_area / l2))
            cm = jnp.where(hm_f > 0.5,
                           jnp.clip(margin / cfg.mesh_silhouette, 0.0, 1.0),
                           jnp.zeros_like(margin))
        else:
            cm = hm_f

    # --- closest-select (render.reconstruct_hits mixed) --------------------
    if spec["mixed"]:
        closer = resid["closer_f"] > 0.5  # stop-grad select mask
        t = jnp.where(closer, ts_eff, tm)
        hit_f = jnp.maximum(resid["hs_f"], resid["hm_f"])
        # soft SDF coverage applies only where the mesh does not hit in front
        cov = jnp.where((resid["hm_f"] > 0.5) & (~closer), cm,
                        jnp.maximum(cov_s, cm))
    elif spec["use_sdf"]:
        t = ts_eff
        hit_f = resid["hs_f"]
        cov = cov_s
    else:
        t = tm
        hit_f = resid["hm_f"]
        cov = cm

    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz

    if spec["use_sdf"]:
        # differentiable normal = ∇p DE / max(‖·‖, 1e-12) (surface_normal);
        # evaluated at the SELECTED hit point, exactly like the XLA chain
        # (whose _sdf_from_res normal uses p_s = o + ts_eff d — identical to
        # the selected p on sdf-closer lanes, and unused on mesh-closer lanes
        # except through the soft-silhouette coverage blend)
        if spec["mixed"]:
            spx = ox + ts_eff * dx
            spy = oy + ts_eff * dy
            spz = oz + ts_eff * dz
        else:
            spx, spy, spz = px, py, pz
        _, pb2 = jax.vjp(lambda x, y, z: de_tile(sdf, x, y, z, unroll=True),
                         spx, spy, spz)
        nsx, nsy, nsz = pb2(jnp.ones_like(t))
        inv = 1.0 / jnp.sqrt(jnp.maximum(nsx * nsx + nsy * nsy + nsz * nsz,
                                         1e-12))
        nsx, nsy, nsz = nsx * inv, nsy * inv, nsz * inv

    if spec["mixed"]:
        nx = jnp.where(closer, nsx, nmx)
        ny = jnp.where(closer, nsy, nmy)
        nz = jnp.where(closer, nsz, nmz)
    elif spec["use_sdf"]:
        nx, ny, nz = nsx, nsy, nsz
    else:
        nx, ny, nz = nmx, nmy, nmz

    # two-sided: face against the incoming ray (shading.shade)
    flip = jnp.where(nx * dx + ny * dy + nz * dz > 0.0, -1.0, 1.0)
    nx, ny, nz = nx * flip, ny * flip, nz * flip

    # 5-tap distance-field AO (shading.sdf_ambient_occlusion; the mesh term
    # is the stop-grad ao_tmesh residual: occluder distance |t_mesh - h|)
    if spec["ao_sdf"] or spec["ao_mesh"]:
        t_mesh = resid.get("ao_tmesh")
        occ = zero
        w = 1.0
        for i in range(1, 6):
            h = cfg.ao_step * i
            dd = None
            if spec["ao_sdf"]:
                dd = de_tile(sdf, px + h * nx, py + h * ny, pz + h * nz,
                             unroll=True)
            if spec["ao_mesh"] and t_mesh is not None:
                dm = jnp.abs(t_mesh - h)
                dd = dm if dd is None else jnp.minimum(dd, dm)
            occ = occ + w * (h - dd)
            w *= 0.7
        ao = jnp.clip(1.0 - cfg.ao_strength * occ, 0.0, 1.0)
    else:
        ao = zero + 1.0

    amb = prm["ambient"]
    rad = [amb[c] * ao for c in range(3)]
    vis_rows = resid["vis_rows"]
    if spec["soft_diff"]:
        # shadow-march origin p_off = p + bias·n (shading.shade): the
        # penumbra recompute below evaluates the DE along the SAME ray the
        # geometry pass marched (render.make_residual_occluder)
        pox = px + cfg.shadow_bias * nx
        poy = py + cfg.shadow_bias * ny
        poz = pz + cfg.shadow_bias * nz
        ts_rows = resid["ts_rows"]
    for li in range(spec["n_dir"]):
        ldir, lcol = prm["ldir"], prm["lcol"]
        lx, ly, lz = ldir[li, 0], ldir[li, 1], ldir[li, 2]
        ln = jnp.sqrt(lx * lx + ly * ly + lz * lz)  # math3d.normalize (no eps)
        lx, ly, lz = lx / ln, ly / ln, lz / ln
        ndotl = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
        vis = vis_rows[li]  # static visibility residual
        if spec["soft_diff"]:
            # differentiable penumbra: ONE DE eval at the saved argmin
            # parameter t_s — exactly the march's min value
            # (shading.sdf_soft_shadow_argmin)
            ts_l = ts_rows[li]
            dd = de_tile(sdf, pox + ts_l * lx, poy + ts_l * ly,
                         poz + ts_l * lz, unroll=True)
            vis = vis * jnp.clip(
                cfg.soft_k * dd / jnp.maximum(ts_l, cfg.shadow_bias),
                0.0, 1.0)
        term = ndotl * vis
        for c in range(3):
            rad[c] = rad[c] + lcol[li, c] * term
    for pi in range(spec["n_pos"]):
        # point light: per-ray direction from the DIFFERENTIABLE hit point,
        # inverse-square falloff (shading.shade point-light loop)
        lpos, lpcol = prm["lpos"], prm["lpcol"]
        lvx = lpos[pi, 0] - px
        lvy = lpos[pi, 1] - py
        lvz = lpos[pi, 2] - pz
        dist2 = lvx * lvx + lvy * lvy + lvz * lvz
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        ndotl = jnp.maximum((nx * lvx + ny * lvy + nz * lvz) / dist, 0.0)
        vis = vis_rows[spec["n_dir"] + pi]
        if spec["soft_diff"]:
            # penumbra along the OFFSET segment p_off -> light (the ray the
            # geometry pass marched; shading.shade point-light occluder)
            ts_l = ts_rows[spec["n_dir"] + pi]
            lox = lpos[pi, 0] - pox
            loy = lpos[pi, 1] - poy
            loz = lpos[pi, 2] - poz
            od = jnp.sqrt(jnp.maximum(lox * lox + loy * loy + loz * loz,
                                      1e-12))
            lox, loy, loz = lox / od, loy / od, loz / od
            dd = de_tile(sdf, pox + ts_l * lox, poy + ts_l * loy,
                         poz + ts_l * loz, unroll=True)
            vis = vis * jnp.clip(
                cfg.soft_k * dd / jnp.maximum(ts_l, cfg.shadow_bias),
                0.0, 1.0)
        falloff = ndotl * vis / jnp.maximum(dist2, 1e-8)
        for c in range(3):
            rad[c] = rad[c] + lpcol[pi, c] * falloff

    albedo, bgt, bgb = prm["albedo"], prm["bg_top"], prm["bg_bottom"]
    mat_f = resid["mat_f"]
    out = []
    s_bg = 0.5 * (dy + 1.0)  # sky gradient (types.background_color)
    for c in range(3):
        alb = zero
        for m in range(albedo.shape[0]):  # gather -> masked sum (no scatter)
            alb = alb + jnp.where(mat_f == float(m), albedo[m, c], 0.0)
        color = alb * rad[c]
        bg = bgb[c] + (bgt[c] - bgb[c]) * s_bg
        if spec["soft_sil"] or spec["mesh_sil"]:
            # coverage blend (shading.shade with coverage): near-silhouette
            # lanes keep the coverage chain's cotangents
            out.append(bg + cov * (color - bg))
        else:
            out.append(jnp.where(hit_f > 0.5, color, bg))
    return tuple(out)


def _tile_dispatch(spec, resid, run_variant, run_bg):
    """Per-tile class dispatch shared by the fwd and bwd kernels: the
    second-order DE chain (IFT + normal Hessian) only runs on tiles where an
    SDF hit is SELECTED; mesh-only tiles run the MT chain (+ first-order AO /
    penumbra taps); miss-only tiles run the two-term sky pullback. 8x8-pixel
    tile coherence makes these classes common. Each variant's cotangents are
    exact: on a mesh-only tile the full chain's SDF hit contributions are
    zero (every path ends in an unselected jnp.where branch), and on a miss
    tile everything but the sky term is unselected.

    With soft silhouettes the sigmoid coverage gives MISS lanes real
    cotangents (the XLA chain computes them on every lane), so the cheap
    classes are only valid where no lane has silhouette exposure: mixed
    tiles whose every lane is a mesh hit in front keep the mesh variant;
    every other tile runs the full chain.
    """
    if spec["mixed"]:
        mesh_spec = dict(spec, use_sdf=False, mixed=False, soft_sil=False)
        if spec["soft_sil"]:
            mesh_cov = jnp.all((resid["hm_f"] > 0.5)
                               & (resid["closer_f"] < 0.5))

            @pl.when(mesh_cov)
            def _():
                run_variant(mesh_spec)

            @pl.when(jnp.logical_not(mesh_cov))
            def _():
                run_variant(spec)

            return
        hit_any = jnp.any(jnp.maximum(resid["hs_f"], resid["hm_f"]) > 0.5)
        sdf_sel = jnp.any(resid["closer_f"] * resid["hs_f"] > 0.5)

        @pl.when(sdf_sel)
        def _():
            run_variant(spec)

        @pl.when(jnp.logical_not(sdf_sel) & hit_any)
        def _():
            run_variant(mesh_spec)

        @pl.when(jnp.logical_not(hit_any))
        def _():
            run_bg()

        return
    if spec["use_sdf"] and spec["soft_sil"]:
        run_variant(spec)  # every lane carries silhouette cotangents
        return
    hit_any = jnp.any(
        (resid["hs_f"] if spec["use_sdf"] else resid["hm_f"]) > 0.5)

    @pl.when(hit_any)
    def _():
        run_variant(spec)

    @pl.when(jnp.logical_not(hit_any))
    def _():
        run_bg()


# parameter packing order (small differentiable operands after the sdf ops)
_PARAM_KEYS = ("albedo", "ldir", "lcol", "ambient", "bg_top", "bg_bottom",
               "lpos", "lpcol")

# Which implementation the custom_vjp FWD RULE runs (and therefore what the
# backward sweep recomputes under jax.checkpoint): "pallas" or "xla".
# Measured on chip (mixed 1080p x 16 spp, round 4): the XLA chain wins both
# contexts — pure fwd 45 vs 75 ms / 1M rays, full fwd+bwd 6.32 s vs 6.98 s —
# because the Pallas forward's ~30-operand per-tile pipeline overhead exceeds
# its fusion gains even on sky tiles. The kernel stays available (and parity-
# gated) as the fallback-free fused variant; flip here if a future Mosaic
# lowers the operand overhead.
_FWD_RULE_IMPL = "xla"


def _param_arrays(scene, dtype):
    vals = {"albedo": scene.materials.albedo,
            "ldir": scene.lights.direction,
            "lcol": scene.lights.color,
            "ambient": scene.lights.ambient,
            "bg_top": scene.bg_top,
            "bg_bottom": scene.bg_bottom,
            "lpos": scene.lights.position,
            "lpcol": scene.lights.pos_color}
    # zero-size leaves must never become kernel operands (Mosaic cannot lower
    # 0-extent vectors) — they are skipped and get zero cotangents host-side
    keys = [k for k in _PARAM_KEYS if vals[k].size > 0]
    return keys, [jnp.asarray(vals[k], dtype) for k in keys]


def _pack_ray_cols(scene, cfg, o, d, res, aux, method: str):
    """Shared operand packing for the fused shade kernels (fwd + bwd):
    per-ray columns [o, d, corners?, residuals..., vis rows...] plus the
    residual key order. Returns (ray_cols, resid_keys, spec, n_lights)."""
    dtype = o.dtype
    spec = _spec(scene, cfg, method)
    n_lights = spec["n_dir"] + spec["n_pos"]
    have_vis = spec["shadows"] and "sh_vis" in res

    sg = jax.lax.stop_gradient
    ray_cols = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]
    if spec["use_mesh"]:
        corners = aux["corners"]  # (R, 9) selected-triangle v0/v1/v2 xyz
        ray_cols += [corners[:, k] for k in range(9)]
    resid_cols = {}
    if spec["use_sdf"]:
        resid_cols["t_bar"] = sg(res["sdf_t"]).astype(dtype)
        resid_cols["hs_f"] = res["sdf_hit"].astype(dtype)
    if spec["soft_sil"]:
        resid_cols["tmin"] = sg(res["sdf_tmin"]).astype(dtype)
    if spec["use_mesh"]:
        resid_cols["hm_f"] = res["mesh_hit"].astype(dtype)
    if spec["mixed"]:
        resid_cols["closer_f"] = aux["closer"].astype(dtype)
    resid_cols["mat_f"] = aux["mat"].astype(dtype)
    if spec["ao_mesh"] and "ao_tmesh" in res:
        resid_cols["ao_tmesh"] = sg(res["ao_tmesh"]).astype(dtype)
    resid_keys = list(resid_cols)
    ray_cols += [resid_cols[k] for k in resid_keys]
    for li in range(n_lights):
        ray_cols.append(sg(res["sh_vis"][li]).astype(dtype)
                        if have_vis else jnp.ones_like(ray_cols[0]))
    if spec["soft_diff"]:
        # penumbra argmin rows (render.geometry_residuals sh_ts)
        for li in range(n_lights):
            ray_cols.append(sg(res["sh_ts"][li]).astype(dtype))
    return ray_cols, resid_keys, spec, n_lights


def shade_fwd_pallas(scene, cfg, o, d, res, aux, method: str,
                     interpret: bool | None = None):
    """Fused FORWARD shade kernel: (R,3) linear RGB from geometry residuals.

    Same _local_shade chain the backward kernel VJPs, evaluated directly —
    with the same tile-class dispatch (sdf-selected / mesh-only / miss-only),
    so mesh and sky tiles skip the fractal DE chain entirely. This replaces
    the dense XLA reconstruct+shade forward (measured ~1.25 s of the 1080p
    mixed frame, re-paid in the backward's checkpoint recompute) with one
    VMEM-resident kernel. Values match the XLA chain up to f32 fusion
    reassociation (gated by tests + the on-chip parity check).
    """
    if interpret is None:
        interpret = _use_interpret()
    dtype = o.dtype
    ray_cols, resid_keys, spec, n_lights = _pack_ray_cols(
        scene, cfg, o, d, res, aux, method)

    tiles = []
    R = nt = None
    for c in ray_cols:
        tc, R, nt = _tileize(c)
        tiles.append(tc)
    n_ray_ops = len(tiles)
    n_geom = 6 + (9 if spec["use_mesh"] else 0)

    ops, rebuild = (_flatten_sdf(scene.sdf)
                    if spec["use_sdf"] or spec["ao_sdf"] else ([], None))
    param_keys, param_vals = _param_arrays(scene, dtype)
    small = list(ops) + param_vals
    n_small = len(small)

    def kernel(*refs):
        ray_refs = refs[:n_ray_ops]
        small_refs = refs[n_ray_ops:n_ray_ops + n_small]
        out_rgb = refs[n_ray_ops + n_small:]

        geom = [ray_refs[i][:] for i in range(n_geom)]
        off = n_geom
        resid = {k: ray_refs[off + i][:] for i, k in enumerate(resid_keys)}
        off += len(resid_keys)
        resid["vis_rows"] = [ray_refs[off + li][:] for li in range(n_lights)]
        off += n_lights
        if spec["soft_diff"]:
            resid["ts_rows"] = [ray_refs[off + li][:]
                                for li in range(n_lights)]
        small_vals = [r[:] for r in small_refs]
        ops_v = small_vals[:len(ops)]
        prm = {k: v for k, v in zip(param_keys, small_vals[len(ops):])}

        def emit(rgb):
            for c in range(3):
                out_rgb[c][...] = rgb[c]

        def run_variant(spec_v):
            emit(_local_shade(cfg, spec_v, rebuild, resid, ops_v, prm, geom))

        def run_bg():
            dy = geom[4]
            s_bg = 0.5 * (dy + 1.0)
            bgt, bgb = prm["bg_top"], prm["bg_bottom"]
            emit(tuple(bgb[c] + (bgt[c] - bgb[c]) * s_bg for c in range(3)))

        _tile_dispatch(spec, resid, run_variant, run_bg)

    small_specs = [_full_spec(x) for x in small]
    out_shapes = [jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), dtype)
                  for _ in range(3)]
    outs = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=_ray_specs(n_ray_ops) + small_specs,
        out_specs=_ray_specs(3),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*tiles, *small)
    return jnp.stack([r.reshape(-1)[:R] for r in outs], -1)


def shade_bwd_pallas(scene, cfg, o, d, res, aux, ct, method: str,
                     interpret: bool | None = None):
    """One fused backward kernel: cotangents of the static-visibility shade
    chain (sdf / mesh / mixed).

    Inputs: primal rays o/d (R,3), geometry residuals `res`, stop-grad aux
    residuals from the forward ({mat, closer?, v0..v2 corners?}), upstream
    color cotangent ct (R,3). Returns (d_sdf_ops list, d_params dict,
    d_o, d_d, d_corners (R,9) or None).
    """
    if interpret is None:
        interpret = _use_interpret()
    dtype = o.dtype
    ray_cols, resid_keys, spec, n_lights = _pack_ray_cols(
        scene, cfg, o, d, res, aux, method)
    ray_cols = ray_cols + [ct[:, 0], ct[:, 1], ct[:, 2]]

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
    n_geom = 6 + (9 if spec["use_mesh"] else 0)  # differentiable ray tiles

    ops, rebuild = (_flatten_sdf(scene.sdf)
                    if spec["use_sdf"] or spec["ao_sdf"] else ([], None))
    param_keys, param_vals = _param_arrays(scene, dtype)
    diff_small = list(ops) + param_vals
    n_small = len(diff_small)

    def kernel(*refs):
        ray_refs = refs[:n_ray_ops]
        small_refs = refs[n_ray_ops:n_ray_ops + n_small]
        out_small = refs[n_ray_ops + n_small:n_ray_ops + 2 * n_small]
        out_rays = refs[n_ray_ops + 2 * n_small:]

        geom = [ray_refs[i][:] for i in range(n_geom)]
        off = n_geom
        resid = {k: ray_refs[off + i][:] for i, k in enumerate(resid_keys)}
        off += len(resid_keys)
        resid["vis_rows"] = [ray_refs[off + li][:] for li in range(n_lights)]
        off += n_lights
        if spec["soft_diff"]:
            resid["ts_rows"] = [ray_refs[off + li][:]
                                for li in range(n_lights)]
            off += n_lights
        ctr, ctg, ctb = (ray_refs[off + i][:] for i in range(3))
        small_vals = [r[:] for r in small_refs]
        # program_id must be read at the kernel top level (inside a pl.when
        # branch it escapes the interpret-mode rewriter)
        prog_i = pl.program_id(0)

        def emit(cots):
            """Write one tile's cotangents: accumulate the small operands
            across the grid, store the per-ray blocks."""
            # int leaves (material-id arrays) pull back float0 — store zeros
            small_cots = [jnp.zeros(v.shape, dtype)
                          if c.dtype == jax.dtypes.float0 else c
                          for c, v in zip(cots[:n_small], small_vals)]
            ray_cots = cots[n_small:]
            i = prog_i
            for k in range(n_small):
                @pl.when(i == 0)
                def _(k=k):
                    out_small[k][...] = small_cots[k]

                @pl.when(i != 0)
                def _(k=k):
                    out_small[k][...] = out_small[k][...] + small_cots[k]
            for k in range(n_geom):
                out_rays[k][...] = ray_cots[k]

        def run_variant(spec_v):
            def local(*diff_args):
                ops_v = list(diff_args[:len(ops)])
                prm = {k: v for k, v in
                       zip(param_keys, diff_args[len(ops):n_small])}
                rays = diff_args[n_small:]
                # reorder: o/d first, then corner tiles (_local_shade order)
                return _local_shade(cfg, spec_v, rebuild, resid, ops_v, prm,
                                    rays)

            _, pullback = jax.vjp(local, *small_vals, *geom)
            emit(pullback((ctr, ctg, ctb)))

        def run_bg():
            """Miss-only tile: output is the sky gradient alone, so only the
            background colors and the ray direction carry cotangents — the
            IFT/Hessian/MT chains are skipped entirely."""
            def local_bg(*diff_args):
                prm = {k: v for k, v in
                       zip(param_keys, diff_args[len(ops):n_small])}
                dy = diff_args[n_small + 4]
                s_bg = 0.5 * (dy + 1.0)
                bgt, bgb = prm["bg_top"], prm["bg_bottom"]
                return tuple(bgb[c] + (bgt[c] - bgb[c]) * s_bg
                             for c in range(3))

            _, pullback = jax.vjp(local_bg, *small_vals, *geom)
            emit(pullback((ctr, ctg, ctb)))

        # Tile-class dispatch (the big backward win) — see _tile_dispatch.
        _tile_dispatch(spec, resid, run_variant, run_bg)

    small_specs = [_full_spec(x) for x in diff_small]
    out_shapes = ([jax.ShapeDtypeStruct(x.shape, dtype) for x in diff_small]
                  + [jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), dtype)
                     for _ in range(n_geom)])
    out_specs = small_specs + _ray_specs(n_geom)
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
    d_corners = jnp.stack(ray_cots[6:15], -1) if spec["use_mesh"] else None
    d_ops = small_cots[:len(ops)]
    d_params = {k: c for k, c in zip(param_keys, small_cots[len(ops):])}
    return d_ops, d_params, d_o, d_d, d_corners


def _zero_cot(x):
    """Cotangent zero matching jax's conventions (float0 for int leaves)."""
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    if hasattr(x, "dtype"):
        return np.zeros(x.shape, jax.dtypes.float0)
    return None


def _make_aux(cfg, method: str, scene, o, d, res, corners=None):
    """Stop-grad aux residuals for the fused kernels: the hit material id,
    the mixed closest-select mask, and the selected triangle's corners.

    The geometry pass already derives mat/closer while computing shadow
    origins (render.geometry_residuals aux_out) — reading them from the
    residual dict saves this (which re-runs in the backward sweep under
    jax.checkpoint) a full DE re-evaluation and a recompute_hit per ray.
    When shadows and AO are both off they are absent and get recomputed.

    corners: the (R, 9) selected-corner gather when the caller already did
    it (render.shade_with_residuals routes it through the per-triangle
    corner matrix so its transpose scatters by triangle, not vertex —
    stop-gradded here; the DIFFERENTIABLE copy is the custom_vjp argument).
    """
    from tpu_ray.kernels import moller_trumbore as mt
    from tpu_ray.sdf.primitives import sdf_distance_and_mat

    sg = jax.lax.stop_gradient
    spec = _spec(scene, cfg, method)
    aux = {}
    have_saved = "hit_mat" in res
    if spec["use_sdf"] and not have_saved:
        t_eff = res["sdf_t"]
        if spec["soft_sil"]:
            # soft silhouettes sample the material at the blended hit point
            # t_eff = where(hit, t, tmin) (render._sdf_from_res)
            t_eff = jnp.where(res["sdf_hit"], t_eff, res["sdf_tmin"])
        p_bar = sg(o) + sg(t_eff)[..., None] * sg(d)
        _, mat_s = sdf_distance_and_mat(sg(scene.sdf), p_bar)
    if spec["use_mesh"]:
        tri = res["mesh_tri"]
        idx = jnp.clip(tri, 0, max(scene.mesh.num_tris - 1, 0))
        if corners is not None:
            aux["corners"] = corners  # (R, 9)
        else:
            triv = scene.mesh.tris[idx]  # (R, 3)
            v0 = sg(scene.mesh.verts)[triv[..., 0]]
            v1 = sg(scene.mesh.verts)[triv[..., 1]]
            v2 = sg(scene.mesh.verts)[triv[..., 2]]
            aux["corners"] = jnp.concatenate([v0, v1, v2], axis=-1)
        if not have_saved:
            mat_m = jnp.where(res["mesh_hit"], scene.mesh.tri_mat[idx], 0)
    if have_saved:
        aux["mat"] = res["hit_mat"]
        if spec["mixed"]:
            aux["closer"] = res["hit_closer"].astype(o.dtype)
    elif spec["mixed"]:
        tm_bar, _u, _v, _n = mt.recompute_hit(sg(scene.mesh), sg(o),
                                              sg(d), tri)
        ts_eff = jnp.where(res["sdf_hit"], sg(res["sdf_t"]), _BIG)
        tm_eff = jnp.where(res["mesh_hit"], tm_bar, _BIG)
        aux["closer"] = (ts_eff <= tm_eff).astype(o.dtype)
        aux["mat"] = jnp.where(aux["closer"] > 0.5, mat_s, mat_m)
    elif spec["use_sdf"]:
        aux["mat"] = mat_s
    else:
        aux["mat"] = mat_m
    return sg(aux)


def apply_fwd_kernel(scene, cfg, o, d, res, method: str,
                     interpret: bool | None = None):
    """Run the fused FORWARD shade kernel directly (aux derived here) —
    the entry tests and the on-chip parity gate use to exercise the kernel
    regardless of which implementation _FWD_RULE_IMPL selects."""
    aux = _make_aux(cfg, method, scene, o, d, res)
    return shade_fwd_pallas(scene, cfg, o, d, res, aux, method,
                            interpret=interpret)


def make_shade_sdf_vjp(cfg, method: str, xla_shade):
    """custom_vjp wrapper: XLA forward, Pallas fused backward.

    xla_shade(scene, cfg, o, d, res, method) is the shade body — passed in
    to avoid a circular import with render.py. The fused Pallas FORWARD
    (shade_fwd_pallas) is available behind _FWD_RULE_IMPL; measured slower
    than the XLA chain on chip (see the flag note), so XLA is the default
    for both the primal and the fwd rule.
    """

    # `corners` is the differentiable (R, 9) selected-corner gather done by
    # the CALLER through the per-triangle corner matrix (render.corner_matrix
    # / verts3): d_corners then transposes to an R-row scatter BY TRIANGLE
    # per block plus one per-frame triangle->vertex conversion — measured
    # 2.74 -> 0.99 ms per 64k block vs scattering straight to vertices here.
    # All vertex gradient flows through it; scene.mesh.verts gets a zero
    # cotangent from this vjp. None for mesh-less chains.

    @jax.custom_vjp
    def f(scene, o, d, corners, res, mesh_rows):
        # pure-forward path (renders, the fwd half of value_and_grad);
        # `corners` is unused by the XLA chain (mesh_rows already carries
        # the packed rows), so its gather is DCE'd outside differentiation.
        # mesh_rows rides as an explicit arg (closing over a traced array in
        # a custom_vjp would break) with a DECLARED zero cotangent — all
        # vertex gradient flows through `corners`.
        return xla_shade(scene, cfg, o, d, res, method, mesh_rows=mesh_rows)

    def fwd(scene, o, d, corners, res, mesh_rows):
        # differentiation path: under jax.checkpoint this fwd IS the
        # backward-sweep recompute, so it uses the cheaper-to-recompute
        # variant (see _FWD_RULE_IMPL); values agree to f32 reassociation
        aux = _make_aux(cfg, method, scene, o, d, res,
                        corners=jax.lax.stop_gradient(corners)
                        if corners is not None else None)
        if _FWD_RULE_IMPL == "pallas":
            out = shade_fwd_pallas(scene, cfg, o, d, res, aux, method)
        else:
            out = xla_shade(scene, cfg, o, d, res, method,
                            mesh_rows=jax.lax.stop_gradient(mesh_rows)
                            if mesh_rows is not None else None)
        return out, (scene, o, d, res, aux, mesh_rows)

    def bwd(saved, ct):
        scene, o, d, res, aux, mesh_rows = saved
        spec = _spec(scene, cfg, method)
        d_ops, d_params, d_o, d_d, d_corners = shade_bwd_pallas(
            scene, cfg, o, d, res, aux, ct, method)

        # scatter the small cotangents back into a full scene-cotangent tree
        d_scene = jax.tree_util.tree_map(_zero_cot, scene)
        if spec["use_sdf"]:
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
            d_scene = d_scene.replace(
                sdf=jax.tree_util.tree_unflatten(sdf_treedef, d_sdf_leaves))

        zeros = lambda k, ref: d_params.get(k, jnp.zeros_like(ref))
        d_scene = d_scene.replace(
            materials=d_scene.materials.replace(
                albedo=zeros("albedo", scene.materials.albedo)),
            lights=d_scene.lights.replace(
                direction=zeros("ldir", scene.lights.direction),
                color=zeros("lcol", scene.lights.color),
                ambient=zeros("ambient", scene.lights.ambient),
                position=zeros("lpos", scene.lights.position),
                pos_color=zeros("lpcol", scene.lights.pos_color)),
            bg_top=zeros("bg_top", scene.bg_top),
            bg_bottom=zeros("bg_bottom", scene.bg_bottom))

        # the per-ray corner cotangent goes back through the `corners`
        # argument: XLA transposes the caller's verts3[idx] gather into the
        # by-triangle scatter, and corner_matrix's transpose converts
        # triangle->vertex once per frame (render.shade_with_residuals)
        d_corners_arg = (d_corners if spec["use_mesh"] and d_corners is not None
                         else None)
        d_res = jax.tree_util.tree_map(_zero_cot, res)
        d_rows = None if mesh_rows is None else jnp.zeros_like(mesh_rows)
        return d_scene, d_o, d_d, d_corners_arg, d_res, d_rows

    f.defvjp(fwd, bwd)
    return f
