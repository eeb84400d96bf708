"""The render core: fused ray-gen → intersect → shade → AA accumulation.

TPU-native equivalent of the reference's per-pixel tile kernel (SURVEY.md §2
#13, reference trace.cpp TraceTile): instead of a scalar loop over pixels and
samples, the whole sample grid is flattened into one ray batch and every stage
is a batched, branch-free op — XLA fuses the chain; the Pallas variants in
tpu_ray/kernels/ replace the hottest configurations. Supersampling (SURVEY.md §2
#12) folds the sample dimension into the ray batch and mean-reduces in-device,
i.e. "fused differentiable accumulation" per the north star.

Ray blocks are processed through `lax.map` when cfg.block_size is set — the
TPU analog of the reference's tile scheduler granule (memory bound, not
thread scheduling; device-level parallelism lives in tpu_ray/dist/sharding.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_ray.core.math3d import clamp01, dot
from tpu_ray.kernels import moller_trumbore as mt
from tpu_ray.kernels.sphere_trace import (make_ift_attach, make_sphere_tracer,
                                      march, surface_normal)
from tpu_ray.render import shading
from tpu_ray.render.camera import generate_rays
from tpu_ray.scene.types import Scene
from tpu_ray.sdf.primitives import sdf_distance, sdf_distance_and_mat
from tpu_ray.utils.config import RenderConfig

_IFT_ATTACH = make_ift_attach(sdf_distance)

BIG = 1e10

# HBM budget for skipping the backward-sweep shade recompute (see
# render_pixels_flat): the fused-backward custom_vjp saves ~90 B/ray of
# residuals; up to this total we keep them resident instead of
# rematerializing the shade forward. 4 GB leaves >2/3 of a v5e chip's HBM
# for the frame, accel and transients at 1080p x 16 spp (~3 GB saved).
_NO_REMAT_BUDGET_BYTES = 4 << 30


def _saved_bytes_per_ray(scene: Scene, cfg: RenderConfig, method: str) -> int:
    """Estimated bytes/ray the fused-backward custom_vjp saves (o, d, res,
    aux) — used to decide whether the no-remat backward fits HBM."""
    n = 24  # o + d
    if _use_sdf(scene, method):
        n += 4 + 1 + 4 + 4 + 4  # sdf_t, sdf_hit, sdf_tmin, hit_mat, aux mat
    if _use_mesh(scene, method):
        n += 4 + 1 + 36  # mesh_tri, mesh_hit, corners
    if method == "mixed":
        n += 1 + 4  # hit_closer, aux closer
    n_sh = max(1, scene.lights.num_shadowed)
    n += 4 * n_sh  # sh_vis rows
    if cfg.shadow == "soft" and cfg.diff_vis and _use_sdf(scene, method):
        n += 4 * n_sh  # sh_ts penumbra argmin rows
    return n


def resolve_method(scene: Scene, cfg: RenderConfig) -> str:
    if cfg.method != "auto":
        return cfg.method
    if scene.has_mesh and scene.has_sdf:
        return "mixed"
    if scene.has_mesh:
        return "mesh_brute" if scene.mesh.num_tris <= 4096 else "mesh_grid"
    return "sdf"


# ---------------------------------------------------------------------------
# Sampling (deterministic stratified grid — bit-identical across runs/shardings)
# ---------------------------------------------------------------------------

def sample_offsets(cfg: RenderConfig, dtype=jnp.float32):
    """(spp, 2) stratified subpixel offsets in [0,1): cell centers of a k×k grid."""
    k = cfg.spp_side
    centers = (jnp.arange(k, dtype=dtype) + 0.5) / k
    ox, oy = jnp.meshgrid(centers, centers, indexing="xy")
    return jnp.stack([ox.ravel(), oy.ravel()], axis=-1)


def pixel_sample_coords(cfg: RenderConfig, dtype=jnp.float32):
    """Sample positions for every (pixel, sample): two (H, W, spp) arrays.

    Deterministic stratified centers by default; with cfg.jitter_seed each
    sample is uniformly jittered inside its stratum (seeded, reproducible).
    """
    xs = jnp.arange(cfg.width, dtype=dtype)
    ys = jnp.arange(cfg.height, dtype=dtype)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")  # (H, W)
    if cfg.jitter_seed is None:
        off = sample_offsets(cfg, dtype)  # (spp, 2)
        sx = px[..., None] + off[:, 0]
        sy = py[..., None] + off[:, 1]
        return sx, sy
    k = cfg.spp_side
    key = jax.random.PRNGKey(cfg.jitter_seed)
    u = jax.random.uniform(key, (cfg.height, cfg.width, cfg.spp, 2), dtype)
    cell = jnp.arange(cfg.spp) % k, jnp.arange(cfg.spp) // k
    sx = px[..., None] + (cell[0] + u[..., 0]) / k
    sy = py[..., None] + (cell[1] + u[..., 1]) / k
    return sx, sy


def _block_order_perm(cfg: RenderConfig):
    """Pixel permutation: row-major -> 8x8 square blocks in MORTON order
    over the block grid (None if the image is not divisible into 8x8
    blocks; strips are then used as-is).

    Why Morton and not block-row-major: a kernel ray tile holds
    TILE_RAYS/spp pixels — at 16 spp that is 2 blocks, but at 1 spp it is
    32 blocks, which in row-major order form a 256x8 strip whose frustum
    culls almost nothing. Any aligned run of 2^k Morton-consecutive blocks
    is a compact ~square region (32 blocks ≈ 64x32 px), so the packet
    kernel's per-tile candidate cull stays sharp at every spp (validated on
    chip — see BASELINE.md round-4 milestones; spp=16 configs unchanged — 2
    consecutive blocks are adjacent either way)."""
    if cfg.height % 8 or cfg.width % 8:
        return None
    import numpy as np

    hb, wb = cfg.height // 8, cfg.width // 8
    by, bx = np.meshgrid(np.arange(hb), np.arange(wb), indexing="ij")

    def spread(v):  # interleave bits: 16-bit coord -> even bit positions
        v = v.astype(np.uint64)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x33333333)
        v = (v | (v << 1)) & np.uint64(0x55555555)
        return v

    morton = (spread(by) << np.uint64(1)) | spread(bx)
    border = np.argsort(morton.ravel(), kind="stable")  # block visit order
    idx = np.arange(cfg.height * cfg.width).reshape(cfg.height, cfg.width)
    blocks = idx.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(
        hb * wb, 64)
    return jnp.asarray(blocks[border].reshape(-1), jnp.int32)


# ---------------------------------------------------------------------------
# Split rendering: geometry pass (stop-grad, Pallas fast paths, run ONCE) +
# differentiable reconstruction/shading from compact per-ray residuals.
#
# This is the residual-emitting forward / hand-derived backward structure
# (BASELINE.json north_star; VERDICT r1 item 1): every expensive fixed-point
# solver — the sphere-trace march, mesh intersection, shadow marches and
# any-hit queries — runs exactly once, outside the autodiff region, and emits
# a few scalars per ray. The differentiable shade pass reconstructs the image
# from those residuals with a handful of DE evaluations (IFT attach for t,
# one DE VJP for the normal, one DE eval per soft-shadow light), so the
# backward sweep costs ~the shade pass, not a re-march — rematerialization
# only ever recomputes the cheap chain.
# ---------------------------------------------------------------------------

def use_pallas(cfg: RenderConfig, dtype) -> bool:
    if cfg.pallas == "off":
        return False
    if cfg.pallas == "on":
        return True
    return jax.default_backend() == "tpu" and dtype == jnp.float32


def _use_sdf(scene: Scene, method: str) -> bool:
    return method in ("sdf", "mixed") and scene.has_sdf


def _use_mesh(scene: Scene, method: str) -> bool:
    return method in ("mesh_brute", "mesh_grid", "mixed") and scene.has_mesh


def _march_forward(scene: Scene, cfg: RenderConfig, o, d):
    """Non-differentiable primary march (pallas or jnp) -> (t, hit, tmin)."""
    if use_pallas(cfg, o.dtype):
        from tpu_ray.kernels.pallas_sdf import march_pallas

        t, hit, _steps, tmin = march_pallas(
            scene.sdf, o, d, t0=0.0, max_steps=cfg.max_steps, eps=cfg.eps,
            t_far=cfg.t_far)
    else:
        t, hit, _steps, tmin = march(
            sdf_distance, scene.sdf, o, d, t0=0.0, max_steps=cfg.max_steps,
            eps=cfg.eps, t_far=cfg.t_far)
    return t, hit, tmin


def _mesh_intersect(scene: Scene, cfg: RenderConfig, o, d, method: str,
                    t_init=None):
    """Non-differentiable mesh closest-hit -> (tri, hit).

    t_init: optional per-ray best-t seed (mixed scenes pass the SDF hit t so
    the packet kernel slab-culls every chunk behind it; a mesh hit farther
    than the SDF hit would lose the closest-hit combine anyway)."""
    if scene.ring is not None:
        from tpu_ray.dist.scene_shard import intersect_ring_packet

        res = intersect_ring_packet(scene.ring, o, d, t_max=cfg.t_far,
                                    sort_origin=o[0])
        return jax.lax.stop_gradient(res.tri), res.hit
    grid_path = method == "mesh_grid" or (
        method == "mixed" and (scene.grid is not None or scene.packet is not None))
    if grid_path and scene.packet is not None and use_pallas(cfg, o.dtype):
        from tpu_ray.kernels.pallas_mt import intersect_packet_parts

        # primary rays share the camera origin -> front-to-back chunk order
        res = intersect_packet_parts(scene.packet, o, d, t_max=cfg.t_far,
                                     sort_origin=o[0], t_init=t_init)
    elif grid_path and scene.grid is not None:
        from tpu_ray.kernels.dda import intersect_grid

        res = intersect_grid(scene.mesh, scene.grid, o, d, t_max=cfg.t_far)
    else:
        # also the method="mesh_grid" fallback when NO accel is usable (e.g.
        # realize_scene dropped a host-built grid it cannot refit in-jit, or
        # pallas is off for a packet-only scene): brute MT stays correct
        res = mt.intersect_brute(scene.mesh, o, d, t_max=cfg.t_far)
    return jax.lax.stop_gradient(res.tri), res.hit


def _mesh_closest_t(scene: Scene, cfg: RenderConfig, o, d, t_max):
    """Stop-grad closest mesh hit distance along per-ray dirs within t_max
    (BIG on miss) — the mesh term of the DF-AO taps (make_ao)."""
    if scene.ring is not None:
        from tpu_ray.dist.scene_shard import intersect_ring_packet

        res = intersect_ring_packet(scene.ring, o, d, t_max=t_max)
    elif scene.packet is not None and use_pallas(cfg, o.dtype):
        from tpu_ray.kernels.pallas_mt import intersect_packet_parts

        res = intersect_packet_parts(scene.packet, o, d, t_max=t_max)
    elif scene.grid is not None:
        from tpu_ray.kernels.dda import intersect_grid

        res = intersect_grid(scene.mesh, scene.grid, o, d, t_max=t_max)
    else:
        res = mt.intersect_brute(scene.mesh, o, d, t_max=t_max)
    return jax.lax.stop_gradient(jnp.where(res.hit, res.t, mt.BIG))


def _mesh_any_hit_generic(scene: Scene, cfg: RenderConfig, p, d, t_max,
                          sort, method: str, t_init=None):
    """Mesh occlusion query for shadow rays. `d` may be unnormalized (point
    lights pass the surface->light segment with t_max=1 — MT/DDA are t-scale
    invariant). sort: ("dir", v) orders packet supers by ascending projection
    on v (directional lights: blockers nearest the surfaces first);
    ("origin", pt) orders by distance to pt (point lights). t_init: 0-seed
    for rays whose shadow the SDF march already decided (skips their work)."""
    if scene.ring is not None:
        from tpu_ray.dist.scene_shard import intersect_ring_packet

        kind, v = sort
        kw = {"sort_dir": v} if kind == "dir" else {"sort_origin": v}
        return intersect_ring_packet(scene.ring, p, d, t_max=t_max,
                                     any_hit=True, **kw).hit
    if (scene.packet is not None and method in ("mesh_grid", "mixed")
            and use_pallas(cfg, p.dtype)):
        from tpu_ray.kernels.pallas_mt import intersect_packet_parts

        kind, v = sort
        kw = {"sort_dir": v} if kind == "dir" else {"sort_origin": v}
        return intersect_packet_parts(scene.packet, p, d, t_max=t_max,
                                      any_hit=True, t_init=t_init, **kw).hit
    if scene.grid is not None and method in ("mesh_grid", "mixed"):
        from tpu_ray.kernels.dda import any_hit_grid

        return any_hit_grid(scene.mesh, scene.grid, p, d, t_max=t_max)
    return mt.any_hit_brute(scene.mesh, p, d, t_max=t_max)


def _sdf_from_res(scene: Scene, cfg: RenderConfig, o, d, res, lite=False):
    """Differentiable SDF hit state from march residuals.

    lite=True: values-only variant for the stop-gradient geometry pass (the
    IFT attach is a value identity — its value IS t_bar — so the attach's
    DE evaluation and denominator VJP are skipped; ~4 DE-equivalents per ray
    saved on the 1080p frame). Gradient callers must keep lite=False.
    """
    t_bar, hit, tmin = res["sdf_t"], res["sdf_hit"], res["sdf_tmin"]
    t = t_bar if lite else _IFT_ATTACH(scene.sdf, o, d, t_bar,
                                       hit.astype(o.dtype))
    if cfg.soft_silhouette > 0.0:
        if lite:  # coverage unused by the geometry pass; skip its DE eval
            cov = hit.astype(o.dtype)
        else:
            # differentiable coverage: re-evaluate the DE at the closest-
            # approach point (tmin, a stop-gradient sampling location) WITH
            # gradients; a sigmoid of the miss distance smooths the
            # visibility step so silhouette motion (camera pose, object
            # translation) has gradients
            p_min = o + tmin[..., None] * d
            d_min = sdf_distance(scene.sdf, p_min)
            cov_miss = jax.nn.sigmoid(-d_min / cfg.soft_silhouette)
            cov = jnp.where(hit, 1.0, cov_miss).astype(o.dtype)
        t_eff = jnp.where(hit, t, tmin)
    else:
        cov = hit.astype(o.dtype)
        t_eff = t
    p = o + t_eff[..., None] * d
    n = surface_normal(sdf_distance, scene.sdf, p)
    _, mat = sdf_distance_and_mat(scene.sdf, jax.lax.stop_gradient(p))
    mat = jax.lax.stop_gradient(mat)
    return t, hit, p, n, mat, cov


def _mesh_from_res(scene: Scene, cfg: RenderConfig, o, d, res,
                   mesh_rows=None, lite=False):
    """Differentiable mesh hit state from the saved triangle index.

    mesh_rows: optional packed (T, 10) per-triangle table (mesh_table) —
    ONE row gather replaces the five separate gathers (tris + 3 verts +
    tri_mat), which dominate this reconstruct's cost on chip (gather cost is
    ~per row): measured 1.13 s -> 0.68 s for the 1080p mixed reconstruct.

    With cfg.mesh_silhouette > 0, coverage ramps 0 -> 1 over that band width
    from the nearest triangle edge (mt.edge_margin_corners) — the mesh
    analog of soft_silhouette: near-edge hit pixels blend toward background,
    so vertex/pose gradients move occlusion edges (SURVEY.md §7 hard part 3,
    VERDICT r4 item 3). lite=True (geometry pass) skips the margin
    arithmetic — coverage is unused there."""
    tri, hit = res["mesh_tri"], res["mesh_hit"]
    if mesh_rows is not None:
        rows = mesh_rows[jnp.clip(tri, 0, mesh_rows.shape[0] - 1)]  # (R, 10)
        v0, v1, v2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
        t, u, v, n = mt.recompute_hit_corners(v0, v1, v2, o, d)
        mat = jnp.where(hit, rows[:, 9].astype(jnp.int32), 0)
    else:
        idx = jnp.clip(tri, 0, max(scene.mesh.num_tris - 1, 0))
        triv = scene.mesh.tris[idx]
        v0 = scene.mesh.verts[triv[..., 0]]
        v1 = scene.mesh.verts[triv[..., 1]]
        v2 = scene.mesh.verts[triv[..., 2]]
        t, u, v, n = mt.recompute_hit_corners(v0, v1, v2, o, d)
        mat = jnp.where(hit, scene.mesh.tri_mat[jnp.clip(tri, 0, None)], 0)
    if cfg.mesh_silhouette > 0.0 and not lite:
        margin = mt.edge_margin_corners(v0, v1, v2, u, v)
        cov = jnp.where(hit, clamp01(margin / cfg.mesh_silhouette),
                        jnp.zeros_like(margin))
    else:
        cov = hit.astype(o.dtype)
    t = jnp.where(hit, t, BIG)
    p = o + t[..., None] * d
    return t, hit, p, n, mat, cov


def reconstruct_hits(scene: Scene, cfg: RenderConfig, o, d, res, method: str,
                     aux_out: dict | None = None, lite: bool = False,
                     mesh_rows=None):
    """Differentiable (t, hit, p, n, mat, cov) from geometry residuals.

    aux_out: optional dict that receives stop-gradient by-products the fused
    Pallas backward needs as residuals (hit material id; the mixed
    closest-select mask) — computed here anyway, so emitting them from the
    geometry pass saves the custom-VJP forward a full DE re-evaluation and a
    recompute_hit per ray (measured 1.36 -> ~0.4 ms per 64k block on chip).
    lite: values-only reconstruction for stop-gradient callers (see
    _sdf_from_res); identical values, no IFT/coverage DE machinery.
    """
    if method == "sdf":
        out = _sdf_from_res(scene, cfg, o, d, res, lite=lite)
        if aux_out is not None:
            aux_out["mat"] = out[4]
        return out
    if method in ("mesh_brute", "mesh_grid"):
        out = _mesh_from_res(scene, cfg, o, d, res, mesh_rows=mesh_rows,
                             lite=lite)
        if aux_out is not None:
            aux_out["mat"] = out[4]
        return out
    if method == "mixed":
        ts, hs, ps, ns, ms, cs = _sdf_from_res(scene, cfg, o, d, res, lite=lite)
        tm, hm, pm, nm, mm, cm = _mesh_from_res(scene, cfg, o, d, res,
                                                mesh_rows=mesh_rows, lite=lite)
        ts_eff = jnp.where(hs, ts, BIG)
        tm_eff = jnp.where(hm, tm, BIG)
        sdf_closer = ts_eff <= tm_eff
        t = jnp.where(sdf_closer, ts, tm)
        hit = hs | hm
        p = jnp.where(sdf_closer[..., None], ps, pm)
        n = jnp.where(sdf_closer[..., None], ns, nm)
        mat = jnp.where(sdf_closer, ms, mm)
        # soft SDF coverage applies only where the mesh does not hit in front
        cov = jnp.where(hm & (~sdf_closer), cm, jnp.maximum(cs, cm))
        if aux_out is not None:
            aux_out["mat"] = mat
            aux_out["closer"] = sdf_closer
        return t, hit, p, n, mat, cov
    raise ValueError(f"unknown method {method!r}")


def geometry_residuals(scene: Scene, cfg: RenderConfig, o, d, method: str,
                       mesh_rows=None):
    """Stop-gradient geometry pass -> dict of compact per-ray residuals.

    Keys (all leading shape (R,) unless noted):
      sdf_t, sdf_hit, sdf_tmin     — primary march (if the SDF is traced)
      mesh_tri, mesh_hit           — mesh closest-hit (if the mesh is traced)
      sh_vis (L, R)                — static shadow visibility product per
                                     light: hard/soft SDF march (unless
                                     recomputed differentiably) x mesh any-hit
      sh_ts (L, R)                 — soft-shadow penumbra argmin t (only when
                                     shadow == "soft" and diff_vis)
    """
    scene = jax.lax.stop_gradient(scene)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    res = {}
    t_seed = None
    if _use_sdf(scene, method):
        t, hit, tmin = _march_forward(scene, cfg, o, d)
        res["sdf_t"], res["sdf_hit"], res["sdf_tmin"] = t, hit, tmin
        if method == "mixed":
            # cross-method cull: the SDF hit bounds the mesh search — a mesh
            # hit behind it loses the closest-hit combine, so the packet
            # kernel can slab-cull every chunk beyond it (t_init seeding)
            t_seed = jnp.where(hit, t, jnp.full_like(t, cfg.t_far))
    if _use_mesh(scene, method):
        tri, mhit = _mesh_intersect(scene, cfg, o, d, method, t_init=t_seed)
        res["mesh_tri"], res["mesh_hit"] = tri, mhit

    ao_mesh = (cfg.ao == "sdf5" and _use_mesh(scene, method)
               and scene.has_mesh)
    if cfg.shadow != "none" or ao_mesh:
        # shadow/AO-ray origins: the selected hit point offset along the
        # (ray-facing) normal — same values the shade pass will use. The
        # reconstruct's by-products (hit material, mixed closest-select) are
        # emitted as residuals so the fused Pallas backward's forward pass
        # never re-derives them (pallas_shade.make_shade_sdf_vjp fwd).
        aux = {}
        _t, _hit, p, n, _mat, _cov = reconstruct_hits(
            scene, cfg, o, d, res, method, aux_out=aux, lite=True,
            mesh_rows=jax.lax.stop_gradient(mesh_rows)
            if mesh_rows is not None else None)
        res["hit_mat"] = aux["mat"]
        if "closer" in aux:
            res["hit_closer"] = aux["closer"]
        # (A hit-state value cache for the pure-forward shade was tried in
        # round 4 and reverted: XLA already CSEs this lite reconstruct with
        # the shade pass's reconstruct inside the same jit, so caching t/n
        # as residuals measured as a no-op on the 1080p frame.)
        n = jnp.where(dot(n, d)[..., None] > 0.0, -n, n)
        p_off = p + cfg.shadow_bias * n
        # Miss lanes: without soft silhouettes their shadow/AO values never
        # reach the image (shade selects the background), but their hit point
        # o + BIG*d is a garbage origin that blows up the packet kernel's
        # tile-interval candidate cull (one miss lane in an (8,128) tile
        # makes the conservative frustum span the whole scene). Park them at
        # the camera and give the marches a zero budget below. With soft
        # silhouettes the reconstruct already parks misses at t_min (sane).
        live = None
        if cfg.soft_silhouette <= 0.0:
            live = _hit
            p_off = jnp.where(_hit[..., None], p_off, o)
    if ao_mesh:
        # mesh term of the DF-AO taps: closest hit along the shade normal
        # within the tap range (static occlusion, like sh_vis)
        cut = 5.0 * cfg.ao_step + cfg.shadow_bias
        tm = _mesh_closest_t(scene, cfg, p_off, n, cut)
        res["ao_tmesh"] = tm + cfg.shadow_bias  # distance measured from p
    if cfg.shadow != "none":
        soft_diff = cfg.shadow == "soft" and cfg.diff_vis and _use_sdf(scene, method)
        vis_rows, ts_rows = [], []

        def one_light(l_dir, t_far_rays, mesh_dir, mesh_tmax, mesh_sort):
            """Shadow residuals for one light: (static_vis, soft_argmin_t)."""
            vis = jnp.ones(p.shape[:-1], p.dtype)
            ts = jnp.full(p.shape[:-1], cfg.shadow_bias, p.dtype)
            if live is not None:
                # zero march budget for miss lanes (their vis is never read)
                base_far = cfg.t_far if t_far_rays is None else t_far_rays
                t_far_rays = jnp.where(live, base_far, 0.0).astype(p.dtype)
            if _use_sdf(scene, method):
                if use_pallas(cfg, p.dtype):
                    from tpu_ray.kernels.pallas_sdf import shadow_pallas

                    v, ts_p = shadow_pallas(
                        scene.sdf, p_off, l_dir, soft=(cfg.shadow == "soft"),
                        eps=cfg.eps, t_far=cfg.t_far, steps=cfg.shadow_steps,
                        bias=cfg.shadow_bias, soft_k=cfg.soft_k,
                        t_far_rays=t_far_rays)
                elif cfg.shadow == "soft":
                    v, ts_p = shading.sdf_soft_shadow_argmin(
                        sdf_distance, scene.sdf, p_off, l_dir, cfg,
                        t_far=t_far_rays)
                else:
                    v = shading.sdf_hard_shadow(sdf_distance, scene.sdf, p_off,
                                                l_dir, cfg, t_far=t_far_rays)
                    ts_p = ts
                if soft_diff:
                    ts = ts_p  # penumbra recomputed differentiably in shade
                else:
                    vis = vis * v
            if _use_mesh(scene, method):
                seed = None
                dead = None
                if (cfg.shadow == "hard" and _use_sdf(scene, method)
                        and not soft_diff):
                    # the SDF march already blocked these rays: 0-seed skips
                    # all their packet work (visibility product is 0 anyway)
                    dead = vis <= 0.0
                if live is not None:
                    dead = ~live if dead is None else (dead | ~live)
                if dead is not None:
                    seed = jnp.where(dead, 0.0,
                                     jnp.full_like(vis, mesh_tmax))
                blocked = _mesh_any_hit_generic(scene, cfg, p_off, mesh_dir,
                                                mesh_tmax, mesh_sort, method,
                                                t_init=seed)
                vis = vis * (1.0 - blocked.astype(p.dtype))
            return vis, ts

        from tpu_ray.core.math3d import normalize

        for li in range(scene.lights.direction.shape[0]):
            l_dir = jnp.broadcast_to(normalize(scene.lights.direction[li]), p.shape)
            vis, ts = one_light(l_dir, None, l_dir, cfg.t_far,
                                ("dir", scene.lights.direction[li]))
            vis_rows.append(vis); ts_rows.append(ts)
        for pi in range(scene.lights.position.shape[0]):
            # point light: per-ray direction, march clamped at the light
            # distance; the mesh any-hit uses the UNNORMALIZED segment
            # p_off -> light with t_max = 1 (MT is t-scale invariant), so
            # geometry beyond the light cannot occlude
            lpos = scene.lights.position[pi]
            lvec = lpos - p_off
            dist = jnp.sqrt(jnp.maximum(jnp.sum(lvec * lvec, -1), 1e-12))
            l_dir = lvec / dist[..., None]
            vis, ts = one_light(l_dir, dist, lvec, 1.0, ("origin", lpos))
            vis_rows.append(vis); ts_rows.append(ts)

        res["sh_vis"] = jnp.stack(vis_rows)
        if soft_diff:
            res["sh_ts"] = jnp.stack(ts_rows)
    return res


def make_residual_occluder(scene: Scene, cfg: RenderConfig, res, method: str):
    """Shadow visibility callback for shade() reading geometry residuals.

    Static factors (hard shadows, mesh any-hit, soft when not diff_vis) come
    straight from sh_vis; the differentiable soft-shadow penumbra is
    recomputed from ONE DE evaluation at the saved argmin parameter sh_ts —
    exactly the march's min value (shading.sdf_soft_shadow_argmin)."""
    if cfg.shadow == "none":
        return None
    soft_diff = cfg.shadow == "soft" and cfg.diff_vis and _use_sdf(scene, method)

    def occluder(p, l_dir, li):
        vis = res["sh_vis"][li]
        if soft_diff:
            ts = res["sh_ts"][li]
            dd = sdf_distance(scene.sdf, p + ts[..., None] * l_dir)
            s = clamp01(cfg.soft_k * dd / jnp.maximum(ts, cfg.shadow_bias))
            vis = vis * s
        return vis

    return occluder


def make_ao(scene: Scene, cfg: RenderConfig, res, method: str):
    """5-tap DF AO callback. The SDF term is gated by scene CONTENT (an SDF
    anywhere in the scene occludes); the mesh term by the ao_tmesh residual
    (present when the traced method includes a non-empty mesh — see
    geometry_residuals). Mixed scenes get both: mesh receives AO and casts
    onto SDF surfaces and vice versa."""
    if cfg.ao != "sdf5":
        return None
    t_mesh = res.get("ao_tmesh")
    if not scene.has_sdf and t_mesh is None:
        return None
    sdf = scene.sdf if scene.has_sdf else None
    return lambda p, n: shading.sdf_ambient_occlusion(
        sdf_distance, sdf, p, n, cfg, t_mesh=t_mesh)


# ---------------------------------------------------------------------------
# Fused render
# ---------------------------------------------------------------------------

def trace_rays(scene: Scene, cfg: RenderConfig, o, d, method: str):
    """Closest-hit dispatch -> (t, hit, p, n, mat, cov). Static method
    selection; composition of the geometry pass and the differentiable
    reconstruction (single-pass API kept for stats/diagnostics)."""
    res = geometry_residuals(scene, cfg, o, d, method)
    return reconstruct_hits(scene, cfg, o, d, res, method)


def shade_with_residuals(scene: Scene, cfg: RenderConfig, o, d, res,
                         method: str, mesh_rows=None) -> jnp.ndarray:
    """Differentiable shade of a flat ray batch from geometry residuals.

    On TPU f32 the backward pass is the hand-written fused Pallas kernel
    (kernels/pallas_shade.py) for every shipped shade chain — static
    visibility AND the differentiable soft-shadow penumbra / soft-silhouette
    modes — the forward value is the identical XLA computation either way.

    mesh_rows: optional (T, 10) packed per-triangle table (mesh_table),
    hoisted per frame by render_pixels_flat. Two wins ride on it: (a) the
    reconstruct's five per-triangle gathers collapse to one row gather
    (gather cost is ~per row on TPU); (b) the vertex-gradient scatter
    factors through triangles — per ray block the corners gather transposes
    to ONE (R -> T) row scatter (2.74 -> 0.99 ms/block measured), and the
    (T -> V) conversion happens once per frame in mesh_table's own
    transpose."""
    from tpu_ray.kernels import pallas_shade

    if pallas_shade.applicable(scene, cfg, method, o.dtype):
        corners = None
        rows_tbl = None
        if _use_mesh(scene, method) and scene.has_mesh:
            rows_tbl = (mesh_rows if mesh_rows is not None
                        else mesh_table(scene.mesh))
            idx = jnp.clip(res["mesh_tri"], 0, rows_tbl.shape[0] - 1)
            corners = rows_tbl[idx][:, 0:9]  # (R, 9) differentiable
        f = pallas_shade.make_shade_sdf_vjp(cfg, method, _shade_xla)
        return f(scene, o, d, corners, res, rows_tbl)
    return _shade_xla(scene, cfg, o, d, res, method, mesh_rows=mesh_rows)


def mesh_table(mesh) -> jnp.ndarray:
    """(T, 10) differentiable packed per-triangle table [v0|v1|v2|mat] — the
    frame-level gather whose transpose is the once-per-frame
    triangle->vertex gradient conversion (see shade_with_residuals)."""
    v, t = mesh.verts, mesh.tris
    return jnp.concatenate(
        [v[t[:, 0]], v[t[:, 1]], v[t[:, 2]],
         mesh.tri_mat[:, None].astype(v.dtype)], axis=-1)


def _shade_xla(scene: Scene, cfg: RenderConfig, o, d, res,
               method: str, mesh_rows=None) -> jnp.ndarray:
    """The shade computation itself (XLA autodiff path / forward value)."""
    t, hit, p, n, mat, cov = reconstruct_hits(scene, cfg, o, d, res, method,
                                              mesh_rows=mesh_rows)
    occluder = make_residual_occluder(scene, cfg, res, method)
    ao_fn = make_ao(scene, cfg, res, method)
    return shading.shade(scene, cfg, p, n, d, mat, hit, occluder, ao_fn,
                         coverage=cov)


def _realize(scene: Scene) -> Scene:
    """Fold optional per-object poses into world verts (scene/transform.py)."""
    if scene.poses is None:
        return scene
    from tpu_ray.scene.transform import realize_scene

    return realize_scene(scene)


def render_rays(scene: Scene, cfg: RenderConfig, o, d, method: str | None = None):
    """Trace + shade a flat ray batch: (R, 3),(R, 3) -> (R, 3) linear RGB."""
    scene = _realize(scene)
    method = method or resolve_method(scene, cfg)
    rows = (mesh_table(scene.mesh)
            if _use_mesh(scene, method) and scene.has_mesh else None)
    res = geometry_residuals(scene, cfg, o, d, method, mesh_rows=rows)
    return shade_with_residuals(scene, cfg, o, d, res, method, mesh_rows=rows)


def render_pixels_flat(scene: Scene, cfg: RenderConfig, flat_x, flat_y,
                       method: str | None = None) -> jnp.ndarray:
    """Render flat sample coords covering WHOLE pixels -> per-pixel colors
    (3, n_px), spp-averaged, channel-major.

    flat_x/flat_y length must be a multiple of cfg.spp, laid out pixel-major
    (a pixel's spp samples contiguous). Blocked execution (cfg.block_size)
    generates rays inside each jax.checkpoint'ed block, reduces spp in-block,
    and keeps colors channel-major — peak memory is one block's live state
    for forward AND backward, and no (N, 3) array with the channel axis in
    the lane dimension is ever materialized (a 42x XLA padding blow-up that
    OOMs 1080p x 16 spp frames). Shared by the single-device and shard_map
    paths so both are memory-safe at any frame size.
    """
    scene = _realize(scene)  # pose fold ONCE per frame, outside the blocks
    method = method or resolve_method(scene, cfg)

    def spp_mean_T(colors):
        return colors.reshape(-1, cfg.spp, 3).mean(1).T  # (3, n_px_block)

    def raygen(xy):
        return generate_rays(scene.camera, xy[0], xy[1], cfg.width,
                             cfg.height)

    # Rematerialization policy for the backward sweep (round 4): when the
    # fused Pallas backward applies, its custom_vjp already saves only
    # compact per-ray residuals (o, d, res, aux ≈ 90 B/ray for the mixed
    # chain), so re-running the shade forward under jax.checkpoint buys no
    # memory worth its cost — measured 6.39 s -> target ~5 s on the 1080p
    # frame. Keep the checkpoint when the XLA-autodiff backward is in play
    # (its saved intermediates are the whole shade chain) or when even the
    # compact residuals would not fit HBM (very large frames).
    from tpu_ray.kernels import pallas_shade

    fused_bwd = pallas_shade.applicable(scene, cfg, method, flat_x.dtype)
    save_bytes = flat_x.shape[0] * _saved_bytes_per_ray(scene, cfg, method)
    use_ckpt = (not fused_bwd) or save_bytes > _NO_REMAT_BUDGET_BYTES
    # frame-level packed triangle table: one row gather per block instead of
    # five, and the triangle->vertex half of the vertex-gradient scatter
    # hoists out of the per-block backward (see shade_with_residuals)
    mesh_rows = (mesh_table(scene.mesh)
                 if _use_mesh(scene, method) and scene.has_mesh else None)

    def shade_part(xy, res):
        # ray-gen internals always rematerialize (camera gradients flow
        # through it; its o/d outputs are what the shade VJP keeps)
        o, d = jax.checkpoint(raygen)(xy)
        return spp_mean_T(shade_with_residuals(scene, cfg, o, d, res, method,
                                               mesh_rows=mesh_rows))

    def block_fn(xy):
        # geometry OUTSIDE the checkpoint: its outputs are the residuals the
        # backward keeps, so marches/intersections never re-run in the
        # backward sweep — at most the cheap shade chain is rematerialized
        o, d = raygen(xy)
        res = geometry_residuals(scene, cfg, o, d, method,
                                 mesh_rows=mesh_rows)
        if use_ckpt:
            return jax.checkpoint(shade_part)(xy, res)
        return shade_part(xy, res)

    R = flat_x.shape[0]
    n_px = R // cfg.spp
    if cfg.block_size and cfg.block_size < R:
        bs = -(-cfg.block_size // cfg.spp) * cfg.spp  # whole pixels per block
        pad = (-R) % bs
        if pad:
            flat_x = jnp.concatenate([flat_x, jnp.broadcast_to(flat_x[-1:], (pad,))])
            flat_y = jnp.concatenate([flat_y, jnp.broadcast_to(flat_y[-1:], (pad,))])
        xb = flat_x.reshape(-1, bs)
        yb = flat_y.reshape(-1, bs)
        cols = jax.lax.map(block_fn, (xb, yb))  # (nb, 3, bs/spp)
        return jnp.moveaxis(cols, 1, 0).reshape(3, -1)[:, :n_px]
    return block_fn((flat_x, flat_y))


def render_image(scene: Scene, cfg: RenderConfig) -> jnp.ndarray:
    """Full frame: (H, W, 3) linear RGB, spp-averaged."""
    dtype = scene.camera.origin.dtype
    sx, sy = pixel_sample_coords(cfg, dtype)  # (H, W, spp)
    flat_x, flat_y = sx.ravel(), sy.ravel()
    # order pixels in 8x8 square blocks instead of row-major strips: a
    # (8,128)-sample kernel tile then covers a compact 8x8-pixel footprint,
    # whose tight frustum culls far more packet chunks than a 64x1 strip
    perm_px = _block_order_perm(cfg)
    if perm_px is not None:
        flat_x = flat_x.reshape(-1, cfg.spp)[perm_px].ravel()
        flat_y = flat_y.reshape(-1, cfg.spp)[perm_px].ravel()
    flat = render_pixels_flat(scene, cfg, flat_x, flat_y)  # (3, H*W)
    if perm_px is not None:
        n_px = cfg.height * cfg.width
        inv = jnp.zeros_like(perm_px).at[perm_px].set(
            jnp.arange(n_px, dtype=perm_px.dtype))
        flat = flat[:, inv]
    return jnp.moveaxis(flat.reshape(3, cfg.height, cfg.width), 0, -1)


@functools.partial(jax.jit, static_argnums=1)
def render_image_jit(scene: Scene, cfg: RenderConfig) -> jnp.ndarray:
    return render_image(scene, cfg)


def frame_stats(scene: Scene, cfg: RenderConfig, max_rays: int = 1 << 18) -> dict:
    """Per-frame ray statistics (the reference's overlay counters, SURVEY.md
    §2 #4/#19): hit rate, mean hit distance, and march-step stats for SDF
    scenes. Subsamples the frame to at most max_rays primary rays."""
    scene = _realize(scene)
    dtype = scene.camera.origin.dtype
    method = resolve_method(scene, cfg)
    sx, sy = pixel_sample_coords(cfg, dtype)
    fx, fy = sx.ravel(), sy.ravel()
    stride = max(1, fx.shape[0] // max_rays)
    fx, fy = fx[::stride], fy[::stride]
    o, d = generate_rays(scene.camera, fx, fy, cfg.width, cfg.height)
    t, hit, p, n, mat, cov = trace_rays(scene, cfg, o, d, method)
    stats = {
        "method": method,
        "rays_sampled": int(fx.shape[0]),
        "hit_rate": float(jnp.mean(hit.astype(jnp.float32))),
        "mean_hit_t": float(jnp.sum(jnp.where(hit, t, 0.0))
                            / jnp.maximum(jnp.sum(hit), 1)),
    }
    if method in ("sdf", "mixed") and scene.has_sdf:
        impl = "pallas" if use_pallas(cfg, o.dtype) else "jnp"
        tracer = make_sphere_tracer(sdf_distance, max_steps=cfg.max_steps,
                                    eps=cfg.eps, t_far=cfg.t_far,
                                    forward_impl=impl)
        _, _, steps, _ = tracer(scene.sdf, o, d)
        stats["march_steps_mean"] = float(jnp.mean(steps.astype(jnp.float32)))
        stats["march_steps_max"] = int(jnp.max(steps))
    return stats
