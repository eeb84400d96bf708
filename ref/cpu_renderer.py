"""Scalar numpy CPU reference renderer — the golden oracle.

This package plays the role the C++ reference binary would have played if the
mount had contained it (SURVEY.md §2c "CPU reference implementation"): a
readable, float64, per-pixel implementation of exactly the math the TPU
renderer implements — Möller–Trumbore, sphere tracing with the same step rule
and budgets, Lambertian shading with hard/soft shadows and 5-tap AO, the same
deterministic stratified AA offsets. Every TPU kernel must `allclose` this
(SURVEY.md §4.1). Structure is per-pixel scalar loops (vectorized only over
primitives within a pixel, for tolerable test runtimes).

Keep this file boring and obviously correct; when the TPU path and this file
disagree, this file wins unless proven wrong by hand.
"""

from __future__ import annotations

import math

import numpy as np

BIG = 1e10
_DET_EPS = 1e-10
_T_MIN = 1e-5
_MB_BAILOUT = 4.0
_MB_RMIN = 1e-6


# ---------------------------------------------------------------------------
# Scene conversion: jax pytree Scene -> plain numpy (float64) attribute access
# ---------------------------------------------------------------------------

def to_numpy_scene(scene):
    """Convert a tpu_ray.scene.types.Scene pytree to numpy float64 leaves."""
    import jax

    def cast(x):
        a = np.asarray(x)
        if np.issubdtype(a.dtype, np.floating):
            return a.astype(np.float64)
        return a

    return jax.tree_util.tree_map(cast, scene)


# ---------------------------------------------------------------------------
# SDF distance field (mirrors tpu_ray/sdf/primitives.py)
# ---------------------------------------------------------------------------

def mandelbulb_de(p, power, iters):
    z = p.copy()
    dr = 1.0
    r = max(np.linalg.norm(p), _MB_RMIN)
    for _ in range(iters):
        r = max(np.linalg.norm(z), _MB_RMIN)
        if r > _MB_BAILOUT:
            break
        theta = math.acos(min(max(z[2] / r, -1.0), 1.0))
        phi = math.atan2(z[1], z[0])
        r_pm1 = r ** (power - 1.0)
        dr = r_pm1 * power * dr + 1.0
        zr = r_pm1 * r
        th = theta * power
        ph = phi * power
        z = zr * np.array(
            [math.sin(th) * math.cos(ph), math.sin(ph) * math.sin(th), math.cos(th)]
        ) + p
    r = max(r, _MB_RMIN)
    return 0.5 * math.log(r) * r / dr


def mandelbulb_de_pow8(p, iters):
    """Scalar mirror of tpu_ray/sdf/mandelbulb.mandelbulb_de_pow8: trig-free
    power-8 iteration (angle-doubling identities; r^8 by plain multiplies)."""
    z = p.copy()
    dr = 1.0
    r = max(np.linalg.norm(p), _MB_RMIN)
    for _ in range(iters):
        r = max(np.linalg.norm(z), _MB_RMIN)
        if r > _MB_BAILOUT:
            break
        rho2 = max(z[0] * z[0] + z[1] * z[1], _MB_RMIN * _MB_RMIN)
        rho = math.sqrt(rho2)
        h = math.sqrt(rho2 + z[2] * z[2])
        st, ct = rho / h, z[2] / h
        sp, cp = z[1] / rho, z[0] / rho
        for _ in range(3):
            st, ct = 2.0 * st * ct, ct * ct - st * st
            sp, cp = 2.0 * sp * cp, cp * cp - sp * sp
        r7 = r ** 7
        r8 = r7 * r
        dr = 8.0 * r7 * dr + 1.0
        z = r8 * np.array([st * cp, st * sp, ct]) + p
    r = max(r, _MB_RMIN)
    return 0.5 * math.log(r) * r / dr


def sdf_distance(sdf, p, with_mat=False):
    """Scene distance at a single point p (3,). sdf is the numpy SdfScene."""
    best = BIG
    best_mat = 0
    for c, rad, m in zip(sdf.sph_center, sdf.sph_radius, sdf.sph_mat):
        d = np.linalg.norm(p - c) - rad
        if d < best:
            best, best_mat = d, int(m)
    for n, off, m in zip(sdf.pln_normal, sdf.pln_offset, sdf.pln_mat):
        d = float(np.dot(p, n)) - off
        if d < best:
            best, best_mat = d, int(m)
    for c, h, rr, m in zip(sdf.box_center, sdf.box_half, sdf.box_round, sdf.box_mat):
        q = np.abs(p - c) - h
        d = np.linalg.norm(np.maximum(q, 0.0)) + min(max(q[0], q[1], q[2]), 0.0) - rr
        if d < best:
            best, best_mat = d, int(m)
    for c, s, pw, m in zip(sdf.mb_center, sdf.mb_scale, sdf.mb_power, sdf.mb_mat):
        if getattr(sdf, "mb_pow8", False):
            d = mandelbulb_de_pow8((p - c) / s, sdf.mb_iters) * s
        else:
            d = mandelbulb_de((p - c) / s, pw, sdf.mb_iters) * s
        if d < best:
            best, best_mat = d, int(m)
    return (best, best_mat) if with_mat else best


def sdf_normal(sdf, p, h=1e-6):
    """Central-difference normal (the reference's approach, SURVEY.md §3.3)."""
    n = np.zeros(3)
    for a in range(3):
        e = np.zeros(3)
        e[a] = h
        n[a] = sdf_distance(sdf, p + e) - sdf_distance(sdf, p - e)
    ln = np.linalg.norm(n)
    return n / ln if ln > 0 else np.array([0.0, 1.0, 0.0])


def sphere_trace(sdf, o, d, max_steps, eps, t_far):
    """Same step rule as tpu_ray/kernels/sphere_trace.march, scalar.

    Returns (t, hit, t_min): t_min is the ray parameter of the smallest DE
    seen — the closest-approach point used for soft silhouettes.
    """
    t = 0.0
    dmin, tmin = 1e10, 0.0
    for _ in range(max_steps):
        if t >= t_far:
            break
        dist = sdf_distance(sdf, o + t * d)
        if dist < dmin:
            dmin, tmin = dist, t
        if dist < eps:
            return t, True, tmin
        t += dist
    return t, False, tmin


# ---------------------------------------------------------------------------
# Triangles (mirrors tpu_ray/kernels/moller_trumbore.py; vectorized over tris)
# ---------------------------------------------------------------------------

def mesh_corners(mesh):
    v = mesh.verts
    t = mesh.tris
    return v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]


def intersect_mesh(mesh, o, d, t_max=BIG, corners=None):
    """Closest-hit over all triangles for one ray -> (t, tri_idx, hit).

    corners: optional precomputed mesh_corners(mesh) (invariant per frame;
    render_image passes it down to avoid re-gathering per ray)."""
    if mesh.tris.shape[0] == 0:
        return BIG, -1, False
    v0, v1, v2 = mesh_corners(mesh) if corners is None else corners
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = np.cross(np.broadcast_to(d, e2.shape), e2)
    det = np.sum(e1 * pvec, -1)
    ok = np.abs(det) > _DET_EPS
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = o - v0
    u = np.sum(tvec * pvec, -1) * inv_det
    qvec = np.cross(tvec, e1)
    v = np.sum(np.broadcast_to(d, qvec.shape) * qvec, -1) * inv_det
    t = np.sum(e2 * qvec, -1) * inv_det
    valid = ok & (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t > _T_MIN) & (t < t_max)
    t = np.where(valid, t, BIG)
    i = int(np.argmin(t))
    if t[i] >= BIG * 0.5:
        return BIG, -1, False
    return float(t[i]), i, True


def mesh_normal(mesh, tri_idx):
    v0, v1, v2 = (mesh.verts[mesh.tris[tri_idx, k]] for k in range(3))
    n = np.cross(v1 - v0, v2 - v0)
    return n / max(np.linalg.norm(n), 1e-20)


# ---------------------------------------------------------------------------
# Shading (mirrors tpu_ray/render/shading.py)
# ---------------------------------------------------------------------------

def hard_shadow_sdf(sdf, p, l_dir, cfg, t_far=None):
    t_far = cfg.t_far if t_far is None else t_far
    t = cfg.shadow_bias
    for _ in range(cfg.shadow_steps):
        if t >= t_far:
            break
        dd = sdf_distance(sdf, p + t * l_dir)
        if dd < cfg.eps:
            return 0.0
        t += max(dd, cfg.eps * 0.5)
    return 1.0


def soft_shadow_sdf(sdf, p, l_dir, cfg, t_far=None):
    t_far = cfg.t_far if t_far is None else t_far
    t = cfg.shadow_bias
    s = 1.0
    for _ in range(cfg.shadow_steps):
        if t >= t_far:
            break
        dd = sdf_distance(sdf, p + t * l_dir)
        s = min(s, cfg.soft_k * dd / max(t, cfg.shadow_bias))
        t += min(max(dd, cfg.eps * 0.5), 0.4)
    return min(max(s, 0.0), 1.0)


def ao_sdf(sdf, p, n, cfg, t_mesh=None):
    """Mirrors tpu_ray/render/shading.py sdf_ambient_occlusion: 5 DF taps;
    t_mesh (closest mesh hit along n from p, BIG on miss) folds mesh
    geometry into each tap as min(DE, |t_mesh - h|); sdf=None skips the
    SDF term (pure-mesh AO)."""
    occ = 0.0
    w = 1.0
    for i in range(1, 6):
        h = cfg.ao_step * i
        dd = sdf_distance(sdf, p + h * n) if sdf is not None else BIG
        if t_mesh is not None:
            dd = min(dd, abs(t_mesh - h))
        occ += w * (h - dd)
        w *= 0.7
    return min(max(1.0 - cfg.ao_strength * occ, 0.0), 1.0)


def background(scene, d):
    s = 0.5 * (d[1] + 1.0)
    return scene.bg_bottom + (scene.bg_top - scene.bg_bottom) * s


# ---------------------------------------------------------------------------
# Full per-pixel render (mirrors tpu_ray/render/render.py)
# ---------------------------------------------------------------------------

def _camera_basis(cam):
    fwd = cam.look_at - cam.origin
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, cam.up)
    right = right / np.linalg.norm(right)
    up = np.cross(right, fwd)
    return fwd, right, up


def generate_ray(cam, x, y, width, height):
    fwd, right, up = _camera_basis(cam)
    half_h = math.tan(math.radians(float(cam.vfov_deg)) * 0.5)
    aspect = width / height
    px = (2.0 * x / width - 1.0) * half_h * aspect
    py = (1.0 - 2.0 * y / height) * half_h
    d = fwd + px * right + py * up
    d = d / np.linalg.norm(d)
    return cam.origin.copy(), d


def _resolve_method(scene, cfg):
    if cfg.method != "auto":
        return cfg.method
    has_mesh = scene.mesh.tris.shape[0] > 0
    has_sdf = (scene.sdf.sph_center.shape[0] + scene.sdf.pln_normal.shape[0]
               + scene.sdf.box_center.shape[0] + scene.sdf.mb_center.shape[0]) > 0
    if has_mesh and has_sdf:
        return "mixed"
    return "mesh_brute" if has_mesh else "sdf"


def _has_sdf(scene):
    return (scene.sdf.sph_center.shape[0] + scene.sdf.pln_normal.shape[0]
            + scene.sdf.box_center.shape[0] + scene.sdf.mb_center.shape[0]) > 0


def render_ray(scene, cfg, o, d, method=None, corners=None):
    method = method or _resolve_method(scene, cfg)
    use_sdf = method in ("sdf", "mixed")
    use_mesh = method in ("mesh_brute", "mesh_grid", "mixed")

    t_s, hit_s, tmin_s = (BIG, False, 0.0)
    t_m, tri_m, hit_m = (BIG, -1, False)
    cov_s = 0.0
    if use_sdf:
        t_s, hit_s, tmin_s = sphere_trace(
            scene.sdf, o, d, cfg.max_steps, cfg.eps, cfg.t_far)
        if cfg.soft_silhouette > 0.0:
            # mirrors tpu_ray/render/render.py _trace_sdf: sigmoid coverage of the
            # scene distance at the closest-approach point
            d_min = sdf_distance(scene.sdf, o + tmin_s * d)
            cov_s = 1.0 if hit_s else 1.0 / (1.0 + math.exp(
                min(max(d_min / cfg.soft_silhouette, -60.0), 60.0)))
        else:
            cov_s = 1.0 if hit_s else 0.0
    if use_mesh:
        t_m, tri_m, hit_m = intersect_mesh(scene.mesh, o, d, t_max=cfg.t_far,
                                           corners=corners)

    te_s = t_s if hit_s else BIG
    te_m = t_m if hit_m else BIG
    hit = hit_s or hit_m
    from_sdf = te_s <= te_m

    # coverage (mirrors trace_rays "mixed" combination in src)
    if use_sdf and cfg.soft_silhouette > 0.0:
        if hit_m and not from_sdf:
            cov = 1.0
        else:
            cov = max(cov_s, 1.0 if hit_m else 0.0)
    else:
        cov = 1.0 if hit else 0.0

    bg = background(scene, d)
    if cov == 0.0:
        return bg

    # surface point: for soft-silhouette misses, shade at the closest approach
    if from_sdf:
        t_eff = t_s if (hit_s or cfg.soft_silhouette <= 0.0) else tmin_s
        p = o + t_eff * d
        n = sdf_normal(scene.sdf, p)
        _, mat = sdf_distance(scene.sdf, p, with_mat=True)
    else:
        p = o + t_m * d
        n = mesh_normal(scene.mesh, tri_m)
        mat = int(scene.mesh.tri_mat[tri_m])

    if np.dot(n, d) > 0.0:
        n = -n

    # AO gate mirrors src make_ao: SDF term by scene CONTENT; mesh term by
    # traced method + non-empty mesh (the ao_tmesh residual's gate)
    ao_mesh = use_mesh and len(scene.mesh.tris) > 0
    if cfg.ao == "sdf5" and (_has_sdf(scene) or ao_mesh):
        t_ao = None
        if ao_mesh:
            po = p + cfg.shadow_bias * n
            tm, _tri, hm = intersect_mesh(
                scene.mesh, po, n, t_max=5.0 * cfg.ao_step + cfg.shadow_bias,
                corners=corners)
            t_ao = tm + cfg.shadow_bias if hm else BIG
        ao = ao_sdf(scene.sdf if _has_sdf(scene) else None, p, n, cfg,
                    t_mesh=t_ao)
    else:
        ao = 1.0
    radiance = scene.lights.ambient * ao

    for li in range(scene.lights.direction.shape[0]):
        l = scene.lights.direction[li]
        l = l / np.linalg.norm(l)
        ndotl = max(float(np.dot(n, l)), 0.0)
        vis = 1.0
        if cfg.shadow != "none":
            p_off = p + cfg.shadow_bias * n
            if use_sdf and _has_sdf(scene):
                if cfg.shadow == "soft":
                    vis *= soft_shadow_sdf(scene.sdf, p_off, l, cfg)
                else:
                    vis *= hard_shadow_sdf(scene.sdf, p_off, l, cfg)
            if use_mesh:
                _, _, blocked = intersect_mesh(scene.mesh, p_off, l,
                                               t_max=cfg.t_far, corners=corners)
                vis *= 0.0 if blocked else 1.0
        radiance = radiance + scene.lights.color[li] * ndotl * vis

    for pi in range(scene.lights.position.shape[0]):
        # point light: per-ray direction, inverse-square falloff, shadow
        # marches clamped at the light distance (mirrors src shading.shade)
        lpos = scene.lights.position[pi]
        p_off = p + cfg.shadow_bias * n
        lvec = lpos - p
        dist2 = max(float(np.dot(lvec, lvec)), 1e-12)
        dist = math.sqrt(dist2)
        l = lvec / dist
        ndotl = max(float(np.dot(n, l)), 0.0)
        vis = 1.0
        if cfg.shadow != "none":
            lvec_off = lpos - p_off
            dist_off = max(float(np.linalg.norm(lvec_off)), 1e-12)
            l_off = lvec_off / dist_off
            if use_sdf and _has_sdf(scene):
                if cfg.shadow == "soft":
                    vis *= soft_shadow_sdf(scene.sdf, p_off, l_off, cfg,
                                           t_far=dist_off)
                else:
                    vis *= hard_shadow_sdf(scene.sdf, p_off, l_off, cfg,
                                           t_far=dist_off)
            if use_mesh:
                # unnormalized segment with t_max = 1: occluders beyond the
                # light cannot block (MT is t-scale invariant)
                _, _, blocked = intersect_mesh(scene.mesh, p_off, lvec_off,
                                               t_max=1.0, corners=corners)
                vis *= 0.0 if blocked else 1.0
        radiance = radiance + scene.lights.pos_color[pi] * (
            ndotl * vis / max(dist2, 1e-8))

    color = scene.materials.albedo[mat] * radiance
    return bg + cov * (color - bg)


def sample_offsets(cfg):
    k = cfg.spp_side
    centers = (np.arange(k) + 0.5) / k
    ox, oy = np.meshgrid(centers, centers, indexing="xy")
    return np.stack([ox.ravel(), oy.ravel()], -1)


def jitter_offsets(cfg, dtype):
    """(H, W, spp, 2) seeded jitter offsets in pixel units, bit-identical to
    tpu_ray/render/render.pixel_sample_coords: the jax.random.uniform draw is the
    *specification* of the sample sequence (threefry bits), so the oracle
    reproduces it via jax.random on the host and then stays scalar numpy."""
    import jax

    k = cfg.spp_side
    key = jax.random.PRNGKey(cfg.jitter_seed)
    u = np.asarray(jax.random.uniform(
        key, (cfg.height, cfg.width, cfg.spp, 2), dtype), np.float64)
    cell_x = np.arange(cfg.spp) % k
    cell_y = np.arange(cfg.spp) // k
    off = np.empty((cfg.height, cfg.width, cfg.spp, 2))
    off[..., 0] = (cell_x + u[..., 0]) / k
    off[..., 1] = (cell_y + u[..., 1]) / k
    return off


def render_image(scene, cfg):
    """Full-frame scalar render -> float64 (H, W, 3). Slow; use small cfgs."""
    jit_off = None
    if cfg.jitter_seed is not None:
        import jax.numpy as jnp

        dt = jnp.asarray(scene.camera.origin).dtype
        jit_off = jitter_offsets(cfg, dt)
    scene = to_numpy_scene(scene)
    offs = sample_offsets(cfg)
    img = np.zeros((cfg.height, cfg.width, 3))
    method = _resolve_method(scene, cfg)
    # per-frame invariants hoisted out of the pixel loops
    corners = mesh_corners(scene.mesh) if scene.mesh.tris.shape[0] else None
    fwd, right, up = _camera_basis(scene.camera)
    half_h = math.tan(math.radians(float(scene.camera.vfov_deg)) * 0.5)
    aspect = cfg.width / cfg.height
    origin = scene.camera.origin
    for y in range(cfg.height):
        for x in range(cfg.width):
            acc = np.zeros(3)
            for si, (sx, sy) in enumerate(offs):
                if jit_off is not None:
                    sx, sy = jit_off[y, x, si]
                px = (2.0 * (x + sx) / cfg.width - 1.0) * half_h * aspect
                py = (1.0 - 2.0 * (y + sy) / cfg.height) * half_h
                d = fwd + px * right + py * up
                d = d / np.linalg.norm(d)
                acc += render_ray(scene, cfg, origin.copy(), d, method,
                                  corners=corners)
            img[y, x] = acc / len(offs)
    return img
