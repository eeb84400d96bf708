"""The render core: fused ray-gen → intersect → shade → AA accumulation.

TPU-native equivalent of the reference's per-pixel tile kernel (SURVEY.md §2
#13, reference trace.cpp TraceTile): instead of a scalar loop over pixels and
samples, the whole sample grid is flattened into one ray batch and every stage
is a batched, branch-free op — XLA fuses the chain; the Pallas variants in
src/kernels/ replace the hottest configurations. Supersampling (SURVEY.md §2
#12) folds the sample dimension into the ray batch and mean-reduces in-device,
i.e. "fused differentiable accumulation" per the north star.

Ray blocks are processed through `lax.map` when cfg.block_size is set — the
TPU analog of the reference's tile scheduler granule (memory bound, not
thread scheduling; device-level parallelism lives in src/dist/sharding.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from src.kernels import moller_trumbore as mt
from src.kernels.sphere_trace import make_sphere_tracer, surface_normal
from src.render import shading
from src.render.camera import generate_rays
from src.scene.types import Scene
from src.sdf.primitives import sdf_distance, sdf_distance_and_mat
from src.utils.config import RenderConfig

BIG = 1e10


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
    """Pixel permutation: row-major -> 8x8 square blocks (None if the image
    is not divisible into 8x8 blocks; strips are then used as-is)."""
    if cfg.height % 8 or cfg.width % 8:
        return None
    import numpy as np

    idx = np.arange(cfg.height * cfg.width).reshape(cfg.height, cfg.width)
    blocks = idx.reshape(cfg.height // 8, 8, cfg.width // 8, 8)
    return jnp.asarray(blocks.transpose(0, 2, 1, 3).reshape(-1), jnp.int32)


# ---------------------------------------------------------------------------
# Intersection dispatch
# ---------------------------------------------------------------------------

def use_pallas(cfg: RenderConfig, dtype) -> bool:
    if cfg.pallas == "off":
        return False
    if cfg.pallas == "on":
        return True
    return jax.default_backend() == "tpu" and dtype == jnp.float32


def _trace_sdf(scene: Scene, cfg: RenderConfig, o, d):
    impl = "pallas" if use_pallas(cfg, o.dtype) else "jnp"
    tracer = make_sphere_tracer(
        sdf_distance, max_steps=cfg.max_steps, eps=cfg.eps, t_far=cfg.t_far,
        forward_impl=impl,
    )
    t, hit, _steps, tmin = tracer(scene.sdf, o, d)
    if cfg.soft_silhouette > 0.0:
        # differentiable coverage: re-evaluate the DE at the closest-approach
        # point (tmin, a stop-gradient sampling location) WITH gradients; a
        # sigmoid of the miss distance smooths the visibility step so
        # silhouette motion (camera pose, object translation) has gradients
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


def _trace_mesh_brute(scene: Scene, cfg: RenderConfig, o, d):
    res = mt.intersect_brute(scene.mesh, o, d, t_max=cfg.t_far)
    tri = jax.lax.stop_gradient(res.tri)
    t, _u, _v, n = mt.recompute_hit(scene.mesh, o, d, tri)
    t = jnp.where(res.hit, t, BIG)
    p = o + t[..., None] * d
    mat = jnp.where(res.hit, scene.mesh.tri_mat[jnp.clip(tri, 0, None)], 0)
    return t, res.hit, p, n, mat, res.hit.astype(o.dtype)


def _trace_mesh_grid(scene: Scene, cfg: RenderConfig, o, d):
    if scene.packet is not None and use_pallas(cfg, o.dtype):
        from src.kernels.pallas_mt import intersect_packet_parts

        # primary rays share the camera origin -> front-to-back chunk order
        res = intersect_packet_parts(scene.packet, o, d, t_max=cfg.t_far,
                                     sort_origin=o[0])
    else:
        from src.kernels.dda import intersect_grid

        assert scene.grid is not None, "call scene.with_grid() before mesh_grid renders"
        res = intersect_grid(scene.mesh, scene.grid, o, d, t_max=cfg.t_far)
    tri = jax.lax.stop_gradient(res.tri)
    t, _u, _v, n = mt.recompute_hit(scene.mesh, o, d, tri)
    t = jnp.where(res.hit, t, BIG)
    p = o + t[..., None] * d
    mat = jnp.where(res.hit, scene.mesh.tri_mat[jnp.clip(tri, 0, None)], 0)
    return t, res.hit, p, n, mat, res.hit.astype(o.dtype)


def trace_rays(scene: Scene, cfg: RenderConfig, o, d, method: str):
    """Closest-hit dispatch -> (t, hit, p, n, mat). Static method selection."""
    if method == "sdf":
        return _trace_sdf(scene, cfg, o, d)
    if method == "mesh_brute":
        return _trace_mesh_brute(scene, cfg, o, d)
    if method == "mesh_grid":
        return _trace_mesh_grid(scene, cfg, o, d)
    if method == "mixed":
        ts, hs, ps, ns, ms, cs = _trace_sdf(scene, cfg, o, d)
        mesh_trace = _trace_mesh_grid if scene.grid is not None else _trace_mesh_brute
        tm, hm, pm, nm, mm, cm = mesh_trace(scene, cfg, o, d)
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
        return t, hit, p, n, mat, cov
    raise ValueError(f"unknown method {method!r}")


def make_occluder(scene: Scene, cfg: RenderConfig, method: str):
    """Shadow visibility callback for shade(), per method; None if disabled."""
    if cfg.shadow == "none":
        return None
    use_sdf = method in ("sdf", "mixed") and scene.has_sdf
    use_mesh = method in ("mesh_brute", "mesh_grid", "mixed") and scene.has_mesh

    def occluder(p, l_dir):
        vis = jnp.ones(p.shape[:-1], p.dtype)
        if use_sdf:
            pallas_ok = use_pallas(cfg, p.dtype) and (
                cfg.shadow == "hard" or not cfg.diff_vis)
            if pallas_ok:
                from src.kernels.pallas_sdf import shadow_pallas

                v = shadow_pallas(
                    jax.lax.stop_gradient(scene.sdf), jax.lax.stop_gradient(p),
                    jax.lax.stop_gradient(l_dir), soft=(cfg.shadow == "soft"),
                    eps=cfg.eps, t_far=cfg.t_far, steps=cfg.shadow_steps,
                    bias=cfg.shadow_bias, soft_k=cfg.soft_k)
                vis = vis * v
            elif cfg.shadow == "soft":
                vis = vis * shading.sdf_soft_shadow(sdf_distance, scene.sdf, p, l_dir, cfg)
            else:
                vis = vis * shading.sdf_hard_shadow(sdf_distance, scene.sdf, p, l_dir, cfg)
        if use_mesh:
            if (scene.packet is not None and method in ("mesh_grid", "mixed")
                    and use_pallas(cfg, p.dtype)):
                from src.kernels.pallas_mt import intersect_packet_parts

                # shadow rays share the light direction: visit supers by
                # ascending projection (blockers nearest the surfaces first)
                blocked = intersect_packet_parts(
                    scene.packet, p, l_dir, t_max=cfg.t_far, any_hit=True,
                    sort_dir=l_dir[0]).hit
            elif scene.grid is not None and method in ("mesh_grid", "mixed"):
                from src.kernels.dda import any_hit_grid

                blocked = any_hit_grid(scene.mesh, scene.grid, p, l_dir, t_max=cfg.t_far)
            else:
                blocked = mt.any_hit_brute(scene.mesh, p, l_dir, t_max=cfg.t_far)
            vis = vis * (1.0 - jax.lax.stop_gradient(blocked.astype(p.dtype)))
        return vis

    return occluder


def make_ao(scene: Scene, cfg: RenderConfig, method: str):
    if cfg.ao == "none":
        return None
    if cfg.ao == "sdf5" and scene.has_sdf:
        return lambda p, n: shading.sdf_ambient_occlusion(sdf_distance, scene.sdf, p, n, cfg)
    return None


# ---------------------------------------------------------------------------
# Fused render
# ---------------------------------------------------------------------------

def render_rays(scene: Scene, cfg: RenderConfig, o, d, method: str | None = None):
    """Trace + shade a flat ray batch: (R, 3),(R, 3) -> (R, 3) linear RGB."""
    method = method or resolve_method(scene, cfg)
    t, hit, p, n, mat, cov = trace_rays(scene, cfg, o, d, method)
    occluder = make_occluder(scene, cfg, method)
    ao_fn = make_ao(scene, cfg, method)
    return shading.shade(scene, cfg, p, n, d, mat, hit, occluder, ao_fn,
                         coverage=cov)


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
    method = method or resolve_method(scene, cfg)

    def block_fn(xy):
        o, d = generate_rays(scene.camera, xy[0], xy[1], cfg.width, cfg.height)
        return render_rays(scene, cfg, o, d, method)

    def spp_mean_T(colors):
        return colors.reshape(-1, cfg.spp, 3).mean(1).T  # (3, n_px_block)

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
        cols = jax.lax.map(jax.checkpoint(lambda xy: spp_mean_T(block_fn(xy))),
                           (xb, yb))  # (nb, 3, bs/spp)
        return jnp.moveaxis(cols, 1, 0).reshape(3, -1)[:, :n_px]
    return spp_mean_T(block_fn((flat_x, flat_y)))


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
