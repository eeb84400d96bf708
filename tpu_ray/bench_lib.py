"""Benchmark harness: Mrays/sec/chip, forward and forward+backward.

The metric defined by BASELINE.json:2 ("Mrays/sec/chip (fwd and fwd+bwd) at
1080p; N-host scaling efficiency"). `run_bench` measures one scene config on
the current default backend (the real TPU chip under the driver; CPU when
forced) and returns the driver's JSON contract:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline compares against the newest BENCH_r*.json recorded in the repo
root (the previous round's own measurement — the C++ reference publishes no
numbers, BASELINE.json:13 `published: {}`).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

import jax
import jax.numpy as jnp

from tpu_ray.utils.metrics import block_and_time, mrays_per_sec, rays_per_frame

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _prior_value(metric: str):
    """Newest BENCH_r{N}.json value for the same metric, if any."""
    best = None
    for path in glob.glob(os.path.join(REPO_ROOT, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            data = json.loads(open(path).read())
        except Exception:
            continue
        if isinstance(data, dict) and isinstance(data.get("parsed"), dict):
            data = data["parsed"]  # driver BENCH_r{N}.json wraps the line
        if data.get("metric") == metric and "value" in data:
            rnd = int(m.group(1))
            if best is None or rnd > best[0]:
                best = (rnd, float(data["value"]))
    return None if best is None else best[1]


PERSISTENT_BELOW_RAYS = 4_000_000  # frames smaller than this are dispatch-
# bound through the device tunnel (~29 ms fixed roundtrip, BASELINE.md
# caveat): bench them as a persistent K-frame turntable loop inside ONE
# dispatch (lax.map over camera poses, the --turntable pattern) and divide.


def run_bench(scene_name: str = "mixed", backward: bool = True,
              warmup: int = 1, iters: int = 2,
              persistent: bool | None = None,
              diff_vis: bool = False) -> dict:
    from tpu_ray.fit import extract_params, apply_params
    from tpu_ray.render.render import render_image
    from tpu_ray.scene.scenes import build_scene

    scene, cfg = build_scene(scene_name)
    n_chips = 1  # the jitted render runs on the default device only
    rays = rays_per_frame(cfg, scene)
    if persistent is None:
        persistent = rays < PERSISTENT_BELOW_RAYS

    if persistent:
        k = 16
        ang = jnp.linspace(0.0, 2.0 * jnp.pi, k, endpoint=False)
        o0 = scene.camera.origin
        r = jnp.sqrt(o0[0] ** 2 + o0[2] ** 2)
        origins = jnp.stack([r * jnp.sin(ang),
                             jnp.broadcast_to(o0[1], ang.shape),
                             r * jnp.cos(ang)], -1)

        def frames(s):
            return jax.lax.map(
                lambda org: render_image(
                    s.replace(camera=s.camera.replace(origin=org)), cfg),
                origins)

        fwd = jax.jit(frames)
        _, fwd_k = block_and_time(fwd, scene, warmup=warmup, iters=iters)
        fwd_s = fwd_k / k
    else:
        fwd = jax.jit(lambda s: render_image(s, cfg))
        _, fwd_s = block_and_time(fwd, scene, warmup=warmup, iters=iters)
    fwd_mrays = mrays_per_sec(rays, fwd_s) / n_chips

    result = {
        "metric": f"Mrays_per_sec_per_chip_fwd_{scene_name}_{cfg.width}x{cfg.height}_spp{cfg.spp}",
        "value": round(fwd_mrays, 4),
        "unit": "Mrays/s/chip",
        "scene": scene_name,
        "resolution": f"{cfg.width}x{cfg.height}",
        "spp": cfg.spp,
        "rays_per_frame": rays,
        "fwd_seconds": round(fwd_s, 4),
        "device": str(jax.devices()[0]),
        "chips_used": 1,
        "persistent_loop": bool(persistent),
    }

    if backward:
        # mb_scale (not mb_power): the trig-free power-8 DE fast path
        # hard-codes the exponent, so power is not a bench-time parameter;
        # scale/center carry the same IFT gradient structure
        trainable = [p for p in ("sdf.sph_radius", "sdf.mb_scale", "camera.origin",
                                 "materials.albedo", "lights.color", "mesh.verts")
                     if _has_param(scene, p)]
        params = extract_params(scene, trainable)

        # backward default: forward-only visibility marches (hard-shadow
        # gradients are zero anyway; keeps rounds comparable). diff_vis=True
        # measures the differentiable soft-shadow penumbra chain instead —
        # the fused Pallas backward covers it since round 5 (VERDICT r4
        # item 2), so this is a first-class benchmarked mode now.
        cfg_b = cfg.replace(diff_vis=diff_vis)
        if cfg_b.block_size:
            cfg_b = cfg_b.replace(block_size=min(cfg_b.block_size, 1 << 16))

        def loss(pp):
            return jnp.mean(render_image(apply_params(scene, pp), cfg_b) ** 2)

        if persistent:
            # dispatch-bound small frames: K fwd+bwd passes in ONE dispatch
            # (grad of the mean over the turntable origins backprops through
            # every frame of the lax.map), mirroring the forward measurement
            k = origins.shape[0]
            # parameterize each frame's origin as param + turntable DELTA so
            # the camera.origin gradient still flows through every frame
            deltas = jax.lax.stop_gradient(origins - o0)

            def loss_k(pp):
                s2 = apply_params(scene, pp)

                def frame(delta):
                    s3 = s2.replace(camera=s2.camera.replace(
                        origin=s2.camera.origin + delta))
                    return jnp.mean(render_image(s3, cfg_b) ** 2)

                return jnp.mean(jax.lax.map(frame, deltas))

            bwd = jax.jit(jax.grad(loss_k))
            _, bwd_k = block_and_time(bwd, params, warmup=warmup,
                                      iters=max(iters - 1, 1))
            bwd_s = bwd_k / k
        else:
            bwd = jax.jit(jax.grad(loss))
            _, bwd_s = block_and_time(bwd, params, warmup=warmup,
                                      iters=max(iters - 1, 1))
        result["fwdbwd_seconds"] = round(bwd_s, 4)
        result["mrays_fwdbwd"] = round(mrays_per_sec(rays, bwd_s) / n_chips, 4)
        result["backward_diff_vis"] = bool(diff_vis)

    prior = _prior_value(result["metric"])
    result["vs_baseline"] = round(result["value"] / prior, 4) if prior else 1.0
    return result


def _has_param(scene, path: str) -> bool:
    try:
        from tpu_ray.fit import get_param

        v = get_param(scene, path)
        return hasattr(v, "size") and v.size > 0
    except AttributeError:
        return False
