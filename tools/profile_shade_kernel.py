"""Isolate the fused shade kernel's per-tile overhead on chip.

Times shade_fwd_pallas on content-controlled ray sets (all-sky vs all-bulb
vs all-mesh) and a stripped pallas_call with the same operand structure but
a trivial body — separating pipeline/operand overhead from shade compute.

    python tools/profile_shade_kernel.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import tpu_ray.render.render as rr
from tpu_ray.kernels import pallas_shade as psh
from tpu_ray.kernels.pallas_sdf import TILE, _full_spec, _ray_specs, _tileize
from tpu_ray.scene.scenes import build_scene
from tpu_ray.utils.metrics import block_and_time

N = 1 << 20


def rays_toward(scene, targets_np):
    o0 = np.asarray(scene.camera.origin, np.float32)
    d = targets_np - o0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray(o0), (N, 3))
    return o, jnp.asarray(d, jnp.float32)


def main():
    scene, cfg = build_scene("mixed")
    method = "mixed"
    rng = np.random.default_rng(0)

    sets = {
        "sky": np.stack([rng.uniform(-3, 3, N), np.full(N, 30.0),
                         rng.uniform(-3, 3, N)], -1),
        "bulb": (np.asarray(scene.sdf.mb_center[0], np.float32)
                 + 0.3 * rng.standard_normal((N, 3)).astype(np.float32)),
        "ground": np.stack([rng.uniform(3, 6, N), np.zeros(N),
                            rng.uniform(-3, 3, N)], -1),
    }
    for tag, tgt in sets.items():
        o, d = rays_toward(scene, tgt.astype(np.float32))
        res = rr.geometry_residuals(scene, cfg, o, d, method)
        res = jax.tree_util.tree_map(jax.block_until_ready, res)
        f = jax.jit(lambda s, o=o, d=d, res=res: rr.shade_with_residuals(
            s, cfg, o, d, res, method).sum())
        fx = jax.jit(lambda s, o=o, d=d, res=res: rr._shade_xla(
            s, cfg, o, d, res, method).sum())
        _, t = block_and_time(f, scene, warmup=1, iters=5)
        _, tx = block_and_time(fx, scene, warmup=1, iters=5)
        print(f"{tag:<8} pallas {t*1e3:7.1f} ms  xla {tx*1e3:7.1f} ms  "
              f"({t/ (N/1024) *1e6:6.1f} us/tile pallas)")

    # stripped kernel: same operand count/shape as the mixed shade kernel,
    # body = one multiply — pure pipeline/operand overhead
    n_ray_ops = 22
    n_small = 10
    cols = [jnp.arange(N, dtype=jnp.float32) * (i + 1)
            for i in range(n_ray_ops)]
    tiles = []
    for c in cols:
        tc, R, nt = _tileize(c)
        tiles.append(tc)
    smalls = [jnp.ones((4, 3), jnp.float32) * (i + 1) for i in range(n_small)]

    def kernel(*refs):
        rays = [refs[i][:] for i in range(n_ray_ops)]
        outs = refs[n_ray_ops + n_small:]
        for c in range(3):
            outs[c][...] = rays[c] * 2.0

    f = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=_ray_specs(n_ray_ops) + [_full_spec(s) for s in smalls],
        out_specs=_ray_specs(3),
        out_shape=[jax.ShapeDtypeStruct((nt * TILE[0], TILE[1]), jnp.float32)
                   for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    g = jax.jit(lambda ts: sum(x.sum() for x in f(*ts, *smalls)))
    _, t = block_and_time(g, tiles, warmup=1, iters=10)
    print(f"stripped kernel ({n_ray_ops} ray ops + {n_small} smalls): "
          f"{t*1e3:7.1f} ms = {t/(N/1024)*1e6:6.1f} us/tile")


if __name__ == "__main__":
    main()
