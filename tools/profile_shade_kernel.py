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
    stripped_only = "--stripped" in sys.argv

    sets = {} if stripped_only else {
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

    # stripped kernels: same operand structure, body = one multiply — pure
    # pipeline/operand overhead, swept over the operand-count axes
    def stripped(n_ray_ops, n_small, n_out, packed=False, N=N):
        if packed:
            col = jnp.arange(N * n_ray_ops, dtype=jnp.float32)
            packed_arr = col.reshape(n_ray_ops, -1, TILE[0], TILE[1]) \
                .transpose(1, 2, 0, 3).reshape(-1, n_ray_ops * TILE[1])
            nt = packed_arr.shape[0] // TILE[0]
            ray_in = [pl.BlockSpec((TILE[0], n_ray_ops * TILE[1]),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            out_spec = [pl.BlockSpec((TILE[0], n_out * TILE[1]),
                                     lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)]
            out_shape = [jax.ShapeDtypeStruct(
                (nt * TILE[0], n_out * TILE[1]), jnp.float32)]
            args = [packed_arr]
        else:
            cols = [jnp.arange(N, dtype=jnp.float32) * (i + 1)
                    for i in range(n_ray_ops)]
            args = []
            for c in cols:
                tc, R, nt = _tileize(c)
                args.append(tc)
            ray_in = _ray_specs(n_ray_ops)
            out_spec = _ray_specs(n_out)
            out_shape = [jax.ShapeDtypeStruct(
                (nt * TILE[0], TILE[1]), jnp.float32) for _ in range(n_out)]
        smalls = [jnp.ones((4, 3), jnp.float32) * (i + 1)
                  for i in range(n_small)]

        def kernel(*refs):
            outs = refs[len(ray_in) + n_small:]
            r0 = refs[0][:, :TILE[1]] if packed else refs[0][:]
            for c in range(len(outs)):
                if packed:
                    outs[c][...] = jnp.tile(r0 * 2.0, (1, n_out))
                else:
                    outs[c][...] = r0 * 2.0

        f = pl.pallas_call(
            kernel, grid=(nt,),
            in_specs=ray_in + [_full_spec(s) for s in smalls],
            out_specs=out_spec, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        g = jax.jit(lambda ts: sum(x.sum() for x in f(*ts, *smalls)))
        _, t = block_and_time(g, args, warmup=1, iters=10)
        tag = "packed" if packed else "split "
        print(f"stripped {tag} rays={n_ray_ops:2d} smalls={n_small:2d} "
              f"outs={n_out:2d}: {t*1e3:7.1f} ms = "
              f"{t/(N/1024)*1e6:6.1f} us/tile")

    for n in (1 << 20, 1 << 22):
        print(f"-- N = {n >> 20}M rays ({n // 1024} tiles) --")
        stripped(22, 10, 3, N=n)
        stripped(1, 0, 1, N=n)
        stripped(28, 10, 15, N=n)   # the bwd kernel's ray-operand structure
        stripped(28, 0, 15, packed=True, N=n)


if __name__ == "__main__":
    main()
