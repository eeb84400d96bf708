"""Micro-benchmark the vertex-gradient scatter chain on chip.

The headline backward's top unattributed term (tools/profile_bwd.py): per
32k-ray block, d_corners (R, 9) scatter-adds by triangle id into the (T, 10)
row-cotangent, then one per-frame (T -> V) conversion. This times each piece
standalone so the fix targets the real cost.

    python tools/profile_scatter.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_ray.utils.metrics import block_and_time

R = 1 << 15  # rays per block (headline block size)
T = 70_000   # ~bunny-standin triangle count
V = 35_000


def main():
    rng = np.random.default_rng(0)
    # Morton blocks are spatially coherent: a block touches a local subset
    # of triangles. Model both extremes.
    idx_local = jnp.asarray(rng.integers(0, 2000, R) + 30_000, jnp.int32)
    idx_uniform = jnp.asarray(rng.integers(0, T, R), jnp.int32)
    d = jnp.asarray(rng.standard_normal((R, 9), np.float32))
    tris = jnp.asarray(rng.integers(0, V, (T, 3)), jnp.int32)
    dt = jnp.asarray(rng.standard_normal((T, 10), np.float32))

    for tag, idx in (("local", idx_local), ("uniform", idx_uniform)):
        f = jax.jit(lambda d, idx=idx: jnp.zeros((T, 9), jnp.float32)
                    .at[idx].add(d))
        _, s = block_and_time(f, d, warmup=2, iters=10)
        print(f"scatter R->T [{tag:7}]  {s * 1e3:7.3f} ms/block "
              f"x 2025 blocks = {s * 2025:6.2f}s/frame")

    # K blocks batched into one scatter (deferred accumulation)
    for k in (8, 64):
        dk = jnp.asarray(rng.standard_normal((k * R, 9), np.float32))
        ik = jnp.asarray(rng.integers(0, T, k * R), jnp.int32)
        f = jax.jit(lambda d, idx: jnp.zeros((T, 9), jnp.float32)
                    .at[idx].add(d))
        _, s = block_and_time(f, dk, ik, warmup=2, iters=10)
        print(f"scatter {k}-block batch   {s * 1e3:7.3f} ms "
              f"= {s / k * 1e3:7.3f} ms/block-equiv")

    # the per-frame T->V conversion (mesh_table transpose)
    f = jax.jit(lambda dt: jnp.zeros((V, 3), jnp.float32)
                .at[tris.reshape(-1)].add(
                    jnp.repeat(dt[:, 0:9].reshape(-1, 3), 1, axis=0)
                    .reshape(-1, 3)))
    _, s = block_and_time(f, dt, warmup=2, iters=10)
    print(f"T->V conversion (once/frame) {s * 1e3:7.3f} ms")

    # one 32k-ray block worth of pure HBM traffic for reference: read+write
    # the ~90 B/ray residual set
    x = jnp.asarray(rng.standard_normal((R, 24), np.float32))
    f = jax.jit(lambda x: x * 1.000001)
    _, s = block_and_time(f, x, warmup=2, iters=10)
    print(f"90B/ray roundtrip ref        {s * 1e3:7.3f} ms/block")


if __name__ == "__main__":
    main()
