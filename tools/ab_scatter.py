"""A/B the vertex-gradient scatter strategies on chip (VERDICT r4 item 1).

The headline backward's top term (~0.46 s of the 0.83 s increment,
tools/profile_bwd.py) is the per-block (R=32k, 9) -> (T=70k, 9) scatter-add
by triangle id (the corner-gather transpose). Each variant runs K times
INSIDE one dispatch (fori_loop, iteration-varied data so XLA cannot CSE)
— the ~25 ms tunnel roundtrip otherwise swamps sub-ms kernels.

Variants:
  base      — one (R, 9) scatter-add (what XLA emits today)
  sorted    — explicit sort by id + permute + indices_are_sorted scatter
  majority  — spp-16 pre-reduction: sum each pixel's samples that share the
              pixel's first id -> (R/16, 9) scatter + sparse (R, 9) rest
              (tests whether row count or collisions dominate)
  width3    — three (R, 3) scatters (per-row vs per-element cost)
  spp-sum   — LOWER BOUND if ids were unique per pixel: single (R/16, 9)

    python tools/ab_scatter.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_ray.utils.metrics import block_and_time

R = 1 << 15
T = 70_000
SPP = 16
K = 64


def timed(name, fn, *args):
    def loop(*a):
        def body(i, acc):
            return acc + fn(i.astype(jnp.float32), *a).sum()
        return jax.lax.fori_loop(0, K, body, jnp.zeros(()))

    _, s = block_and_time(jax.jit(loop), *args, warmup=1, iters=3)
    per = (s / K) * 1e3
    print(f"{name:<22} {per:7.3f} ms/block  -> {per * 2.025:6.2f}s/frame")
    return per


def main():
    rng = np.random.default_rng(0)
    # spp-coherent ids: each pixel's 16 samples mostly share one triangle
    pix_id = rng.integers(0, T, R // SPP)
    ids = np.repeat(pix_id, SPP)
    flip = rng.random(R) < 0.06  # ~6% of samples straddle another triangle
    ids = np.where(flip, rng.integers(0, T, R), ids).astype(np.int32)
    idx = jnp.asarray(ids)
    d = jnp.asarray(rng.standard_normal((R, 9), np.float32))

    def base(i, d, idx):
        return jnp.zeros((T, 9), jnp.float32).at[idx].add(d * (1.0 + i))

    timed("base scatter", base, d, idx)

    def sorted_sc(i, d, idx):
        order = jnp.argsort(idx)
        return jnp.zeros((T, 9), jnp.float32).at[idx[order]].add(
            d[order] * (1.0 + i), indices_are_sorted=True)

    timed("sort + sorted scatter", sorted_sc, d, idx)

    def majority(i, d, idx):
        dg = (d * (1.0 + i)).reshape(-1, SPP, 9)
        ig = idx.reshape(-1, SPP)
        same = (ig == ig[:, :1])
        main_rows = (dg * same[..., None]).sum(1)
        rest = jnp.where(same[..., None], 0.0, dg).reshape(-1, 9)
        out = jnp.zeros((T, 9), jnp.float32).at[ig[:, 0]].add(main_rows)
        return out.at[idx].add(rest)

    timed("majority + rest", majority, d, idx)

    def width3(i, d, idx):
        out = jnp.zeros((T, 9), jnp.float32)
        for c in range(3):
            out = out.at[idx, 3 * c:3 * c + 3].add(
                d[:, 3 * c:3 * c + 3] * (1.0 + i))
        return out

    timed("3x width-3 scatters", width3, d, idx)

    def spp_sum_only(i, d, idx):
        dg = (d * (1.0 + i)).reshape(-1, SPP, 9).sum(1)
        ig = idx.reshape(-1, SPP)[:, 0]
        return jnp.zeros((T, 9), jnp.float32).at[ig].add(dg)

    timed("spp-sum only (LB)", spp_sum_only, d, idx)

    # reference: pure gather at the same row count
    def gather_ref(i, d, idx):
        tbl = jnp.zeros((T, 9), jnp.float32) + i
        return tbl[idx] + d

    timed("gather ref (R rows)", gather_ref, d, idx)


if __name__ == "__main__":
    main()
