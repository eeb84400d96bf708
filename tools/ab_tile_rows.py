#!/usr/bin/env python
"""On-chip A/B of the streamed packet kernel's ray-tile height
(TPU_RAY_MT_TILE_ROWS): closest-hit over the config-3 bunny-standin mesh at
512^2 (the config-3 workload) and over the 1M-tri knot.

A taller tile amortizes the per-chunk any-lane reduce + scalar branch and the
per-super DMA over more rays; the cost is a wider tile frustum (more
candidate chunks pass). This measures the net. Run ONE at a time (claims the
chip):

    python tools/ab_tile_rows.py 8
    python tools/ab_tile_rows.py 16
"""

import os
import sys

rows = sys.argv[1] if len(sys.argv) > 1 else "8"
os.environ["TPU_RAY_MT_TILE_ROWS"] = rows

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tools.bench_streamed import bench, camera_rays  # noqa: E402
from tpu_ray.accel.packet import build_packet_accel  # noqa: E402
from tpu_ray.kernels.pallas_mt import intersect_packet_streamed  # noqa: E402
from tpu_ray.scene.mesh import bunny_standin, torus_knot  # noqa: E402


def main():
    print(f"[ab] TILE rows={rows} device={jax.devices()[0]}", flush=True)
    o, d = camera_rays(512, jnp.float32)
    n = o.shape[0]
    fn = jax.jit(lambda acc, oo, dd: intersect_packet_streamed(acc, oo, dd))

    for name, (v, f) in (
        ("bunny70k", bunny_standin()),
        ("knot1m", torus_knot(2, 3, 724, 724)),
    ):
        accel = build_packet_accel(np.asarray(v), np.asarray(f))
        dt, hit = bench(fn, accel, o, d)
        print(f"[ab] rows={rows} {name}: {dt*1e3:.1f} ms = "
              f"{n/dt/1e6:.2f} Mrays/s  hit={np.asarray(hit.hit).mean():.3f}",
              flush=True)


if __name__ == "__main__":
    main()
