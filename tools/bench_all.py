"""Measure EVERY BASELINE.md table row on the current backend and write one
committed artifact (VERDICT r4 item 4: every number in BASELINE.md must be
reproducible from a committed JSON).

    python tools/bench_all.py [out.json]

Rows: the five BASELINE configs (fwd + fwd+bwd, driver-format run_bench),
plus config 4 with diff_vis=True — the differentiable soft-shadow penumbra
backward the fused Pallas kernel covers since round 5 (VERDICT r4 item 2).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_ray.bench_lib import run_bench


def main(out_path: str = "BENCH_ALL_r05.json"):
    rows = []
    for scene, kw in [
        ("sphere", {}),
        ("triangles", {}),
        ("bunny", {}),
        ("mandelbulb", {}),
        ("mandelbulb", {"diff_vis": True}),
        ("mixed", {}),
    ]:
        r = run_bench(scene, backward=True, **kw)
        tag = f"{scene}{'+diff_vis' if kw.get('diff_vis') else ''}"
        print(f"{tag:<22} fwd {r['fwd_seconds']:8.4f}s ({r['value']:6.2f} "
              f"Mrays/s)  fwd+bwd {r.get('fwdbwd_seconds', 0):8.4f}s "
              f"({r.get('mrays_fwdbwd', 0):6.2f})", flush=True)
        rows.append(r)
    with open(out_path, "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "BENCH_ALL_r05.json")
