"""Capture an on-chip xprof trace of a config's fwd+bwd and print the top
HLO ops by self time (VERDICT r4 item 1: attribute the backward, then attack
the top term — with REAL per-op numbers, not subset-ablation inference,
which compile-time constant folding confounds).

    python tools/profile_trace_ops.py [scene] [fwd|bwd] [top_n]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def capture(scene_name: str, mode: str, trace_dir: str):
    from tpu_ray.fit import apply_params, extract_params, get_param
    import tpu_ray.render.render as rr
    from tpu_ray.scene.scenes import build_scene
    from tpu_ray.utils.metrics import block_and_time

    scene, cfg = build_scene(scene_name)

    if mode == "fwd":
        fn = jax.jit(lambda s: rr.render_image(s, cfg))
        arg = scene
    else:
        cfg_b = cfg.replace(diff_vis=False)
        if cfg_b.block_size:
            cfg_b = cfg_b.replace(block_size=min(cfg_b.block_size, 1 << 16))
        paths = []
        for p in ("sdf.sph_radius", "sdf.mb_scale", "camera.origin",
                  "materials.albedo", "lights.color", "mesh.verts"):
            try:
                v = get_param(scene, p)
                if hasattr(v, "size") and v.size > 0:
                    paths.append(p)
            except AttributeError:
                pass
        params = extract_params(scene, paths)

        def loss(pp):
            return jnp.mean(rr.render_image(apply_params(scene, pp),
                                            cfg_b) ** 2)

        fn = jax.jit(jax.grad(loss))
        arg = params

    _, warm = block_and_time(fn, arg, warmup=1, iters=1)
    print(f"[trace] warm {mode} = {warm:.3f}s", flush=True)
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(fn(arg))
    return warm


def report(trace_dir: str, top_n: int = 40):
    from xprof.convert import raw_to_tool_data as rtd

    planes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                       recursive=True)
    assert planes, f"no xplane.pb under {trace_dir}"
    data, _ = rtd.xspace_to_tool_data(planes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    # hlo_stats GViz JSON: cols + rows
    cols = [c["label"] for c in obj["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in obj["rows"]]

    def col(name_sub):
        for i, c in enumerate(cols):
            if name_sub.lower() in c.lower():
                return i
        raise KeyError((name_sub, cols))

    i_cat = col("category")
    i_name = col("HLO op name")
    try:
        i_fw = col("Framework op name")
    except KeyError:
        i_fw = None
    try:
        i_self = col("Total self time (us)")
    except KeyError:
        i_self = col("self time")
    try:
        i_prog = col("program")
    except KeyError:
        i_prog = None

    rows.sort(key=lambda r: -(r[i_self] or 0))
    total = sum(r[i_self] or 0 for r in rows)
    print(f"\ntotal device self time: {total / 1e6:.3f}s  "
          f"(cols: {cols})\n")
    by_cat = {}
    for r in rows:
        by_cat[r[i_cat]] = by_cat.get(r[i_cat], 0) + (r[i_self] or 0)
    print("== by category ==")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {k:<40} {v / 1e6:8.3f}s  {100 * v / total:5.1f}%")
    print(f"\n== top {top_n} ops ==")
    for r in rows[:top_n]:
        nm = (r[i_name] or "")[:60]
        fw = (r[i_fw] or "")[-110:] if i_fw is not None else ""
        print(f"  {(r[i_self] or 0) / 1e6:8.4f}s  {r[i_cat]:<20} {nm}  {fw}")


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "mixed"
    mode = sys.argv[2] if len(sys.argv) > 2 else "bwd"
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    trace_dir = f"/tmp/xprof_{scene}_{mode}"
    os.system(f"rm -rf {trace_dir}")
    capture(scene, mode, trace_dir)
    report(trace_dir, top_n)


if __name__ == "__main__":
    main()
