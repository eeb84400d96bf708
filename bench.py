#!/usr/bin/env python
"""Round benchmark entry point — prints ONE JSON line for the driver.

Measures Mrays/sec/chip (forward; forward+backward also recorded in the same
line) on the headline scene — the mixed tri-mesh + SDF config at 1080p with
16 spp (BASELINE config 5) — on the real TPU chip.

Usage: python bench.py [scene]   (extra diagnostics go to stderr)
"""

import json
import sys


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "mixed"
    from tpu_ray import bench_lib

    result = bench_lib.run_bench(scene)
    print(f"[bench] {result}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
