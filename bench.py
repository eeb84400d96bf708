#!/usr/bin/env python
"""Round benchmark entry point — prints ONE JSON line for the driver.

Measures Mrays/sec/chip (forward; forward+backward also recorded in the same
line) on the headline-feasible scene on the real TPU chip. Scene selection
tracks the perf milestones: the Mandelbulb config (BASELINE config 4) until
the DDA hot path is TPU-optimized, then the mixed 1080p scene (config 5).

Usage: python bench.py [scene]   (extra diagnostics go to stderr)
"""

import json
import sys


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "mandelbulb"
    from src import bench_lib

    result = bench_lib.run_bench(scene)
    print(f"[bench] {result}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
