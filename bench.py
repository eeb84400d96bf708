#!/usr/bin/env python
"""Round benchmark entry point — prints ONE JSON line for the driver.

Measures Mrays/sec/chip (forward; forward+backward also recorded in the same
line) on the headline scene — the mixed tri-mesh + SDF config at 1080p with
16 spp (BASELINE config 5) — on the real TPU chip.

Capture is fault-tolerant (VERDICT r2 item 2: the round-2 snapshot recorded
rc=1 on a transient axon backend-init outage). The measurement runs in a
CHILD process — a failed JAX backend init poisons the whole process, so
retries must cross a process boundary — and the parent retries up to
BENCH_ATTEMPTS times with a backoff sleep (the remote-compile service drains
its backlog over idle minutes). If every attempt fails, the parent still
prints a parseable one-line JSON with value 0 and the failure reason.

Usage: python bench.py [scene]   (extra diagnostics go to stderr)
       python bench.py --child [scene]   (internal: one measurement attempt)
"""

import json
import os
import subprocess
import sys
import time

ATTEMPTS = int(os.environ.get("BENCH_ATTEMPTS", "3"))
ATTEMPT_TIMEOUT = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "2400"))
RETRY_SLEEP = float(os.environ.get("BENCH_RETRY_SLEEP", "90"))


def child(scene: str) -> None:
    """One measurement attempt (runs in its own process)."""
    from tpu_ray import bench_lib

    result = bench_lib.run_bench(scene)
    print(f"[bench] {result}", file=sys.stderr)
    print(json.dumps(result), flush=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--child"]
    scene = args[0] if args else "mixed"
    if "--child" in sys.argv[1:]:
        child(scene)
        return

    errors = []
    for attempt in range(1, ATTEMPTS + 1):
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", scene],
                stdout=subprocess.PIPE, timeout=ATTEMPT_TIMEOUT,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            out = proc.stdout.decode(errors="replace")
            line = next((ln for ln in reversed(out.splitlines())
                         if ln.strip().startswith("{")), None)
            if proc.returncode == 0 and line:
                parsed = json.loads(line)  # validate before emitting
                parsed["attempt"] = attempt
                print(json.dumps(parsed))
                return
            detail = "invalid JSON line" if line else "no JSON line"
            errors.append(
                f"attempt {attempt}: rc={proc.returncode}, {detail}")
        except subprocess.TimeoutExpired:
            errors.append(f"attempt {attempt}: timeout after "
                          f"{ATTEMPT_TIMEOUT:.0f}s")
        except Exception as e:  # noqa: BLE001 — must never die unparsed
            errors.append(f"attempt {attempt}: {type(e).__name__}: {e}")
        print(f"[bench] {errors[-1]} (elapsed {time.time() - t0:.0f}s)",
              file=sys.stderr)
        if attempt < ATTEMPTS:
            print(f"[bench] sleeping {RETRY_SLEEP:.0f}s before retry "
                  f"(lets the remote-compile service drain)", file=sys.stderr)
            time.sleep(RETRY_SLEEP)

    # structured failure: still one parseable JSON line for the driver
    print(json.dumps({
        "metric": f"Mrays_per_sec_per_chip_fwd_{scene}_1920x1080_spp16",
        "value": 0.0,
        "unit": "Mrays/s/chip",
        "vs_baseline": 0.0,
        "error": "; ".join(errors) or "unknown failure",
        "attempts": ATTEMPTS,
    }))


if __name__ == "__main__":
    main()
