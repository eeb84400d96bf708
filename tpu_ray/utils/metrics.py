"""Timing, ray statistics and structured metrics logging.

TPU-native equivalent of the reference's Timer + on-screen Mrays/s overlay
(SURVEY.md §2 #4, #19): wall-clock timing around blocked device execution,
ray-throughput accounting (primary + shadow + AO rays, like the reference's
per-frame counters), and JSONL metrics instead of a bitmap-font overlay.
`jax.profiler.trace` wrapping for Perfetto/XProf traces (SURVEY.md §5
"Tracing / profiling") is exposed via `profile_trace`.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Optional


class Timer:
    """Wall-clock timer; call .start(), .stop() or use as a context manager."""

    def __init__(self):
        self.elapsed = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self) -> float:
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


def rays_per_frame(cfg, scene=None) -> int:
    """Rays counted for Mrays/s: primary samples + one shadow ray per light
    per sample. AO taps and shadow-march steps are DE evaluations, not rays,
    and are deliberately not counted (keeps the metric comparable across
    shading configs)."""
    primary = cfg.width * cfg.height * cfg.spp
    shadow = 0
    if cfg.shadow != "none" and scene is not None:
        shadow = primary * scene.lights.direction.shape[0]
    return primary + shadow


def mrays_per_sec(n_rays: int, seconds: float) -> float:
    return n_rays / max(seconds, 1e-12) / 1e6


@dataclass
class MetricsLogger:
    """Structured JSONL metrics (process-0 stdout and/or a file)."""

    path: Optional[str] = None
    echo: bool = False
    _fh: object = field(default=None, repr=False)

    def log(self, **kv):
        kv.setdefault("ts", time.time())
        line = json.dumps(kv)
        if self.path:
            if self._fh is None:
                object.__setattr__(self, "_fh", open(self.path, "a"))
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo:
            print(line)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler.trace wrapper; no-op when log_dir is None."""
    import jax

    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield


def _force(result):
    """Block until `result` is actually computed.

    block_until_ready alone can return early through the remote-device
    tunnel (observed: a 1024x1024 frame "completing" in 0.1 ms); fetching
    one scalar element of every leaf forces real completion at negligible
    transfer cost.
    """
    import jax
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(result):
        if hasattr(leaf, "shape"):
            np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
    return result


def block_and_time(fn, *args, warmup: int = 1, iters: int = 3, **kw):
    """Run fn (device computation) with warmup, return (result, best_seconds)."""
    result = None
    for _ in range(max(warmup, 1)):
        result = _force(fn(*args, **kw))
    best = float("inf")
    for _ in range(max(iters, 1)):
        t = Timer().start()
        result = _force(fn(*args, **kw))
        best = min(best, t.stop())
    return result, best
