"""Debug / sanitizer utilities: the functional analog of race detectors.

SURVEY.md §5 "Race detection / sanitizers": the reference's only shared
mutable state is its tile queue; in this framework races are designed out
(pure functional render), and the analogous failure modes are numeric — NaNs
escaping a kernel, out-of-range indices in accel structures, silent padding
mistakes. This module packages the standard JAX tools for them:

  * `checked(fn)` — jax.experimental.checkify wrapper surfacing NaN/OOB/div
    errors from jitted code as Python exceptions;
  * `assert_finite(tree)` — host-side sweep of a pytree (post-run gate);
  * `nan_debug()` — context manager enabling jax_debug_nans;
  * Pallas "sanitizer mode" is interpret=True on the kernels (exercised by
    the CPU test suite, see tests/test_pallas.py).
"""

from __future__ import annotations

import contextlib
from typing import Callable

import numpy as np
import jax
from jax.experimental import checkify


def checked(fn: Callable, errors=checkify.float_checks) -> Callable:
    """Wrap fn so NaN/Inf (and optionally index/div) errors raise on host.

    Usage: img = checked(render)(scene); raises ValueError on the first
    NaN-producing op with its source location.
    """
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kw):
        err, out = cfn(*args, **kw)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite(tree, name: str = "tree") -> None:
    """Host-side finiteness sweep over a pytree of arrays."""
    bad = []

    def visit(path, leaf):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise AssertionError(f"non-finite values in {name}: {bad}")


@contextlib.contextmanager
def nan_debug():
    """Enable jax_debug_nans inside the context (eager NaN tracebacks)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)
