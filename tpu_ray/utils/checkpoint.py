"""Orbax checkpointing of the fit state (params, optimizer state, step).

SURVEY.md §5 "Checkpoint / resume": the reference has no training loop and no
persistence beyond screenshots; the new framework checkpoints the fit state
every K steps and resumes after failure (gang-restart model — renders are
seconds-to-minutes, so no elastic resize).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp


def make_manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save(mngr: ocp.CheckpointManager, step: int, params, opt_state) -> None:
    mngr.save(step, args=ocp.args.Composite(
        params=ocp.args.StandardSave(params),
        opt_state=ocp.args.StandardSave(opt_state),
    ))


def restore_latest(mngr: ocp.CheckpointManager, params_like, opt_state_like
                   ) -> Optional[Tuple[object, object, int]]:
    """Restore the newest checkpoint, or None if the directory is empty.

    params_like/opt_state_like provide the pytree structure + shapes/dtypes.
    """
    step = mngr.latest_step()
    if step is None:
        return None
    abstract = lambda tree: jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, tree)
    restored = mngr.restore(step, args=ocp.args.Composite(
        params=ocp.args.StandardRestore(abstract(params_like)),
        opt_state=ocp.args.StandardRestore(abstract(opt_state_like)),
    ))
    return restored["params"], restored["opt_state"], step
