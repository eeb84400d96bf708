"""Parameter-gradient all-reduce for the distributed fit loop.

TPU-native equivalent of component P6 (SURVEY.md §2b): the reference has no
gradients at all; here every chip computes the gradient of ITS pixel shard's
loss w.r.t. the replicated scene parameters, and the true gradient is the
`psum` over the ray axis. Gradients are reduced in parameter-group buckets
issued as separate psums so XLA's latency-hiding scheduler CAN overlap them
with the remaining backward sweep (SURVEY.md §5 "Distributed communication
backend").

What is actually verified in this 1-chip environment (see OVERLAP.md and
tools/overlap_check.py): the buckets lower to separate all-reduce ops in the
optimized HLO, with backward compute fusions scheduled after the first
collective — i.e. the overlap window exists. Measured ICI overlap fractions
require a real multi-chip slice and remain unverified here.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from tpu_ray.dist.sharding import RAY_AXIS


def psum_buckets(grads, axis_name: str = RAY_AXIS, num_buckets: int = 4):
    """psum a gradient pytree in several leaf buckets (separate collectives).

    Leaves are assigned round-robin by size order so buckets are balanced;
    each bucket becomes one psum op, giving the scheduler independent
    collectives to overlap with compute.
    """
    leaves, treedef = jax.tree_util.tree_flatten(grads)
    if not leaves:
        return grads
    order = sorted(range(len(leaves)), key=lambda i: -leaves[i].size)
    buckets: list[list[int]] = [[] for _ in range(min(num_buckets, len(leaves)))]
    for rank, i in enumerate(order):
        buckets[rank % len(buckets)].append(i)
    out = [None] * len(leaves)
    for bucket in buckets:
        reduced = jax.lax.psum(tuple(leaves[i] for i in bucket), axis_name)
        for i, g in zip(bucket, reduced):
            out[i] = g
    return jax.tree_util.tree_unflatten(treedef, out)


def pmean_tree(tree, axis_name: str = RAY_AXIS):
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis_name), tree)
