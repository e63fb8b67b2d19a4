"""ZeRO-1 optimizer-state sharding over the data-parallel mesh axis.

The reference has no distributed optimizer at all (SURVEY.md §2.8: no
torch.distributed anywhere); plain GSPMD data parallelism replicates the
AdamW moments and runs the full elementwise update on every chip.  Measured
on v5e (docs/BENCHMARKS.md) that update is ~7.7–9.4 ms of pure HBM traffic
per step — with N-way DP it is the same N times over, plus N full copies of
the m/v state in HBM.

TPU-native ZeRO-1 is just sharding annotations: give every moment leaf a
PartitionSpec that splits its largest divisible axis over "data" and let
GSPMD partition the update elementwise and insert the all-gather for the
parameter application.  Each chip then stores 1/N of m/v and does 1/N of
the update work; gradients are already replicated by the DP psum.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(shape, dp: int) -> P:
    """Spec sharding the largest axis divisible by ``dp`` (ties -> first);
    replicated when nothing divides (scalars, tiny vectors)."""
    best = None
    for i, d in enumerate(shape):
        if d % dp == 0 and d >= dp and (best is None or d > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = "data"
    return P(*spec)


def zero_opt_shardings(opt_state, mesh: Mesh):
    """NamedSharding tree for an optimizer state: moment-shaped leaves are
    split over the mesh "data" axis, scalars (step counts) replicated."""
    dp = int(mesh.shape["data"])

    def one(x):
        shape = np.shape(x)
        return NamedSharding(mesh, _leaf_spec(shape, dp))

    return jax.tree.map(one, opt_state)


def place_zero(opt_state, mesh: Mesh):
    """Device-place an optimizer state with ZeRO-1 shardings."""
    return jax.device_put(opt_state, zero_opt_shardings(opt_state, mesh))
