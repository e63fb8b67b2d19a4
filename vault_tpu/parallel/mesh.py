"""Device mesh + sharding helpers — the framework's communication layer.

The reference has NO distributed backend (SURVEY.md §2.8): its only
model-parallel construct is the dormant 2-stage PipelineVaultMixin and its
data movement is explicit ``.to(device)``.  Here parallelism is first-class:
a ``jax.sharding.Mesh`` over which pjit partitions the train step; XLA emits
the ICI collectives (psum for DP gradients) automatically.

Axes:
  * "data"  — batch sharding (DP); the BASELINE.json north star path.
  * "model" — reserved for tensor-parallel param sharding (hidden/intermediate
    dims); kept size 1 by default.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host entry point: initialize JAX's distributed runtime over DCN
    so ``jax.devices()`` spans all hosts and meshes below scale out
    (SURVEY.md §2.8 communication-backend row; the reference has no
    distributed backend at all).  No-op when already initialized or when
    env-based auto-detection applies (TPU pods set the env themselves)."""
    import jax.distributed

    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # only the benign re-initialization case may pass — a swallowed
        # connect/barrier failure would silently degrade a multi-host job
        # to independent single-process runs all writing as "process 0"
        if "already" not in str(e).lower():
            raise
    if num_processes is not None and jax.process_count() != num_processes:
        raise RuntimeError(
            f"jax.distributed joined {jax.process_count()} process(es), "
            f"expected {num_processes} — check --coordinator_address "
            "reachability and that every host launched with a distinct "
            "--process_id")


def coord_barrier(name: str, timeout_ms: int = 900_000):
    """Align all processes via the jax.distributed coordination service.

    NOT ``multihost_utils.sync_global_devices``: that runs a Gloo collective
    whose context rendezvous has a hard ~30 s window, so it cannot absorb
    the multi-minute compile-time skew it would typically be used around
    (observed failing on a contended host).  The coordination-service
    barrier takes an explicit timeout and uses only the gRPC KV service.
    No-op in single-process runs."""
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    use = np.array(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(use, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put_global(x, sh: NamedSharding):
    """Host value -> global jax.Array with sharding ``sh``.

    Single-process: plain ``device_put``.  Multi-process (the mesh spans
    devices this process cannot address): every process holds the identical
    host-global value — the deterministic seeded shuffle guarantees it — and
    ``make_array_from_callback`` hands each *addressable* device its own
    slice, so only the local rows are materialized on this host's devices and
    no cross-host data movement happens at input time (SURVEY.md §2.8
    multi-host DCN; the reference has no distributed loader at all)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def shard_batch(mesh: Mesh, batch):
    """Host batch dict -> device arrays sharded along axis 0 over "data"."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: _put_global(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: _put_global(x, sh), tree)


def pad_to_multiple(batch, multiple: int):
    """Pad every leading axis to a multiple of the mesh's data-axis size so
    uneven final batches still shard.  Returns (padded_batch, real_count)."""
    import numpy as np  # host-side only

    sizes = {x.shape[0] for x in jax.tree.leaves(batch)}
    assert len(sizes) == 1, f"inconsistent batch dims {sizes}"
    n = sizes.pop()
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    def pad(x):
        widths = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths)
    return jax.tree.map(pad, batch), n
