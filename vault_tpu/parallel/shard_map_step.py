"""Explicit-collective data-parallel train step via shard_map + psum.

The default trainer lets GSPMD insert the gradient all-reduce from sharding
annotations (vault_tpu/training/trainer.py).  This module is the manual
counterpart — per-shard loss/grad with an explicit ``jax.lax.psum`` over the
"data" axis — useful when collective placement must be controlled by hand
(e.g. to overlap with compute, or to fuse custom Pallas collectives later).
Equivalence with the GSPMD path is asserted in tests.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.7 public API
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_shard_map_train_step(apply_fn, loss_per_example_fn, tx, mesh):
    """Returns step(params, opt_state, batch, labels, weight, rng) ->
    (params, opt_state, loss).

    ``loss_per_example_fn(logits, labels) -> (B_local,)`` per-example losses;
    the global weighted mean and its gradient are formed with explicit psums.
    Params/optimizer state are replicated; batch/labels/weight are sharded
    along the leading axis over "data".
    """

    def per_shard(params, opt_state, batch, labels, weight, rng):
        # per-shard dropout stream: the replicated rng folded with the data
        # axis index (previously the rng argument was accepted but IGNORED
        # — dropout silently off in training)
        shard_rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def local_sum_fn(p):
            logits = apply_fn(p, batch, deterministic=False, rng=shard_rng)
            per = loss_per_example_fn(logits, labels)
            # local weighted SUM; normalization by the GLOBAL count below
            return (per * weight.astype(per.dtype)).sum()

        loss_sum, grads = jax.value_and_grad(local_sum_fn)(params)
        local_n = weight.astype(jnp.float32).sum()

        # explicit all-reduces over the data axis (ride ICI)
        global_n = jnp.maximum(jax.lax.psum(local_n, "data"), 1.0)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "data") / global_n,
                             grads)
        loss = jax.lax.psum(loss_sum, "data") / global_n

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    data_spec = P("data")
    rep = P()
    # psum makes grads replicated, so updates are identical on every shard;
    # replication checking is disabled (kwarg name changed across jax
    # versions: check_rep -> check_vma)
    kw = dict(mesh=mesh,
              in_specs=(rep, rep, data_spec, data_spec, data_spec, rep),
              out_specs=(rep, rep, rep))
    try:
        step = shard_map(per_shard, check_vma=False, **kw)
    except TypeError:  # older jax
        step = shard_map(per_shard, check_rep=False, **kw)
    return jax.jit(step)
