"""Model export: serialize the jitted forward as a portable StableHLO
artifact (jax.export) for deployment without Python model code.

Production-serving counterpart to the reference's ``torch.save`` weights-only
flow (vault/tmsc_utils/trainer.py:152-159): the exported artifact carries the
compiled computation; together with a weights checkpoint it reproduces the
model in any JAX runtime that supports the platform."""

from __future__ import annotations

import os
from typing import Callable, Sequence

import jax


def export_forward(fn: Callable, example_args: Sequence, path: str,
                   platforms: Sequence[str] = ("tpu", "cpu")) -> None:
    """Serialize ``jax.jit(fn)`` lowered for ``platforms`` to ``path``.

    ``example_args`` fix the input shapes/dtypes (static-shape export — the
    framework's one-compilation-per-task design makes this a single artifact
    per task)."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(
        *example_args)
    data = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def load_forward(path: str) -> Callable:
    """Deserialize an exported artifact; returns a callable over the same
    input pytree the export was traced with."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda *args: exported.call(*args)
