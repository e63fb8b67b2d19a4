"""Chained-loop benchmarking helpers.

The repo's device-throughput benches time a jitted ``lax.fori_loop`` that
chains K forwards and report the (t_hi - t_lo) / (K_hi - K_lo) slope, so
the ~40 ms tunnel RTT and host<->device transfers cancel (bench.py
docstring).  That only measures the FULL model if every iteration's work
is data-dependent on the previous iteration's output — anything computed
purely from loop-INVARIANT inputs is legally hoisted out of the while
loop by XLA's loop-invariant code motion and runs ONCE, silently
vanishing from the slope.

Rounds 1-3 fed the loop carry back into ``pixel_values`` only.  The text
tower consumes ``input_ids``/``attention_mask``/``token_type_ids``, all
loop-invariant, so its entire forward was hoisted: every recorded forward
"pairs/sec" excluded the BERT tower (~13% of bench FLOPs), and the
round-4 Llama-8B probe returned a physically impossible 6.91 ms/step for
an 8B-parameter tower (>= 24 ms at the chip's int8 peak) because ~92% of
its FLOPs had been hoisted.  Verified on CPU: without the text-side
dependency the expensive tower contributes ZERO slope; with it, full
cost (tests/test_bench_loop.py pins both directions).

:func:`feedback_batch` closes the hole: every array in the batch becomes
data-dependent on the carry.  Float arrays get the usual tiny additive
perturbation.  Integer arrays (token ids, masks) must keep their exact
values — perturbed ids would change gather indices and mask semantics —
so they get ``isnan(feedback)`` cast to int: always 0 at runtime, but a
compiler can only fold ``isnan(x)`` to false by proving ``x`` is never
NaN, which it cannot for a real model output.  The adds are elementwise
epilogues XLA fuses into the first consumer; measured loop overhead is
noise-level (same-session A/B in docs/BENCHMARKS.md).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def feedback_batch(batch: Dict[str, jax.Array], feedback: jax.Array,
                   float_scale: float = 1.0) -> Dict[str, jax.Array]:
    """Copy of ``batch`` where EVERY array depends on ``feedback``.

    ``feedback`` is a scalar derived from the previous iteration's output
    (callers scale it to be numerically negligible, e.g. ``out[0, 0] *
    1e-9``).  Floats get ``+ feedback * float_scale``; integers get an
    always-zero-at-runtime, non-foldable term so values are bit-identical
    while still loop-carried.
    """
    fb32 = feedback.astype(jnp.float32) * float_scale
    zero_i = jnp.isnan(fb32).astype(jnp.int32)  # 0 at runtime, unprovable
    out = {}
    for key, val in batch.items():
        if jnp.issubdtype(val.dtype, jnp.floating):
            out[key] = val + fb32.astype(val.dtype)
        else:
            out[key] = val + zero_i.astype(val.dtype)
    return out


def make_chained_forward(
    apply_fn: Callable[[dict, Dict[str, jax.Array]], jax.Array],
    pooled_shape: Tuple[int, ...],
) -> Callable[[dict, Dict[str, jax.Array], jax.Array], jax.Array]:
    """Build the standard chained timing function.

    ``apply_fn(params, batch) -> pooled`` runs one full forward and
    returns a float array whose ``[0, 0]`` element seeds the next
    iteration's feedback.  The returned ``chained(params, batch, k)``
    takes the iteration count as a traced scalar so ONE compilation
    serves every k (a fresh program per k would cost ~6 min each through
    the remote compile relay).
    """

    def chained(params, batch, k):
        def body(_, carry):
            fb, _ = carry
            out = apply_fn(params, feedback_batch(batch, fb))
            return ((out[0, 0] * 1e-9).astype(jnp.bfloat16), out)

        init = (jnp.zeros((), jnp.bfloat16),
                jnp.zeros(pooled_shape, jnp.bfloat16))
        _, out = jax.lax.fori_loop(0, k, body, init)
        return out

    return chained
