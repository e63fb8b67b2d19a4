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

import re
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


# ---------------------------------------------------------------------------
# Structural HLO guard.
#
# The 95%-MFU in-band sanity check in bench.py cannot catch a ~13%-scale
# exclusion — exactly the magnitude of the rounds-1-3 text-tower hoist that
# went unnoticed.  The reliable detector is structural: in the OPTIMIZED HLO
# of a chained bench program, every matmul-bearing op (dot / convolution)
# must sit inside the timing ``while`` body.  An op that LICM hoisted runs
# once, outside the loop, and drops out of the slope.
#
# Op metadata (op_name="jit(...)/while/body/...") is NOT usable for this:
# XLA preserves metadata through transformations, so a hoisted op still
# carries its old in-loop op_name.  We instead parse the computation graph
# (each computation block, its ops, and the computations it calls via
# calls=/body=/condition=/to_apply=/branch_computations=) and walk REAL
# reachability from every while op's body, transitively through fusions and
# nested whiles (lax.scan inside the bench body compiles to a nested while).
# ---------------------------------------------------------------------------

_MATMUL_OPS = ("dot", "convolution")
# attr value is either a single %name or a brace group {%a, %b} — a lax
# value pattern here swallows the NEXT attr's keyword (condition=..., body=
# ... parse as one match) and silently drops the body target
_CALL_ATTRS = re.compile(
    r"(calls|body|condition|to_apply|branch_computations|"
    r"called_computations)=(?:(%[\w.\-]+)|\{([^}]*)\})")
_COMP_HEADER = re.compile(r"^(?:ENTRY\s+)?(%?[\w.\-]+)\s*\(.*\)\s*->")
_OPCODE = re.compile(r"=\s+[\w\[\]{},\s/*]+?\s([a-z][\w\-]*)\(")


def _parse_hlo_computations(hlo_text: str):
    """hlo text -> ({computation: (matmul_count, while_bodies, callees)},
    entry_name).

    ``while_bodies`` are the body= targets of while ops in that computation;
    ``callees`` every other referenced computation (fusions, conds, calls).
    """
    comps: Dict[str, tuple] = {}
    entry = None
    name, matmuls, bodies, callees = None, 0, [], []
    for line in hlo_text.splitlines():
        if not line.startswith(" "):  # top level: header or blank or '}'
            m = _COMP_HEADER.match(line)
            if name is not None and (m or line.startswith("}")):
                comps[name] = (matmuls, bodies, callees)
                name = None
            if m:
                name = m.group(1).lstrip("%")
                if line.startswith("ENTRY"):
                    entry = name
                matmuls, bodies, callees = 0, [], []
            continue
        if name is None:
            continue
        op = _OPCODE.search(line)
        opcode = op.group(1) if op else ""
        if opcode in _MATMUL_OPS:
            matmuls += 1
        for attr in _CALL_ATTRS.finditer(line):
            raw = attr.group(2) or attr.group(3) or ""
            targets = [t.strip().lstrip("%")
                       for t in raw.split(",") if t.strip()]
            if attr.group(1) == "body":
                bodies.extend(targets)
            else:
                callees.extend(targets)
    if name is not None:
        comps[name] = (matmuls, bodies, callees)
    return comps, entry


def matmul_loop_placement(hlo_text: str) -> Tuple[int, int]:
    """(inside, outside): matmul-bearing ops inside the TIMING while of a
    chained bench program vs anywhere else, over its optimized HLO text.

    ``outside > 0`` means part of the model was hoisted out of the slope
    (the rounds-1-3 bug) — the measurement is invalid.

    Identifying the timing loop matters: when LICM hoists a tower, the
    hoisted part is typically itself a while (lax.scan over layers) that
    lands in ENTRY as a SIBLING while executing once before the timing
    loop (observed: the buggy tiny-VAuLT program compiles to two
    entry-level whiles, the BERT scan with 8 dots + the timing loop).  So
    "reachable from any while body" would count hoisted matmuls as
    in-loop and miss exactly the bug this guards against.  A well-formed
    chained program compiles to exactly ONE entry-level while — every
    model scan nests inside it.  We take the LAST entry-level while (the
    one consuming any hoisted results) as the timing loop and count
    matmuls transitively reachable from its body; everything else —
    hoisted sibling whiles included — is outside.
    """
    comps, entry = _parse_hlo_computations(hlo_text)
    total = sum(m for m, _, _ in comps.values())
    entry_bodies = comps[entry][1] if entry in comps else []
    if not entry_bodies:
        return 0, total  # no timing loop at all: everything is outside
    inside_set, stack = set(), [entry_bodies[-1]]
    while stack:
        comp = stack.pop()
        if comp in inside_set or comp not in comps:
            continue
        inside_set.add(comp)
        _, bodies, callees = comps[comp]
        stack.extend(bodies)
        stack.extend(callees)
    inside = sum(comps[c][0] for c in inside_set)
    return inside, total - inside


def chained_hlo_is_sound(jitted, *abstract_args) -> Tuple[bool, int, int]:
    """Lower+compile ``jitted`` for the CURRENT default backend and check
    no matmul escaped the timing loop.  Returns (ok, inside, outside)."""
    txt = jitted.lower(*abstract_args).compile().as_text()
    inside, outside = matmul_loop_placement(txt)
    return outside == 0 and inside > 0, inside, outside
