"""Optimizer + LR schedule matching the reference's training recipe.

Reference: HF ``AdamW`` with a ``correct_bias`` switch (default False — the
flag is ``action="store_true"``, vault/tmsc_utils/trainer.py:69, 244-253) and
``get_linear_schedule_with_warmup`` (:262-280).  HF AdamW semantics differ
from optax.adamw in two ways we reproduce exactly:

  * bias correction is OPTIONAL (HF: ``step_size *= sqrt(1-b2^t)/(1-b1^t)``
    only when correct_bias=True);
  * decoupled weight decay uses the *scheduled* lr and — as the reference
    passes one parameter group — applies to every parameter.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def linear_warmup_linear_decay(base_lr: float, warmup_steps: int,
                               total_steps: int) -> Callable:
    """HF get_linear_schedule_with_warmup: linear 0->lr over warmup, then
    linear lr->0 over the remainder."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(warmup_steps, 1)
        ramp = step / warm
        decay = jnp.maximum(
            0.0, (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1))
        return base_lr * jnp.where(step < warmup_steps, ramp, decay)

    return schedule


class HfAdamWState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


# ---------------------------------------------------------------------------
# Blockwise int8 moment storage (8-bit-Adam style, absmax per block)
# ---------------------------------------------------------------------------
#
# ``state_dtype="int8"`` stores each moment leaf as (int8 codes, one fp32
# absmax scale per 256-value block).  The moment math still runs in fp32 —
# quantization happens once per step on the new moment value — so this
# quarters the m/v HBM read+write traffic vs fp32 (halves it vs bf16) and
# shrinks optimizer checkpoints the same way.  The second moment is stored
# as sqrt(v): the square root compresses v's dynamic range so a linear
# 8-bit code covers it (the same reason 8-bit Adam uses a nonlinear map).

INT8_BLOCK = 256


class Q8Moment(NamedTuple):
    q: jax.Array      # int8 (nb, INT8_BLOCK)
    scale: jax.Array  # fp32 (nb, 1) per-block absmax / 127


def _q8_encode(x: jax.Array) -> Q8Moment:
    flat = x.astype(jnp.float32).ravel()
    nb = -(-flat.size // INT8_BLOCK)
    flat = jnp.pad(flat, (0, nb * INT8_BLOCK - flat.size))
    blocks = flat.reshape(nb, INT8_BLOCK)
    scale = jnp.maximum(jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
                        / 127.0, 1e-12)
    q = jnp.clip(jnp.round(blocks / scale), -127, 127).astype(jnp.int8)
    return Q8Moment(q=q, scale=scale)


def _q8_decode(m: Q8Moment, shape) -> jax.Array:
    flat = (m.q.astype(jnp.float32) * m.scale).ravel()
    size = 1
    for d in shape:
        size *= d
    return flat[:size].reshape(shape)


def hf_adamw(
    learning_rate,  # float or schedule
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    correct_bias: bool = False,
    state_dtype=None,
) -> optax.GradientTransformation:
    """HF-AdamW as an optax transformation (SURVEY.md §7 hard part 5).

    ``state_dtype`` stores the m/v moments in reduced precision — the moment
    update itself is computed in fp32 and rounded/encoded once per step:
      * None (default): exact fp32 HF semantics;
      * jnp.bfloat16: halves the optimizer-state HBM traffic (4 tree-sized
        reads+writes per step);
      * "int8" / jnp.int8: blockwise-quantized moments (Q8Moment above) —
        quarter traffic / state size vs fp32.
    """
    int8_mode = state_dtype is not None and jnp.dtype(state_dtype) == jnp.int8

    def lr_at(count):
        return learning_rate(count) if callable(learning_rate) else learning_rate

    def moment_like(x):
        if int8_mode:
            return _q8_encode(jnp.zeros(x.shape, jnp.float32))
        dt = state_dtype if state_dtype is not None else x.dtype
        return jnp.zeros_like(x, dtype=dt)

    def init(params):
        return HfAdamWState(count=jnp.zeros((), jnp.int32),
                            mu=jax.tree.map(moment_like, params),
                            nu=jax.tree.map(moment_like, params))

    def _round(x):
        return x if state_dtype is None else x.astype(state_dtype)

    def _step_size(count):
        lr = lr_at(count - 1)  # HF steps the scheduler AFTER the update, so
        # the lr used at optimizer-step t is schedule(t) with t starting at 0.
        if correct_bias:
            c = jnp.asarray(count, jnp.float32)
            return lr, lr * jnp.sqrt(1 - b2 ** c) / (1 - b1 ** c)
        return lr, lr

    def _decay(upd, lr, p):
        if weight_decay > 0.0 and p is not None:
            upd = upd - lr * weight_decay * p
        return upd.astype(p.dtype if p is not None else upd.dtype)

    def update_q8(grads, state, params=None):
        count = state.count + 1
        lr, step_size = _step_size(count)
        g_leaves, tdef = jax.tree.flatten(grads)
        mu_leaves = tdef.flatten_up_to(state.mu)
        nu_leaves = tdef.flatten_up_to(state.nu)
        p_leaves = (tdef.flatten_up_to(params) if params is not None
                    else [None] * len(g_leaves))
        new_mu, new_nu, upds = [], [], []
        for g, mq, nq, p in zip(g_leaves, mu_leaves, nu_leaves, p_leaves):
            g32 = g.astype(jnp.float32)
            m32 = b1 * _q8_decode(mq, g.shape) + (1 - b1) * g32
            s = _q8_decode(nq, g.shape)          # stored sqrt(v)
            v32 = b2 * s * s + (1 - b2) * g32 * g32
            new_mu.append(_q8_encode(m32))
            new_nu.append(_q8_encode(jnp.sqrt(v32)))
            upds.append(_decay(-step_size * m32 / (jnp.sqrt(v32) + eps),
                               lr, p))
        return (jax.tree.unflatten(tdef, upds),
                HfAdamWState(count=count,
                             mu=jax.tree.unflatten(tdef, new_mu),
                             nu=jax.tree.unflatten(tdef, new_nu)))

    def update(grads, state, params=None):
        if int8_mode:
            return update_q8(grads, state, params)
        count = state.count + 1
        # moment math always in fp32 — grads may arrive bf16 (TrainArgs
        # grad_dtype traffic optimization) and moments may be stored reduced
        mu = jax.tree.map(
            lambda m, g: _round(b1 * m.astype(jnp.float32)
                                + (1 - b1) * g.astype(jnp.float32)),
            state.mu, grads)
        nu = jax.tree.map(
            lambda v, g: _round(b2 * v.astype(jnp.float32)
                                + (1 - b2) * jnp.square(g.astype(jnp.float32))),
            state.nu, grads)
        lr, step_size = _step_size(count)

        def one(m, v, p):
            # math in fp32 even when the stored moments are reduced precision
            m32 = m.astype(jnp.float32)
            v32 = v.astype(jnp.float32)
            return _decay(-step_size * m32 / (jnp.sqrt(v32) + eps), lr, p)

        if params is None:
            # optax contract: params are optional when nothing needs them —
            # only weight decay does here (tree.map with a None params tree
            # would raise a structure mismatch; update_q8 already handles it)
            if weight_decay > 0.0:
                raise ValueError(
                    "hf_adamw with weight_decay > 0 needs params in update()")
            updates = jax.tree.map(lambda m, v: one(m, v, None), mu, nu)
        else:
            updates = jax.tree.map(one, mu, nu, params)
        return updates, HfAdamWState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(lr: float, num_steps: int, warmup_ratio: float = 0.1,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                   weight_decay: float = 0.0, correct_bias: bool = False,
                   state_dtype=None):
    """The reference recipe: warmup_ratio of total steps, then linear decay
    (vault/tmsc_utils/trainer.py:262-280)."""
    warmup = int(warmup_ratio * num_steps)
    schedule = linear_warmup_linear_decay(lr, warmup, num_steps)
    return hf_adamw(schedule, b1, b2, eps, weight_decay, correct_bias,
                    state_dtype=state_dtype), schedule
