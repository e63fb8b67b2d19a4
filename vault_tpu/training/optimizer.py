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

    ``state_dtype`` (e.g. jnp.bfloat16) stores the m/v moments in reduced
    precision — the moment update itself is computed in fp32 and rounded once
    per step, halving the optimizer-state HBM traffic (4 tree-sized
    reads+writes per step).  Default None keeps exact fp32 HF semantics.
    """

    def lr_at(count):
        return learning_rate(count) if callable(learning_rate) else learning_rate

    def moment_like(x):
        dt = state_dtype if state_dtype is not None else x.dtype
        return jnp.zeros_like(x, dtype=dt)

    def init(params):
        return HfAdamWState(count=jnp.zeros((), jnp.int32),
                            mu=jax.tree.map(moment_like, params),
                            nu=jax.tree.map(moment_like, params))

    def _round(x):
        return x if state_dtype is None else x.astype(state_dtype)

    def update(grads, state, params=None):
        count = state.count + 1
        mu = jax.tree.map(
            lambda m, g: _round(b1 * m.astype(g.dtype) + (1 - b1) * g),
            state.mu, grads)
        nu = jax.tree.map(
            lambda v, g: _round(b2 * v.astype(g.dtype) + (1 - b2) * g * g),
            state.nu, grads)
        lr = lr_at(state.count)  # HF steps the scheduler AFTER the update, so
        # the lr used at optimizer-step t is schedule(t) with t starting at 0.
        if correct_bias:
            c = jnp.asarray(count, jnp.float32)
            step_size = lr * jnp.sqrt(1 - b2 ** c) / (1 - b1 ** c)
        else:
            step_size = lr

        def one(m, v, p):
            # math in fp32 even when the stored moments are reduced precision
            m32 = m.astype(jnp.float32)
            v32 = v.astype(jnp.float32)
            upd = -step_size * m32 / (jnp.sqrt(v32) + eps)
            if weight_decay > 0.0 and p is not None:
                upd = upd - lr * weight_decay * p
            return upd.astype(p.dtype if p is not None else m32.dtype)

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
