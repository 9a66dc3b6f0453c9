"""Per-group Adam with torch semantics (bias correction, eps OUTSIDE sqrt
added to sqrt(vhat)), eps=1e-15 — matching the reference's optimizer setup
(scene/gaussian_model.py:177: ``torch.optim.Adam(l, lr=0.0, eps=1e-15)``).

Written by hand instead of optax because densification must surgically reset
per-row first/second-moment state (the reference's cat/prune/replace optimizer
surgery, scene/gaussian_model.py:362-436); with a plain NamedTuple of pytrees
that is a trivial tree_map.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    count: jnp.ndarray  # [] int32 step counter (per-tensor in torch; global here,
                        # identical semantics since torch keeps one step per tensor)
    mu: Any             # pytree like params
    nu: Any             # pytree like params


def init(params) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree_util.tree_map(jnp.zeros_like, params))


def update(grads, state: AdamState, params, lrs, b1=0.9, b2=0.999, eps=1e-15):
    """One Adam step.  ``lrs`` is a pytree of scalars congruent with params
    (per-group learning rates).  Returns (new_params, new_state)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

    def step(p, m, v, lr):
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps)

    new_params = jax.tree_util.tree_map(step, params, mu, nu, lrs)
    return new_params, AdamState(count=count, mu=mu, nu=nu)


def mask_rows(state: AdamState, params_template, row_mask) -> AdamState:
    """Zero the moment rows where ``row_mask`` is True (new/replaced slots) —
    the fixed-capacity equivalent of the reference's optimizer-state surgery."""

    def zero_rows(x):
        m = row_mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    return AdamState(
        count=state.count,
        mu=jax.tree_util.tree_map(zero_rows, state.mu),
        nu=jax.tree_util.tree_map(zero_rows, state.nu),
    )
