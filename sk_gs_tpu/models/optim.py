"""Adam with per-leaf learning rates and capacity-mask surgery.

TPU-native replacement for the reference's torch.optim.Adam + per-group LR
scheduling (/root/reference/networks/gaussian_splatting.py:443-472,
optimizer_cfg eps=1e-15 in exps/default.yaml) and its optimizer-state surgery
on densify/prune/replace (``change_optimizer``, gaussian_splatting.py:515-563).

Design: parameters live in capacity-padded pytrees; learning rates are a
pytree of *traced scalars* matching the params (so host-side LR schedules
never recompile); surgery is expressed as masked row writes on the moment
pytrees inside jit instead of tensor re-allocation.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any     # first moments, same pytree as params
    nu: Any     # second moments
    count: jnp.ndarray  # [] int32 step count


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def clip_by_global_norm(grads, max_norm: float):
    """Global-norm gradient clipping (the reference's --grad-clip option,
    my_ext/framework.py execute_backward)."""
    leaves = jax.tree.leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves) + 1e-20)
    scale = jnp.minimum(1.0, max_norm / gnorm)
    return jax.tree.map(lambda g: g * scale, grads), gnorm


def adam_update(grads, state: AdamState, params, lr_tree,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15,
                clip_norm: float = 0.0):
    """One Adam step. lr_tree: pytree of scalars matching params (0 freezes
    a leaf exactly — mirrors the reference's per-group lr control)."""
    if clip_norm and clip_norm > 0:
        grads, _ = clip_by_global_norm(grads, clip_norm)
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** c
    bc2 = 1.0 - b2 ** c

    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

    def upd(p, m, v, lr):
        m_hat = m / bc1
        v_hat = v / bc2
        return p - lr * m_hat / (jnp.sqrt(v_hat) + eps)

    new_params = jax.tree.map(upd, params, mu, nu, lr_tree)
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def reset_rows(state: AdamState, name: str, row_mask: jnp.ndarray) -> AdamState:
    """Zero the moments of rows selected by ``row_mask`` in leaf ``name``
    (dict-pytree params). The surgery applied when Gaussians are replaced,
    cloned or split (reference change_optimizer op='replace'/'concat')."""
    def zero_rows(x):
        m = row_mask.reshape(row_mask.shape[0], *([1] * (x.ndim - 1)))
        return jnp.where(m, jnp.zeros_like(x), x)

    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[name] = zero_rows(mu[name])
    nu[name] = zero_rows(nu[name])
    return state._replace(mu=mu, nu=nu)


def reset_leaf(state: AdamState, name: str) -> AdamState:
    """Zero the full moments of one leaf (replace-op surgery)."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[name] = jnp.zeros_like(mu[name])
    nu[name] = jnp.zeros_like(nu[name])
    return state._replace(mu=mu, nu=nu)


def permute_rows(state: AdamState, name: str, perm: jnp.ndarray,
                 valid: jnp.ndarray) -> AdamState:
    """Gather-rows surgery (prune-compaction / superpoint reorder):
    row i <- row perm[i] where valid[i], else zeros."""
    def do(x):
        g = x[perm]
        m = valid.reshape(valid.shape[0], *([1] * (x.ndim - 1)))
        return jnp.where(m, g, jnp.zeros_like(g))

    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[name] = do(mu[name])
    nu[name] = do(nu[name])
    return state._replace(mu=mu, nu=nu)
