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


def _moment_fields(state):
    """Names of the state fields holding per-param moment pytrees (works for
    every optimizer in the registry: Adam mu/nu, SGD mu, Adan
    mu/delta/nu/prev_grad); scalar fields like ``count`` are skipped."""
    return [f for f in state._fields if isinstance(getattr(state, f), dict)]


def _apply_surgery(state, name: str, fn):
    repl = {}
    for f in _moment_fields(state):
        d = dict(getattr(state, f))
        d[name] = fn(d[name])
        repl[f] = d
    return state._replace(**repl)


def reset_rows(state, name: str, row_mask: jnp.ndarray):
    """Zero the moments of rows selected by ``row_mask`` in leaf ``name``
    (dict-pytree params). The surgery applied when Gaussians are replaced,
    cloned or split (reference change_optimizer op='replace'/'concat')."""
    def zero_rows(x):
        m = row_mask.reshape(row_mask.shape[0], *([1] * (x.ndim - 1)))
        return jnp.where(m, jnp.zeros_like(x), x)

    return _apply_surgery(state, name, zero_rows)


def reset_leaf(state, name: str):
    """Zero the full moments of one leaf (replace-op surgery)."""
    return _apply_surgery(state, name, jnp.zeros_like)


def permute_rows(state, name: str, perm: jnp.ndarray, valid: jnp.ndarray):
    """Gather-rows surgery (prune-compaction / superpoint reorder):
    row i <- row perm[i] where valid[i], else zeros."""
    def do(x):
        g = x[perm]
        m = valid.reshape(valid.shape[0], *([1] * (x.ndim - 1)))
        return jnp.where(m, g, jnp.zeros_like(g))

    return _apply_surgery(state, name, do)


# ------------------------------------------------------------ other optimizers
#
# TPU-native registry mirroring the reference's OPTIMIZERS
# (/root/reference/my_ext/optimizer/__init__.py: sgd/adam/adamw + Adan/RAdam).
# All share the (grads, state, params, lr_tree) update signature with
# per-leaf traced LRs; states are pytrees so surgery/checkpointing work
# uniformly.


class SGDState(NamedTuple):
    mu: Any                 # momentum buffers
    count: jnp.ndarray


def sgd_init(params) -> SGDState:
    return SGDState(mu=jax.tree.map(jnp.zeros_like, params),
                    count=jnp.zeros((), jnp.int32))


def sgd_update(grads, state: SGDState, params, lr_tree,
               momentum: float = 0.9, nesterov: bool = False,
               weight_decay: float = 0.0, clip_norm: float = 0.0):
    if clip_norm and clip_norm > 0:
        grads, _ = clip_by_global_norm(grads, clip_norm)
    if weight_decay:
        grads = jax.tree.map(lambda g, p: g + weight_decay * p, grads, params)
    mu = jax.tree.map(lambda m, g: momentum * m + g, state.mu, grads)
    step_dir = jax.tree.map(lambda m, g: momentum * m + g, mu, grads) \
        if nesterov else mu
    new_params = jax.tree.map(lambda p, d, lr: p - lr * d,
                              params, step_dir, lr_tree)
    return new_params, SGDState(mu=mu, count=state.count + 1)


def adamw_update(grads, state: AdamState, params, lr_tree,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15,
                 weight_decay: float = 1e-2, clip_norm: float = 0.0):
    """Decoupled weight decay on top of adam_update (AdamW)."""
    new_params, new_state = adam_update(grads, state, params, lr_tree,
                                        b1=b1, b2=b2, eps=eps,
                                        clip_norm=clip_norm)
    new_params = jax.tree.map(lambda np_, p, lr: np_ - lr * weight_decay * p,
                              new_params, params, lr_tree)
    return new_params, new_state


class AdanState(NamedTuple):
    mu: Any      # EMA of grads
    delta: Any   # EMA of grad differences
    nu: Any      # EMA of squared (g + (1-b2) * diff)
    prev_grad: Any
    count: jnp.ndarray


def adan_init(params) -> AdanState:
    z = lambda: jax.tree.map(jnp.zeros_like, params)
    return AdanState(mu=z(), delta=z(), nu=z(), prev_grad=z(),
                     count=jnp.zeros((), jnp.int32))


def adan_update(grads, state: AdanState, params, lr_tree,
                b1: float = 0.98, b2: float = 0.92, b3: float = 0.99,
                eps: float = 1e-8, weight_decay: float = 0.0,
                clip_norm: float = 0.0):
    """Adan (Xie et al. 2022, the reference vendors a 312-LoC copy): adaptive
    Nesterov momentum from gradient differences."""
    if clip_norm and clip_norm > 0:
        grads, _ = clip_by_global_norm(grads, clip_norm)
    count = state.count + 1
    c = count.astype(jnp.float32)
    first = (c <= 1.0)
    diff = jax.tree.map(
        lambda g, pg: jnp.where(first, jnp.zeros_like(g), g - pg),
        grads, state.prev_grad)
    mu = jax.tree.map(lambda m, g: (1 - b1) * m + b1 * g, state.mu, grads)
    delta = jax.tree.map(lambda d, dg: (1 - b2) * d + b2 * dg,
                         state.delta, diff)
    update_g = jax.tree.map(lambda g, dg: g + (1 - b2) * dg, grads, diff)
    nu = jax.tree.map(lambda v, u: (1 - b3) * v + b3 * u * u,
                      state.nu, update_g)
    bc1 = 1.0 - (1 - b1) ** c
    bc2 = 1.0 - (1 - b2) ** c
    bc3 = 1.0 - (1 - b3) ** c

    def upd(p, m, d, v, lr):
        denom = jnp.sqrt(v / bc3) + eps
        step = (m / bc1 + (1 - b2) * d / bc2) / denom
        p_new = p - lr * step
        if weight_decay:
            p_new = p_new / (1.0 + lr * weight_decay)
        return p_new

    new_params = jax.tree.map(upd, params, mu, delta, nu, lr_tree)
    return new_params, AdanState(mu=mu, delta=delta, nu=nu, prev_grad=grads,
                                 count=count)


OPTIMIZERS = {
    'adam': (adam_init, adam_update),
    'adamw': (adam_init, adamw_update),
    'sgd': (sgd_init, sgd_update),
    'adan': (adan_init, adan_update),
}


def make_optimizer(name: str):
    """(init_fn, update_fn) by name — reference OPTIMIZERS registry
    equivalent (my_ext/optimizer/build.py:85)."""
    if name not in OPTIMIZERS:
        raise KeyError(f"unknown optimizer {name!r}; have {list(OPTIMIZERS)}")
    return OPTIMIZERS[name]
