"""LR schedule registry — traced, jit-safe step->multiplier functions.

TPU-native equivalent of the reference's ``_lr_methods`` registry
(/root/reference/my_ext/lr_scheduler.py:27-143: fix/step/exp/poly/cos/
triangle...). All take a traced step scalar and static hyperparameters and
return a scalar multiplier; compose with a base LR in-graph so host-side
schedules never trigger a recompile or a per-step scalar upload.
"""
from __future__ import annotations

import math
from typing import Callable, Dict

import jax.numpy as jnp

LR_SCHEDULES: Dict[str, Callable] = {}


def register(name):
    def deco(fn):
        LR_SCHEDULES[name] = fn
        return fn
    return deco


@register('fix')
def fix(s, **kw):
    return jnp.ones_like(jnp.asarray(s, jnp.float32))


@register('step')
def step_decay(s, step_size: int = 1000, gamma: float = 0.1, **kw):
    k = jnp.floor(jnp.asarray(s, jnp.float32) / step_size)
    return jnp.power(gamma, k)


@register('exp')
def exp_decay(s, gamma: float = 0.999, **kw):
    return jnp.power(gamma, jnp.asarray(s, jnp.float32))


@register('exp2')
def exp2_decay(s, final_mult: float = 0.01, max_steps: int = 30000, **kw):
    """log-linear interpolation from 1 to final_mult over max_steps (the
    get_expon_lr_func shape without delay)."""
    t = jnp.clip(jnp.asarray(s, jnp.float32) / max_steps, 0.0, 1.0)
    return jnp.exp(t * math.log(final_mult))


@register('poly')
def poly_decay(s, power: float = 0.9, max_steps: int = 30000, **kw):
    t = jnp.clip(jnp.asarray(s, jnp.float32) / max_steps, 0.0, 1.0)
    return jnp.power(1.0 - t, power)


@register('cos')
def cos_decay(s, max_steps: int = 30000, final_mult: float = 0.0, **kw):
    t = jnp.clip(jnp.asarray(s, jnp.float32) / max_steps, 0.0, 1.0)
    c = 0.5 * (1.0 + jnp.cos(math.pi * t))
    return final_mult + (1.0 - final_mult) * c


@register('triangle')
def triangle(s, period: int = 2000, low: float = 0.1, **kw):
    t = jnp.mod(jnp.asarray(s, jnp.float32), period) / period
    tri = 1.0 - jnp.abs(2.0 * t - 1.0)
    return low + (1.0 - low) * tri


def lr_multiplier(name: str, s, **kw):
    if name not in LR_SCHEDULES:
        raise KeyError(f"unknown lr schedule {name!r}; have "
                       f"{sorted(LR_SCHEDULES)}")
    return LR_SCHEDULES[name](s, **kw)
