"""Functional MLPs as plain pytrees (weights dict) + pure apply functions.

Parity target: ``MLP`` and ``MLP_with_skips``
(/root/reference/my_ext/blocks/mlp.py:9-90): ReLU hidden activations, skip
connections concatenate the *input* after the ReLU of listed layers, and a
multi-head variant where ``out_channels`` is a list -> one output per head.

Plain pytrees (no flax) keep parameter surgery trivial (the SK-GS training
schedule replaces / distills whole networks mid-run) and shard naturally
under jax.sharding.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    both weight and bias (keeps our nets statistically parity with reference)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, minval=-bound, maxval=bound)
    return {'w': w, 'b': b}


def linear_apply(p, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p['w'] + p['b']


def mlp_init(key, in_channels: int, dim_hidden: int, num_layers: int,
             out_channels: Union[int, Sequence[int]] = 0,
             skips: Sequence[int] = (), dtype=jnp.float32) -> Dict[str, Any]:
    """Initialize an MLP-with-skips pytree.

    Structure: {'layers': [linear...], 'heads': [linear...] or None}
    """
    skips = tuple(skips)
    keys = jax.random.split(key, num_layers + 8)
    layers = []
    cin = in_channels
    for i in range(num_layers):
        layers.append(_linear_init(keys[i], cin, dim_hidden, dtype))
        cin = dim_hidden + (in_channels if i in skips else 0)
    params: Dict[str, Any] = {'layers': layers}
    if isinstance(out_channels, int):
        heads = None if out_channels <= 0 else [_linear_init(keys[num_layers], cin, out_channels, dtype)]
    else:
        heads = [_linear_init(keys[num_layers + j], cin, oc, dtype)
                 for j, oc in enumerate(out_channels)]
    params['heads'] = heads
    return params


def mlp_apply(params: Dict[str, Any], x: jnp.ndarray, skips: Sequence[int] = (),
              multi_head: bool = False):
    """Apply the MLP. ``skips`` must match init. If the net was built with a
    list of out_channels, pass multi_head=True to get a tuple of outputs."""
    skips = tuple(skips)
    inputs = x
    for i, layer in enumerate(params['layers']):
        x = jax.nn.relu(linear_apply(layer, x))
        if i in skips:
            x = jnp.concatenate([x, inputs], axis=-1)
    heads = params['heads']
    if heads is None:
        return x
    if multi_head:
        return tuple(linear_apply(h, x) for h in heads)
    return linear_apply(heads[0], x)


def mlp_head_reinit_small(params: Dict[str, Any], key, std: float = 1e-5,
                          bias: Optional[Sequence[Optional[jnp.ndarray]]] = None):
    """Re-initialize output heads with tiny-std normal weights and given
    biases (reference skeleton-net init, /root/reference/networks/sk_gs.py:542-545
    and DeformNetwork head init :280-293)."""
    heads = params['heads']
    new_heads = []
    for j, h in enumerate(heads):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, h['w'].shape, h['w'].dtype) * std
        b = jnp.zeros_like(h['b'])
        if bias is not None and bias[j] is not None:
            b = jnp.broadcast_to(jnp.asarray(bias[j], h['b'].dtype), h['b'].shape)
        new_heads.append({'w': w, 'b': b})
    return {**params, 'heads': new_heads}
