"""Device mesh + sharding helpers.

TPU-native replacement for the reference's torch.distributed wrapper
(/root/reference/my_ext/distributed.py): instead of explicit NCCL
collectives, one ``jax.sharding.Mesh`` + NamedShardings; XLA inserts the
all-reduces (riding ICI within a slice). The reference is data-parallel only
(SURVEY §2.2); here the mesh exposes two axes:

- ``view``: data parallelism over camera views (the reference's DP analogue);
- ``gs``:   model parallelism over the Gaussian capacity axis (the scale
            axis the reference never had — SURVEY §5 'long-context' note).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_view: Optional[int] = None, n_gs: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_view is None:
        n_view = n // n_gs
    assert n_view * n_gs == n, f"{n_view}x{n_gs} != {n} devices"
    arr = np.asarray(devices).reshape(n_view, n_gs)
    return Mesh(arr, ('view', 'gs'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def view_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P('view', *([None] * (ndim - 1))))


def gs_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P('gs', *([None] * (ndim - 1))))


def shard_map_compat(f, mesh, in_specs, out_specs):
    """shard_map across jax versions: `jax.shard_map` (check_vma) with
    fallback to the experimental API (check_rep)."""
    try:
        from jax import shard_map as _sm
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm
    try:
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except TypeError:
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)
