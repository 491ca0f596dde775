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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DIST_INITIALIZED = False


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Multi-host wiring: call ``jax.distributed.initialize`` when launched as
    one process per host (SURVEY §7.7; env-var parity with the reference's
    ``env://`` init, /root/reference/my_ext/distributed.py:50-76).

    Env fallbacks, in priority order:
      coordinator:   JAX_COORDINATOR_ADDRESS, else MASTER_ADDR[:MASTER_PORT]
      num_processes: JAX_NUM_PROCESSES, else WORLD_SIZE
      process_id:    JAX_PROCESS_ID, else RANK

    Single-process runs (no env set, no args) skip initialization entirely —
    the common local path stays zero-config. Returns a summary dict with
    ``process_index``/``process_count``/``local_device_count``.
    """
    global _DIST_INITIALIZED

    def _env(*names):
        for n in names:
            v = os.environ.get(n)
            if v is not None:
                return v
        return None

    explicit_coordinator = coordinator is not None
    if coordinator is None:
        coordinator = _env('JAX_COORDINATOR_ADDRESS')
        if coordinator is None and _env('MASTER_ADDR') is not None:
            coordinator = (_env('MASTER_ADDR') + ':'
                           + (_env('MASTER_PORT') or '12321'))
    if num_processes is None:
        v = _env('JAX_NUM_PROCESSES', 'WORLD_SIZE')
        num_processes = int(v) if v is not None else None
    if process_id is None:
        v = _env('JAX_PROCESS_ID', 'RANK')
        process_id = int(v) if v is not None else None

    # Require an explicit process count > 1: a stale MASTER_ADDR with
    # WORLD_SIZE=1 (common under torchrun/SLURM wrappers) must not trigger a
    # coordinator connect that can hang a single-process run.
    multi = (num_processes or 1) > 1
    if explicit_coordinator and not multi:
        # An explicitly passed coordinator with no process count would
        # silently train uncoordinated replicas — fail loudly instead.
        raise ValueError(
            f'coordinator {coordinator!r} was passed explicitly but '
            f'num_processes is {num_processes or 1}; set num_processes>1 '
            f'(or WORLD_SIZE/JAX_NUM_PROCESSES) for a multi-host launch')
    if coordinator is not None and not multi and not explicit_coordinator:
        import warnings
        warnings.warn(
            f'coordinator {coordinator!r} found in env but process count is '
            f'{num_processes or 1}; skipping jax.distributed.initialize — '
            f'set WORLD_SIZE/JAX_NUM_PROCESSES>1 for a multi-host launch')
    if multi and not _DIST_INITIALIZED:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        _DIST_INITIALIZED = True
    return {
        'process_index': jax.process_index(),
        'process_count': jax.process_count(),
        'local_device_count': jax.local_device_count(),
        'device_count': jax.device_count(),
    }


def make_mesh(n_view: Optional[int] = None, n_gs: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the ('view', 'gs') mesh over all (global) devices.

    ``jax.devices()`` orders devices by process, so with ``n_gs`` ≤ the
    per-host device count the reshape keeps every ``gs`` (model-parallel)
    group within one host — its all-to-all splat exchange rides ICI — while
    the ``view`` (data-parallel) axis spans hosts and only carries the
    gradient all-reduce over DCN. This is the layout SURVEY §7.7 calls for.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_view is None:
        n_view = n // n_gs
    assert n_view * n_gs == n, f"{n_view}x{n_gs} != {n} devices"
    if n_gs > jax.local_device_count() and jax.process_count() > 1:
        import warnings
        warnings.warn(
            f"gs axis ({n_gs}) exceeds per-host device count "
            f"({jax.local_device_count()}); the splat all-to-all will "
            f"cross DCN instead of riding ICI")
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
