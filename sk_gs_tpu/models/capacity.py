"""Capacity bucketing: resize the padded Gaussian buffers to track the
alive population.

The reference resizes its tensors (and Adam state) every densify/prune
(gaussian_splatting.py:515-563) — free under eager torch, hostile to XLA.
Our static capacity padding (SURVEY §7) makes every step pay for the FULL
configured capacity: at the synthetic-fullscale equilibrium (~136 alive of
100 352) the profiled 70 ms device step was dominated by capacity- and
pair-capacity-proportional work (deform MLP on all rows: 20 ms; binning
sort/expansion at K=2^20; Adam on every row). Bucketing recovers the
reference's adaptivity at XLA-friendly granularity: the trainer compacts
alive rows to the front and pads/truncates every [N]-leading array to a
bucket with headroom, re-jitting only on bucket changes (rare, served by
the persistent compile cache).

Row order changes at a resize (alive rows first). Everything row-indexed
is either rebuilt afterwards (gs_knn_index + derived smooth-loss
permutations) or stores superpoint ids, not row ids (p2sp, sp_knn).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

# params leaves / model fields with a leading Gaussian-capacity axis
# (mirrors trainer.PER_POINT_PARAMS/FIELDS; kept here to avoid a cycle)
PER_POINT_PARAMS = ('xyz', 'f_dc', 'f_rest', 'opacity', 'scaling',
                    'rotation', 'hyper', 'sp_W')
PER_POINT_FIELDS = ('alive', 'max_radii2d', 'xyz_grad_accum', 'denom',
                    'sp_weights', 'sp_knn', 'p2sp')


def next_bucket(n_alive: int, *, min_bucket: int = 4096,
                multiple: int = 1024, headroom: float = 1.5,
                max_cap: int) -> int:
    """Smallest bucket >= headroom * n_alive: power-of-two steps above
    min_bucket, clamped to [min_bucket, max_cap], multiple of ``multiple``
    (mesh 'gs' divisibility + DMA-friendly row counts)."""
    want = max(min_bucket, int(n_alive * headroom))
    cap = min_bucket
    while cap < want:
        cap *= 2
    cap = ((cap + multiple - 1) // multiple) * multiple  # round UP
    return min(cap, max_cap)


def pair_bucket(max_pairs: int, *, min_bucket: int = 2 ** 15,
                headroom: float = 4.0, chunk: int, max_cap: int) -> int:
    """Pair-capacity bucket from the measured pair high-water mark.

    Views differ in pair count; ``headroom`` absorbs camera motion and
    densification between checks. An undershoot is self-correcting: the
    step's overflow flag trips at the next check and the bucket doubles
    (overflowing steps drop the excess pairs — the reference's fixed-buffer
    behavior too)."""
    want = max(min_bucket, int(max_pairs * headroom))
    cap = min_bucket
    while cap < want:
        cap *= 2
    cap = min(cap, max_cap)
    return max((cap // chunk) * chunk, chunk)


def _compact_resize(x: jnp.ndarray, order: jnp.ndarray, new_cap: int
                    ) -> jnp.ndarray:
    y = x[order]
    n = x.shape[0]
    if new_cap <= n:
        return y[:new_cap]
    pad = jnp.zeros((new_cap - n,) + x.shape[1:], x.dtype)
    return jnp.concatenate([y, pad], axis=0)


def resize_model(model, opt_state, new_cap: int) -> Tuple[Any, Any]:
    """Compact alive rows to the front, then resize every [N]-leading
    array (params, model fields, optimizer moment pytrees) to ``new_cap``.

    Truncation only drops dead rows: the caller must ensure
    ``new_cap >= n_alive`` (next_bucket's headroom does).
    """
    order = jnp.argsort(~model.alive, stable=True).astype(jnp.int32)

    params: Dict[str, Any] = dict(model.params)
    for k in PER_POINT_PARAMS:
        if k in params:
            params[k] = _compact_resize(params[k], order, new_cap)
    fields = {f: _compact_resize(getattr(model, f), order, new_cap)
              for f in PER_POINT_FIELDS}
    model = model._replace(params=params, **fields)

    repl = {}
    for f in opt_state._fields:
        v = getattr(opt_state, f)
        if isinstance(v, dict):
            d = dict(v)
            for k in PER_POINT_PARAMS:
                if k in d:
                    d[k] = jax.tree.map(
                        lambda x: _compact_resize(x, order, new_cap), d[k])
            repl[f] = d
    opt_state = opt_state._replace(**repl)
    return model, opt_state
