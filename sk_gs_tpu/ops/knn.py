"""KNN / distance / sampling ops, pure JAX, MXU-friendly.

TPU-native replacements for several reference CUDA ops:
- ``simple_knn`` (mean 3-NN distance for scale init,
  /root/reference/my_ext/_C/src/other/knn.cu, used at
  networks/gaussian_splatting.py:211-213) -> ``mean_knn_dist2``.
- ``cdist_top`` (nearest-pair with backward,
  /root/reference/my_ext/_C/src/other/cdist_top.cu) -> ``cdist_argmin``.
- ``FurthestSampling`` (/root/reference/my_ext/_C/src/other/furthest_point_sampling.cu,
  python fallback my_ext/ops/point_sample.py:7-31) -> ``furthest_point_sampling``.
- ``pytorch3d.ops.knn_points`` (LBS weights, networks/sk_gs.py:757) -> ``knn``.

Squared distances are computed via the |x|^2 + |y|^2 - 2 x.y expansion so the
N x M inner product rides the MXU; queries are processed in chunks to bound
memory for large N.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sq_cdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances [N, M] between x [N, D] and y [M, D]."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1)
    xy = x @ y.T
    return jnp.maximum(x2 + y2[None, :] - 2.0 * xy, 0.0)


def knn(queries: jnp.ndarray, points: jnp.ndarray, k: int,
        chunk: int = 4096) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors of each query in ``points``.

    Returns (sq_dists [N, k], indices [N, k]) sorted ascending.
    """
    n = queries.shape[0]
    pad = (-n) % chunk
    q = jnp.pad(queries, ((0, pad), (0, 0)))

    def _one(qc):
        d2 = sq_cdist(qc, points)
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    qs = q.reshape(-1, chunk, queries.shape[-1])
    d2, idx = jax.lax.map(_one, qs)
    d2 = d2.reshape(-1, k)[:n]
    idx = idx.reshape(-1, k)[:n]
    return d2, idx


def cdist_argmin(x: jnp.ndarray, y: jnp.ndarray,
                 chunk: int = 4096) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest neighbor in y for each x: (sq_dist [N], index [N]).

    Differentiable w.r.t. both point sets through the selected pair
    (reference cdist_top autograd wrapper, my_ext/ops/cdist_top.py).
    """
    d2, idx = knn(x, y, 1, chunk)
    return d2[:, 0], idx[:, 0]


def mean_knn_dist2(points: jnp.ndarray, k: int = 3, chunk: int = 2048,
                   mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean squared distance to the k nearest *other* points.

    TPU equivalent of the Inria ``simple_knn`` scale initializer
    (reference: distCUDA2, networks/gaussian_splatting.py:211-213). With a
    capacity ``mask``, dead slots are pushed to +inf distance so they never
    appear among neighbors; their own output is arbitrary (masked upstream).
    """
    n = points.shape[0]
    pad = (-n) % chunk
    q = jnp.pad(points, ((0, pad), (0, 0)))
    base = jnp.arange(q.shape[0]).reshape(-1, chunk)

    if mask is not None:
        big = jnp.where(mask, 0.0, jnp.float32(1e12))
    else:
        big = None

    def _one(args):
        qc, rows = args
        d2 = sq_cdist(qc, points)
        if big is not None:
            d2 = d2 + big[None, :]
        # exclude self-match
        cols = jnp.arange(n)[None, :]
        d2 = jnp.where(cols == rows[:, None], jnp.inf, d2)
        neg, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(-neg, axis=-1)

    out = jax.lax.map(_one, (q.reshape(-1, chunk, points.shape[-1]), base))
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnames=('num_samples',))
def furthest_point_sampling(points: jnp.ndarray, num_samples: int,
                            mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Indices [num_samples] of an FPS subset; starts from point 0 (parity with
    the reference python fallback, my_ext/ops/point_sample.py:7-31).

    Works on any feature dimension (SK-GS runs FPS in hyper-trajectory space,
    networks/sk_gs.py:672-721). Masked (dead) points are never selected.
    """
    n = points.shape[0]
    big = None if mask is None else jnp.where(mask, 0.0, jnp.float32(-1e30))

    def body(i, state):
        dists, selected = state
        last = selected[i - 1]
        d_new = jnp.sum((points - points[last]) ** 2, axis=-1)
        dists = jnp.minimum(dists, d_new)
        score = dists if big is None else dists + big
        selected = selected.at[i].set(jnp.argmax(score))
        return dists, selected

    first = 0 if mask is None else jnp.argmax(mask)
    selected0 = jnp.zeros(num_samples, dtype=jnp.int32).at[0].set(first)
    dists0 = jnp.full((n,), jnp.inf, dtype=jnp.float32)
    _, selected = jax.lax.fori_loop(1, num_samples, body, (dists0, selected0))
    return selected
