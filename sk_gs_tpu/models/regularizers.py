"""Motion regularizers: SC-GS ARAP, elastic, acceleration, point-ARAP.

Parity targets:
- ``cal_connectivity_from_points`` / ``cal_arap_error``
  (/root/reference/networks/losses/SC_GS_arap_loss.py:35-201): KNN graph
  with adaptive weights, per-node best-fit rotation (SVD Procrustes,
  gradient-stopped) and stretch energy over a trajectory;
- ``loss_elastic`` (sk_gs.py:1399-1421): edge-length variance over time
  samples, self-normalized, weighted by LBS kernel weights;
- ``loss_acc`` (sk_gs.py:1423-1436): finite-difference acceleration norm;
- ``loss_points_arap`` (sk_gs.py:1361-1369) / ``loss_sp_arap`` (:1371-1383).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .skeleton import _safe_norm


def arap_connectivity(points: jnp.ndarray, mask: jnp.ndarray, k: int = 10,
                      radius: float = 0.1, least_edge_num: int = 3
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """KNN graph with adaptive weights.

    Returns (nn_idx [M, K], weight [M, K], edge_mask [M, K]); edges beyond
    ``radius`` are dropped except the first ``least_edge_num``.
    """
    k = min(k, points.shape[0] - 1)  # tiny-M clamp (SC_GS_arap_loss.py:25)
    d2 = jnp.sum(jnp.square(points[:, None] - points[None]), axis=-1)
    d2 = jnp.where(mask[None, :], d2, jnp.inf)
    d2 = jnp.where(jnp.eye(points.shape[0], dtype=bool), jnp.inf, d2)
    neg, nn_idx = jax.lax.top_k(-d2, k)
    nn_dist = -neg
    col = jnp.arange(k)[None, :]
    keep = (col < least_edge_num) | (nn_dist < radius * radius)
    keep = keep & mask[:, None] & jnp.isfinite(nn_dist)
    # zero (not inf) the dropped entries before exp: exp(-inf/c) is 0 in
    # the forward but its gradient w.r.t. c is inf*0 = NaN
    nd = jnp.where(keep, nn_dist, 0.0)
    mean_d = jnp.sum(nd) / jnp.maximum(jnp.sum(keep), 1.0)
    w = jnp.exp(-nd / jnp.maximum(mean_d, 1e-8))
    w = jnp.where(keep, w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)
    return nn_idx, w, keep


@jax.custom_jvp
def _procrustes_rotations(S: jnp.ndarray) -> jnp.ndarray:
    u, _, vt = jnp.linalg.svd(S)
    det = jnp.linalg.det(jnp.einsum('mij,mjk->mik',
                                    jnp.swapaxes(vt, 1, 2),
                                    jnp.swapaxes(u, 1, 2)))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return jnp.einsum('mji,mj,mkj->mik', vt, d, u)  # V diag(d) U^T


@_procrustes_rotations.defjvp
def _procrustes_rotations_jvp(primals, tangents):
    # zero tangent: severs autodiff entirely. stop_gradient alone is NOT
    # enough — the SVD vjp still evaluates 1/(sigma_i^2 - sigma_j^2) terms
    # that go inf*0=NaN for repeated singular values, which always happens
    # at init when trajectories are near-rigid.
    R = _procrustes_rotations(primals[0])
    return R, jnp.zeros_like(R)


def _best_fit_rotations(e0: jnp.ndarray, et: jnp.ndarray, w: jnp.ndarray
                        ) -> jnp.ndarray:
    """Per-node Procrustes rotation R minimizing sum_k w_k |e_t - R e_0|^2
    (estimate_rotation; gradient-stopped as in the reference)."""
    S = jnp.einsum('mk,mki,mkj->mij', w, e0, et)  # [M, 3, 3]
    return _procrustes_rotations(jax.lax.stop_gradient(S))


def arap_error(nodes_seq: jnp.ndarray, nn_idx: jnp.ndarray, w: jnp.ndarray
               ) -> jnp.ndarray:
    """ARAP stretch energy over a node trajectory [T, M, 3]."""
    e0 = nodes_seq[0][:, None, :] - nodes_seq[0][nn_idx]     # [M, K, 3]

    def one(nodes_t):
        et = nodes_t[:, None, :] - nodes_t[nn_idx]
        R = _best_fit_rotations(e0, et, w)
        rigid = jnp.einsum('mij,mkj->mki', R, e0)
        stretch = jnp.sum(jnp.square(et - rigid), axis=-1)   # [M, K]
        return jnp.sum(w * stretch)

    errs = jax.vmap(one)(nodes_seq[1:])
    return jnp.sum(errs)


def elastic_loss(nodes_t: jnp.ndarray, nn_idx: jnp.ndarray, nn_w: jnp.ndarray
                 ) -> jnp.ndarray:
    """Edge-length variance over time samples (loss_elastic).

    nodes_t: [M, T, 3] trajectory samples; nn_idx/nn_w: [M, Kc] neighbors.
    """
    edge_t = _safe_norm(nodes_t[nn_idx] - nodes_t[:, None])  # [M, Kc, T]
    var = jnp.var(edge_t, axis=2)
    var = var / (jax.lax.stop_gradient(var) + 1e-5)
    return jnp.mean(jnp.sum(var * nn_w, axis=1))


def acc_loss(nodes_3t: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Finite-difference acceleration (loss_acc): nodes_3t [M, 3, 3] holds
    positions at (t-dt, t, t+dt)."""
    acc = _safe_norm(nodes_3t[:, 0] + nodes_3t[:, 2] - 2.0 * nodes_3t[:, 1])
    acc = acc / (jax.lax.stop_gradient(acc) + 1e-5)
    return jnp.sum(acc * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def points_arap_loss(points_c: jnp.ndarray, points_t: jnp.ndarray,
                     nn_idx: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """|d_c - d_t| preservation of squared KNN distances (loss_points_arap)."""
    dc = jnp.sum(jnp.square(points_c[:, None] - points_c[nn_idx]), axis=-1)
    dt = jnp.sum(jnp.square(points_t[:, None] - points_t[nn_idx]), axis=-1)
    diff = jnp.abs(dc - dt) * mask[:, None]
    return jnp.sum(diff) / jnp.maximum(jnp.sum(mask) * nn_idx.shape[1], 1.0)
