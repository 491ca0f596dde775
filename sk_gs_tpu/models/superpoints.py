"""Superpoint clustering + LBS warping (SP-GS core), capacity-masked.

Parity targets in /root/reference/networks/sk_gs.py:
- ``calc_LBS_weight`` (:751-774): KNN in xyz(+hyper) space; weight modes
  'W' (learned matrix gathered+softmax), 'dist' (softmax(-d)), 'kernel'
  (RBF radius), 'weighted_kernel' (RBF * sigmoid weight);
- ``warp`` (:776-828): SE3 blend of KNN superpoint transforms (methods
  'LBS', 'LBS_c' rotate-about-superpoint, 'largest' hard assignment);
- ``init_superpoints`` (:672-721): FPS in hyper-trajectory space;
- ``superpoint_prune_split`` (:1593-1681) / ``superpoint_merge``
  (:1719-1784) re-expressed as masked writes on M-capacity buffers.

Dead superpoints (sp_alive False) are pushed to +inf KNN distance so they
are never selected and carry zero LBS weight.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import quaternion as quat
from ..ops import se3
from ..ops.knn import furthest_point_sampling

ROT_BIAS = jnp.asarray([0.0, 0.0, 0.0, 1.0])


def masked_knn(queries: jnp.ndarray, keys: jnp.ndarray, key_mask: jnp.ndarray,
               k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KNN over a masked key set (M is small: one dense [N, M] distance).

    Selection runs as k argmin passes instead of ``jax.lax.top_k``: on TPU
    top_k lowers to a per-row sort of all M columns (O(M log^2 M) comparator
    stages on the VPU), while k reduce+select passes are plain [N, M]
    vector work — ~an order of magnitude cheaper at the production shape
    ([100k, 512], k=5). The result is IDENTICAL to top_k(-d2, k) including
    tie-breaking (both pick the lowest index first) and gradient flow
    (take_along_axis gather of d2, matching top_k's gather VJP).
    """
    d2 = jnp.sum(jnp.square(queries[:, None, :] - keys[None, :, :]), axis=-1)
    d2 = jnp.where(key_mask[None, :], d2, jnp.inf)
    m = d2.shape[1]
    col = jnp.arange(m, dtype=jnp.int32)[None, :]
    # selection key: dead columns get huge FINITE values increasing with
    # index (not inf), so even an all-dead row yields ascending indices —
    # exactly top_k's tie order among equal -inf entries; any real distance
    # is far below the 3e38-scale ramp
    ramp = (col + 1).astype(jnp.float32) * jnp.float32(3.0e38 / m)
    taken = jnp.where(key_mask[None, :], d2, ramp)
    dists, idxs = [], []
    for _ in range(k):
        i = jnp.argmin(taken, axis=1).astype(jnp.int32)         # [N]
        dists.append(jnp.take_along_axis(d2, i[:, None], axis=1)[:, 0])
        idxs.append(i)
        taken = jnp.where(col == i[:, None], jnp.inf, taken)
    return jnp.stack(dists, axis=1), jnp.stack(idxs, axis=1)


def calc_lbs_weight(points: jnp.ndarray, sp_points: jnp.ndarray,
                    sp_alive: jnp.ndarray, k: int, method: str,
                    hyper: Optional[jnp.ndarray] = None,
                    sp_hyper: Optional[jnp.ndarray] = None,
                    sp_W: Optional[jnp.ndarray] = None,
                    sp_radius_raw: Optional[jnp.ndarray] = None,
                    sp_weight_raw: Optional[jnp.ndarray] = None,
                    temperature: float = 1.0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (weights [N, K], indices [N, K]); weights sum to 1 per point.

    KNN feature space = concat(stop_grad(xyz), hyper) when hyper features
    are provided (sk_gs.py:753-755 detaches positions but not features).
    """
    q = jax.lax.stop_gradient(points)
    kp = jax.lax.stop_gradient(sp_points)
    if hyper is not None and sp_hyper is not None:
        q = jnp.concatenate([q, hyper], axis=-1)
        kp = jnp.concatenate([kp, sp_hyper], axis=-1)
    nn_dist, indices = masked_knn(q, kp, sp_alive, k)

    if method in ('kernel', 'weighted_kernel'):
        radius = jnp.exp(sp_radius_raw)[indices]
        w = jnp.exp(-nn_dist / (2.0 * radius * radius))
        if method == 'weighted_kernel':
            w = w * jax.nn.sigmoid(sp_weight_raw)[indices]
        w = w + 1e-7
        w = w / jnp.sum(w, axis=-1, keepdims=True)
    elif method == 'W':
        w = select_rows(sp_W, indices)   # gather/scatter-free take_along
        w = jax.nn.softmax(w, axis=-1)
    else:  # 'dist'
        w = jax.nn.softmax(-nn_dist / temperature, axis=-1)
    return w, indices


def sp_transforms(d_xyz: jnp.ndarray, d_rot: jnp.ndarray,
                  sp_points: jnp.ndarray, warp_method: str) -> jnp.ndarray:
    """Per-superpoint SE3 [M, 7] from deform-net outputs.

    LBS_c re-centers the rotation about the superpoint
    (t = d_xyz + p + R(-p), sk_gs.py:803-805)."""
    if warp_method == 'LBS_c':
        t = d_xyz + sp_points + quat.apply(d_rot, -sp_points)
    else:
        t = d_xyz
    return jnp.concatenate([t, d_rot], axis=-1)


def warp_points(points: jnp.ndarray, spT: jnp.ndarray, weights: jnp.ndarray,
                indices: jnp.ndarray, warp_method: str,
                p2sp: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Blend SE3-transformed points: d_xyz [N, 3] (sk_gs.py:807-816)."""
    if warp_method == 'largest':
        return se3.se3_act(spT[p2sp], points) - points
    pk = se3.se3_act(spT[indices], points[:, None, :])  # [N, K, 3]
    return jnp.sum(pk * weights[..., None], axis=1) - points


def blend_attr(attr: jnp.ndarray, weights: jnp.ndarray,
               indices: jnp.ndarray) -> jnp.ndarray:
    """Weighted blend of per-superpoint attributes (rot/scale deltas)."""
    return jnp.sum(attr[indices] * weights[..., None], axis=1)


# --------------------------------------------------------------- dense LBS
# TPU-native formulation of the K-sparse LBS blend. Row-aligned gathers
# (attr[indices], take_along_axis) and their scatter-add transposes run at
# ~1.5 ns/element on the VPU's scalar path — ~40 ms/step at the production
# shape ([100k, 5] against M=512). Expanding the K-sparse weights to a
# dense [N, M] row-stochastic matrix turns every blend (and every blend
# BACKWARD) into one MXU matmul against an [M, c] table: the per-step cost
# collapses to ~2 GFLOP of systolic work + a few [N, M] vector passes.
# Mathematically identical to the sparse path (the dense rows are exact:
# K distinct one-hot columns per row); floating-point sums differ only in
# association order.

def dense_lbs_rows(weights: jnp.ndarray, indices: jnp.ndarray,
                   m: int) -> jnp.ndarray:
    """Expand K-sparse LBS weights to dense rows [N, M] (no scatter:
    K compare-select passes, whose autodiff transpose is a row-aligned
    masked reduce — also scatter-free)."""
    col = jnp.arange(m, dtype=indices.dtype)[None, :]
    dense = jnp.zeros((weights.shape[0], m), weights.dtype)
    for k in range(weights.shape[1]):
        dense = dense + jnp.where(col == indices[:, k:k + 1],
                                  weights[:, k:k + 1], 0.0)
    return dense


def warp_blend_dense(points: jnp.ndarray, spT: jnp.ndarray,
                     dense_w: jnp.ndarray, rot_attr: jnp.ndarray,
                     scale_attr: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(d_xyz, d_rotation, d_scaling) for the LBS warp + attribute blends,
    all through ONE [N, M] @ [M, 12+4+3] matmul.

    Blended SE3 action is linear in the matrix form:
    sum_k w_k (R_k p + t_k) = (sum_k w_k R_k) p + sum_k w_k t_k,
    so rotations ride as flattened 3x3 rows next to translations and the
    rot/scale attribute tables.

    pre_normalize=False: the raw matrix formula I + 2w[u]x + 2[u]x^2 equals
    quat.apply's linear map for ARBITRARY (even off-unit) quaternions —
    exact value and Jacobian parity with the sparse path (global_tr is a
    raw trained param whose quat can drift off-unit)."""
    R = quat.to_matrix(spT[..., 3:7], pre_normalize=False)    # [M, 3, 3]
    table = jnp.concatenate([
        R.reshape(R.shape[0], 9), spT[..., :3], rot_attr, scale_attr,
    ], axis=-1)                                               # [M, 12+4+3]
    b = jnp.matmul(dense_w, table,
                   precision=jax.lax.Precision.HIGHEST)       # [N, 19]
    Rb = b[:, :9].reshape(-1, 3, 3)
    d_xyz = jnp.einsum('nij,nj->ni', Rb, points,
                       precision=jax.lax.Precision.HIGHEST) + b[:, 9:12] \
        - points
    d_rotation = b[:, 12:12 + rot_attr.shape[-1]]
    d_scaling = b[:, 12 + rot_attr.shape[-1]:]
    return d_xyz, d_rotation, d_scaling


def select_rows(table: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis(table, indices, axis=1) without the row-aligned
    gather (and without its scatter-add transpose): K compare-select
    reduces over the M axis. Exact — each output picks one element."""
    col = jnp.arange(table.shape[1], dtype=indices.dtype)[None, :]
    outs = [jnp.sum(jnp.where(col == indices[:, k:k + 1], table, 0.0),
                    axis=1)
            for k in range(indices.shape[1])]
    return jnp.stack(outs, axis=1)


def get_superpoint_features(value: jnp.ndarray, neighbor: jnp.ndarray,
                            g: jnp.ndarray, num_sp: int) -> jnp.ndarray:
    """Weighted scatter-mean of per-point values onto superpoints
    (sk_gs.py:24-47)."""
    c = value.shape[-1]
    src = (value[:, None, :] * g[:, :, None]).reshape(-1, c)
    idx = neighbor.reshape(-1)
    vsum = jax.ops.segment_sum(src, idx, num_segments=num_sp)
    wsum = jax.ops.segment_sum(g.reshape(-1), idx, num_segments=num_sp)
    return vsum / jnp.maximum(wsum[:, None], 1e-5)


def init_superpoints_fps(points: jnp.ndarray, alive: jnp.ndarray,
                         trajectories: Optional[jnp.ndarray],
                         num_superpoints: int) -> jnp.ndarray:
    """FPS selection of superpoint seeds in hyper-trajectory space
    (init_superpoints, sk_gs.py:672-721). Returns indices [M]."""
    feats = points if trajectories is None else trajectories
    return furthest_point_sampling(feats, num_superpoints, alive)


# ---------------------------------------------------------------- adaptive

class SpAdjustResult(NamedTuple):
    sp_alive: jnp.ndarray
    moved: jnp.ndarray       # [Mcap] bool rows whose params were rewritten
    n_pruned: jnp.ndarray
    n_split: jnp.ndarray


def superpoint_prune_split_masks(
        weights: jnp.ndarray, indices: jnp.ndarray, sp_alive: jnp.ndarray,
        xyz_grad_accum: jnp.ndarray, denom: jnp.ndarray, points: jnp.ndarray,
        prune_threshold: float, split_threshold: float, m_cap: int):
    """Compute the prune mask, split mask and split target positions.

    Follows sk_gs.py:1593-1648: prune superpoints whose accumulated LBS
    weight mass W < threshold; split those with high weighted mean xyz-grad
    or weight mass >= 2 * 90th percentile; split position = weighted mean of
    assigned Gaussian positions.
    """
    flat_idx = indices.reshape(-1)
    flat_w = weights.reshape(-1)
    W = jax.ops.segment_sum(flat_w, flat_idx, num_segments=m_cap)
    prune = sp_alive & (W < prune_threshold)
    keep = sp_alive & ~prune

    p_grad = jnp.where(denom > 0, xyz_grad_accum / jnp.maximum(denom, 1.0), 0.0)
    sp_grad = jax.ops.segment_sum((p_grad[:, None] * weights).reshape(-1),
                                  flat_idx, num_segments=m_cap)
    split = keep & (sp_grad / jnp.maximum(W, 1e-6) >= split_threshold)

    # weight-mass outlier splits: W >= 2 * (90th percentile of kept W)
    w_sorted = jnp.sort(jnp.where(keep, W, jnp.inf))
    n_keep = jnp.sum(keep)
    k90 = jnp.clip((0.9 * n_keep).astype(jnp.int32), 0, m_cap - 1)
    w90 = w_sorted[k90]
    split = split | (keep & (W >= 2.0 * w90) & jnp.isfinite(w90))

    # split target: weight-normalized mean position of assigned gaussians
    wsum = jnp.maximum(W, 1e-6)
    wnorm = weights / wsum[indices]
    new_pos = jax.ops.segment_sum(
        (points[:, None, :] * wnorm[..., None]).reshape(-1, 3),
        flat_idx, num_segments=m_cap)
    return prune, split, new_pos


def superpoint_merge_masks(sp_points: jnp.ndarray, sp_alive: jnp.ndarray,
                           sp_cache: jnp.ndarray, num_knn: int,
                           merge_threshold: float):
    """Merge pairs whose cached per-frame transforms differ < threshold
    across all frames (superpoint_merge, sk_gs.py:1740-1752).

    Returns (merge_to [M] index of target, merged_away [M] bool). The greedy
    non-overlapping pairing runs on host via pure_callback-style numpy in the
    caller; here we compute the candidate (min_diff, min_index).
    """
    m = sp_points.shape[0]
    d = jnp.linalg.norm(sp_points[:, None] - sp_points[None, :], axis=-1)
    d = jnp.where(sp_alive[None, :] & sp_alive[:, None], d, jnp.inf)
    d = jnp.where(jnp.eye(m, dtype=bool), jnp.inf, d)
    k = min(m, num_knn)
    _, knn = jax.lax.top_k(-d, k)
    tr_diff = jnp.linalg.norm(
        sp_cache[:, :, None, :] - sp_cache[:, knn, :], axis=-1)  # [T, M, K]
    tr_diff = jnp.mean(tr_diff, axis=0)                          # [M, K]
    tr_diff = jnp.where(sp_alive[:, None], tr_diff, jnp.inf)
    min_diff = jnp.min(tr_diff, axis=1)
    min_k = jnp.argmin(tr_diff, axis=1)
    min_index = knn[jnp.arange(m), min_k]
    return min_diff, min_index
