"""Skeleton: joint discovery (MST), forward kinematics, kinematic model.

Parity targets in /root/reference/networks/sk_gs.py:
- ``skeleton_warp_SE3`` (:193-206): log-depth FK composition via a
  binary-lifting parents table — already vectorized, maps 1:1 to JAX;
- ``joint_discovery`` + ``find_root`` (:50-131, CUDA twin
  my_ext/_C/src/nerf/sp_gs_joint.cu): MST over the joint-cost matrix with
  leaf-peeling root selection — host-side numpy here (M~512, O(M^2 log M),
  runs every joint_update_interval steps, exactly like the reference's
  CPU-fed CUDA helper);
- ``kinematic`` (:1069-1107): skeleton net -> per-joint rotation about the
  joint position, FK compose, optional repose deltas;
- ``loss_joint_discovery`` (:1309-1336) cost-matrix terms;
- ``update_joint`` (:1244-1265) sk-knn cost restriction.

Capacity masking: dead joints get parent=root, identity local transform.
The parents table has a static level count (MAX_LEVELS) so recompiles never
depend on tree depth.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import quaternion as quat
from ..ops import se3

MAX_LEVELS = 10  # supports chains up to 2^10 deep (M <= 1024)


# ---------------------------------------------------------------- FK

def skeleton_fk(local_T: jnp.ndarray, global_T: Optional[jnp.ndarray],
                parents: jnp.ndarray, root: jnp.ndarray) -> jnp.ndarray:
    """Compose local SE3s [M, 7] along the parent chains.

    parents: [M, L] binary-lifting table (parents[:, l] = 2^l-ancestor,
    clamped at root). The root's local transform is replaced by identity;
    global_T (if given, [7]) is applied at the root afterwards.
    """
    m = local_T.shape[0]
    out = jnp.where((jnp.arange(m) == root)[:, None],
                    se3.se3_identity((m,), local_T.dtype), local_T)
    L = parents.shape[1]
    for level in range(L):
        out = se3.se3_mul(out[parents[:, level]], out)
    if global_T is not None:
        out = se3.se3_mul(global_T[None, :], out)
    return out


# ---------------------------------------------------------------- MST (host)

def joint_discovery_host(cost: np.ndarray, alive: np.ndarray,
                         max_levels: int = MAX_LEVELS,
                         use_native: bool = True
                         ) -> Tuple[np.ndarray, np.ndarray, int]:
    """MST over the alive sub-block of the cost matrix; returns
    (parents [M, max_levels], depth [M], root).

    Mirrors the reference algorithm: greedily connect the cheapest edge
    between distinct components (joint_discovery, sk_gs.py:106-131), then
    re-root at the node that minimizes depth via leaf peeling (find_root,
    :50-103). Dead joints get parent=root, depth 0.

    Prefers the native C++ implementation (sk_gs_tpu/native) and falls back
    to this numpy version — the same dual-path pattern as the reference's
    try_use_C_extension.
    """
    if use_native:
        from ..native import joint_discovery_native
        out = joint_discovery_native(np.asarray(cost), np.asarray(alive),
                                     max_levels)
        if out is not None:
            return out
    m = cost.shape[0]
    alive_idx = np.flatnonzero(alive)
    parents = np.full((m, max_levels), 0, dtype=np.int32)
    depth = np.zeros(m, dtype=np.int32)
    if len(alive_idx) == 0:
        return parents, depth, 0
    if len(alive_idx) == 1:
        r = int(alive_idx[0])
        parents[:] = r
        return parents, depth, r

    sub = cost[np.ix_(alive_idx, alive_idx)].astype(np.float64)
    k = len(alive_idx)
    np.fill_diagonal(sub, np.inf)
    comp = np.arange(k)
    edges = []
    order = np.argsort(sub, axis=None)
    ei = 0
    # Kruskal over sorted edges with union-find
    def find(x):
        while comp[x] != x:
            comp[x] = comp[comp[x]]
            x = comp[x]
        return x

    for flat in order:
        if len(edges) == k - 1:
            break
        a, b = divmod(int(flat), k)
        if not np.isfinite(sub[a, b]):
            continue
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        comp[ra] = rb
        edges.append((a, b))

    # build adjacency, leaf-peel to find a center root
    adj = [[] for _ in range(k)]
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    deg = np.array([len(a) for a in adj])
    visited = np.zeros(k, dtype=np.int64)
    que = [i for i in range(k) if deg[i] <= 1]
    for n0 in que:
        visited[n0] = 1
    i = 0
    while i < len(que):
        now = que[i]
        i += 1
        for nxt in adj[now]:
            if deg[nxt] > 1:
                deg[nxt] -= 1
                visited[nxt] = max(visited[nxt], visited[now] + 1)
                if deg[nxt] == 1:
                    que.append(nxt)
    root_local = que[-1] if que else 0

    # BFS from root to assign parents/depth
    par = np.full(k, root_local, dtype=np.int32)
    dep = np.zeros(k, dtype=np.int32)
    seen = np.zeros(k, dtype=bool)
    seen[root_local] = True
    que = [root_local]
    i = 0
    while i < len(que):
        now = que[i]
        i += 1
        for nxt in adj[now]:
            if not seen[nxt]:
                par[nxt] = now
                dep[nxt] = dep[now] + 1
                seen[nxt] = True
                que.append(nxt)

    root = int(alive_idx[root_local])
    parents[:] = root
    parents[alive_idx, 0] = alive_idx[par]
    depth[alive_idx] = dep
    for lv in range(1, max_levels):
        parents[:, lv] = parents[parents[:, lv - 1], lv - 1]
    return parents, depth, root


def update_joint(cost: jnp.ndarray, sp_points: jnp.ndarray,
                 sp_alive: jnp.ndarray, sk_knn_num: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Restrict cost to sk-knn nearest neighbors (update_joint,
    sk_gs.py:1246-1253) then run the host MST.

    Host-eager by design: every call site sits between jitted steps (the
    reference also runs its MST on the CPU between steps), and the axon
    PJRT backend does not support pure_callback.

    Returns (parents [M, L] int32, depth [M] int32, root [] int32).
    """
    m = cost.shape[0]
    if sk_knn_num > 0:
        d = jnp.linalg.norm(sp_points[:, None] - sp_points[None, :], axis=-1)
        d = jnp.where(sp_alive[None, :], d, jnp.inf)
        kth = jnp.sort(d, axis=-1)[:, jnp.minimum(sk_knn_num, jnp.sum(sp_alive) - 1)]
        big = jnp.abs(jnp.max(jnp.where(jnp.isfinite(cost), cost, 0.0))) + 1.0
        cost = jnp.where(d > kth[:, None], cost + big, cost)

    parents, depth, root = joint_discovery_host(
        np.asarray(cost), np.asarray(sp_alive))
    return (jnp.asarray(parents, jnp.int32), jnp.asarray(depth, jnp.int32),
            jnp.asarray(root, jnp.int32))


# ---------------------------------------------------------------- joint cost

def _safe_norm(x, axis=-1, eps=1e-12):
    """norm with a finite gradient at 0 (plain norm NaNs there — identical
    early-training transforms would poison joint_pos gradients)."""
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axis) + eps)


def joint_cost_matrix(joint_pos: jnp.ndarray, spT: jnp.ndarray,
                      sp_alive: jnp.ndarray) -> jnp.ndarray:
    """Cost[a, b] = ||T_b(j_ab) - T_a(j_ab)|| + ||T_a(j_ab) - T_b(j_ba)||
    (loss_joint_discovery canonical branch, sk_gs.py:1320-1327).

    joint_pos [M, M, 3]: candidate pivot for the (a, b) pair. spT [M, 7].
    Dead rows/cols get +inf.
    """
    ja_by_b = se3.se3_act(spT[None, :, :], joint_pos)   # T_b applied to j[a,b]
    ja_by_a = se3.se3_act(spT[:, None, :], joint_pos)   # T_a applied to j[a,b]
    c1 = _safe_norm(ja_by_b - ja_by_a)
    c2 = _safe_norm(ja_by_a - jnp.swapaxes(ja_by_a, 0, 1))
    cost = c1 + c2
    valid = sp_alive[:, None] & sp_alive[None, :]
    return jnp.where(valid, cost, jnp.inf)


# ---------------------------------------------------------------- kinematic

def kinematic_transforms(joints: jnp.ndarray, sk_r: jnp.ndarray,
                         g_tr: Optional[jnp.ndarray], parents: jnp.ndarray,
                         root: jnp.ndarray,
                         sk_r_delta: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """Per-joint local rotation -> global SE3s via FK (kinematic,
    sk_gs.py:1086-1106). sk_r: [M, 4] normalized quats. sk_r_delta: repose
    deltas, [M, 3] (so3 log) or [M, 4] (quats)."""
    if sk_r_delta is not None:
        if sk_r_delta.shape[-1] == 3:
            dq = se3.so3_exp(sk_r_delta)
        else:
            dq = sk_r_delta
        sk_r = quat.multiply(dq, sk_r)
    sk_t = joints + quat.apply(sk_r, -joints)
    local = jnp.concatenate([sk_t, sk_r], axis=-1)
    return skeleton_fk(local, g_tr, parents, root)
