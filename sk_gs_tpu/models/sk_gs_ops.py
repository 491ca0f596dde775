"""SK-GS stage transitions and adaptive control (host-orchestrated).

These run once (or every K steps) at stage boundaries, mutating the
capacity-padded state via jitted helpers:

- ``init_superpoints``: FPS in hyper-trajectory space; Gaussian set replaced
  by the sampled superpoints (sk_gs.py:672-721);
- ``reinit_gaussians_at_sp_fix``: re-create the Gaussian cloud from the
  input point cloud and one-hot-init sp_W at stage sp_fix start
  (hook_after_train_step, sk_gs.py:1878-1906);
- ``cache_all_sp_transforms``: fill sp_cache for every frame (init_skeleton
  prologue, sk_gs.py:1016-1034);
- ``init_skeleton``: joint_pos optimization + MST + sk-deform distillation
  (sk_gs.py:892-1067);
- ``superpoint_prune_split`` / ``superpoint_merge``: masked M-capacity
  versions of sk_gs.py:1593-1784;
- ``adaptive_control``: stage-aware densify/prune dispatch (sk_gs.py:1940-2036).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quaternion as quat
from ..ops import se3
from ..ops.knn import furthest_point_sampling
from . import optim, skeleton, superpoints
from .deform import deform_net_apply
from .sk_gs import (ROT_BIAS, SKGSConfig, SKGSModel, sp_cache_row,
                    sp_net_outputs, split_sp_cache, sk_stage)

log = logging.getLogger(__name__)

GAUSS_LEAVES = ('xyz', 'f_dc', 'f_rest', 'scaling', 'rotation', 'opacity',
                'hyper')


# ---------------------------------------------------------------- helpers

def _gather_rows(params: Dict[str, Any], names, idx: jnp.ndarray,
                 valid: jnp.ndarray) -> Dict[str, Any]:
    """params[name][i] <- params[name][idx[i]] where valid else zeros."""
    out = dict(params)
    for name in names:
        if name not in params:
            continue
        x = params[name]
        g = x[idx]
        m = valid.reshape(valid.shape[0], *([1] * (x.ndim - 1)))
        if name == 'rotation':
            # dead rows keep identity quaternions (zero quats would make the
            # covariance math degenerate even though they are masked)
            fill = jnp.broadcast_to(ROT_BIAS, g.shape)
        else:
            fill = jnp.zeros_like(g)
        out[name] = jnp.where(m, g, fill)
    return out


import functools


@functools.partial(jax.jit, static_argnums=(1,))
def _sample_trajectories(net_params, net_cfg_static, points, times):
    """[N, T*3] concat of warped positions for FPS feature space."""
    def one(t):
        return deform_net_apply(net_params, net_cfg_static, points, t)['d_xyz'] + points
    outs = jax.vmap(one)(times)  # [T, N, 3]
    return jnp.transpose(outs, (1, 0, 2)).reshape(points.shape[0], -1)


def sample_trajectories(cfg: SKGSConfig, model: SKGSModel) -> jnp.ndarray:
    times = jnp.linspace(0.0, 1.0, cfg.init_num_times)
    return _sample_trajectories(model.params['sp_deform'], cfg.net,
                                model.params['xyz'], times)


# ---------------------------------------------------------------- transitions

def init_superpoints(cfg: SKGSConfig, model: SKGSModel,
                     opt_state: optim.AdamState, key
                     ) -> Tuple[SKGSModel, optim.AdamState]:
    """At init_sampling_step: choose M superpoints by FPS in hyper-trajectory
    space; REPLACE the Gaussian set by those M points (sk_gs.py:672-721)."""
    m = cfg.num_superpoints
    traj = sample_trajectories(cfg, model)
    idx = furthest_point_sampling(traj, m, model.alive)

    params = dict(model.params)
    n_cap = model.capacity
    valid = jnp.arange(n_cap) < m
    gather_idx = idx[jnp.clip(jnp.arange(n_cap), 0, m - 1)]
    params = _gather_rows(params, GAUSS_LEAVES, gather_idx, valid)
    params['hyper'] = jnp.where(valid[:, None],
                                jnp.full((n_cap, cfg.hyper_dim), 1e-2), 0.0)
    # superpoint positions = the selected gaussian positions
    sp_pts = model.params['xyz'][idx]
    params['sp_points'] = sp_pts
    params['sp_hyper'] = jnp.full((m, cfg.hyper_dim), 1e-2)
    scene_range = jnp.max(model.params['xyz'][idx]) - jnp.min(model.params['xyz'][idx])
    if 'sp_radius' in params:
        params['sp_radius'] = jnp.log(0.1 * scene_range + 1e-7) * jnp.ones((m,))
    if 'sp_weight' in params:
        params['sp_weight'] = jnp.zeros((m,))

    new_opt = opt_state
    for name in list(GAUSS_LEAVES) + ['sp_points', 'sp_hyper', 'sp_radius',
                                      'sp_weight']:
        if name in params:
            new_opt = optim.reset_leaf(new_opt, name)

    new_model = model._replace(
        params=params,
        alive=valid,
        sp_alive=jnp.ones((m,), bool),
        active_sh_degree=jnp.zeros((), jnp.int32),
        max_radii2d=jnp.zeros_like(model.max_radii2d),
        xyz_grad_accum=jnp.zeros_like(model.xyz_grad_accum),
        denom=jnp.zeros_like(model.denom),
    )
    return new_model, new_opt


def reinit_gaussians_at_sp_fix(cfg: SKGSConfig, model: SKGSModel,
                               opt_state: optim.AdamState,
                               pcd_points: np.ndarray, pcd_colors: np.ndarray
                               ) -> Tuple[SKGSModel, optim.AdamState]:
    """Stage sp_fix start: sp_points <- current Gaussian positions; rebuild
    the Gaussian cloud from the input point cloud; sp_W one-hot towards the
    nearest superpoint (hook_after_train_step, sk_gs.py:1878-1906)."""
    from .gaussian_splatting import GaussianConfig, init_from_pcd

    m = cfg.num_superpoints
    n_cap = model.capacity
    params = dict(model.params)
    # superpoints = the M surviving gaussians (init_superpoints made N == M)
    sp_pts = jnp.where(model.sp_alive[:, None],
                       params['xyz'][:m], params['sp_points'][..., :3])
    params['sp_points'] = sp_pts

    base = init_from_pcd(pcd_points, pcd_colors,
                         GaussianConfig(capacity=n_cap, sh_degree=cfg.gauss.sh_degree))
    for name in ('xyz', 'f_dc', 'f_rest', 'scaling', 'rotation', 'opacity'):
        params[name] = base.params[name]
    params['hyper'] = jnp.full((n_cap, cfg.hyper_dim), -1e-2)

    if 'sp_W' in params:
        d2 = jnp.sum((params['xyz'][:, None, :] - sp_pts[None]) ** 2, axis=-1)
        d2 = jnp.where(model.sp_alive[None, :], d2, jnp.inf)
        p2sp = jnp.argmin(d2, axis=-1)
        scale = float(np.log(9.0 * max(cfg.num_knn - 1, 1)))
        params['sp_W'] = jax.nn.one_hot(p2sp, m) * scale

    new_opt = opt_state
    for name in list(GAUSS_LEAVES) + ['sp_W', 'sp_points']:
        if name in params:
            new_opt = optim.reset_leaf(new_opt, name)

    new_model = model._replace(
        params=params,
        alive=base.alive,
        active_sh_degree=jnp.zeros((), jnp.int32),
        max_radii2d=jnp.zeros_like(model.max_radii2d),
        xyz_grad_accum=jnp.zeros_like(model.xyz_grad_accum),
        denom=jnp.zeros_like(model.denom),
    )
    return new_model, new_opt


# ---------------------------------------------------------------- skeleton init

def compute_sp_transforms_all_frames(cfg: SKGSConfig, params,
                                     times: jnp.ndarray) -> jnp.ndarray:
    """sp_cache rows [T, M, 14|10] for every training frame
    (init_skeleton prologue, sk_gs.py:1016-1032)."""
    sp_pts = params['sp_points'][..., :3]

    def one(t):
        d_xyz, d_rot, g_rot, d_scale = sp_net_outputs(cfg, params['sp_deform'],
                                                      sp_pts, t)
        spT = superpoints.sp_transforms(d_xyz, d_rot, sp_pts, cfg.warp_method)
        return sp_cache_row(cfg, spT, g_rot, d_scale)

    return jax.vmap(one)(times)


def joint_pos_init_midpoint(params: Dict[str, Any]) -> jnp.ndarray:
    """joint_pos[a, b] = midpoint of superpoints a, b (init_joint_pos,
    sk_gs.py:858-865)."""
    sp = params['sp_points'][..., :3]
    return 0.5 * (sp[:, None] + sp[None, :])


def optimize_joint_pos(cfg: SKGSConfig, model: SKGSModel, key,
                       steps: Optional[int] = None, lr: float = 1e-3
                       ) -> SKGSModel:
    """Adam on joint_pos minimizing find_joint_loss over random frames
    (init_joint, sk_gs.py:892-924). Runs as one jitted lax.scan."""
    steps = cfg.joint_init_steps if steps is None else steps
    sp_cache = model.sp_cache
    sp_alive = model.sp_alive
    T = sp_cache.shape[0]
    momentum = cfg.sk_momentum

    sp_q = sp_cache[..., 3:7]                                  # [T, M, 4]
    # joint_rot[t, a, b] = R_b^-1 R_a  (sk_gs.py:901)
    joint_rot = quat.multiply(quat.conjugate(sp_q[:, None, :, :]),
                              sp_q[:, :, None, :])             # [T, M(a), M(b)]? see note

    def loss_fn(joint_pos, tid, joint_cost):
        spT = sp_cache[tid, :, :7]
        # local joint transform for pair (a,b) at frame tid:
        # rotate about joint_pos[a,b] by R = R_b^-1 R_a then apply T_b:
        # cost terms follow loss parity via joint_cost_matrix
        cost = skeleton.joint_cost_matrix(joint_pos, spT, sp_alive)
        cost = jnp.where(jnp.isfinite(cost), cost, 0.0)
        new_cost = joint_cost * momentum + cost * (1.0 - momentum)
        # best-pair loss needs the current tree; use all-pairs mean + the
        # min-cost row proxy (full MST runs between chunks on host)
        best = jnp.mean(jnp.sort(jnp.where(cost > 0, cost, jnp.inf), axis=-1)[:, 0]
                        .clip(0, 1e6))
        return best + jnp.mean(cost), (new_cost, cost)

    @jax.jit
    def run(joint_pos, joint_cost, key):
        opt = optim.adam_init({'jp': joint_pos})

        def step(carry, k):
            jp, opt, jc = carry
            tid = jax.random.randint(k, (), 0, T)
            (loss, (jc2, _)), g = jax.value_and_grad(
                lambda p: loss_fn(p['jp'], tid, jc), has_aux=True)({'jp': jp})
            newp, opt2 = optim.adam_update(g, opt, {'jp': jp}, {'jp': lr},
                                           eps=1e-8)
            return (newp['jp'], opt2, jc2), loss

        keys = jax.random.split(key, steps)
        (jp, _, jc), losses = jax.lax.scan(step, (joint_pos, opt, joint_cost), keys)
        return jp, jc, losses

    jp, jc, losses = run(model.params['joint_pos'], model.joint_cost, key)
    params = dict(model.params)
    params['joint_pos'] = jp
    return model._replace(params=params, joint_cost=jc)


def finalize_joints(cfg: SKGSConfig, model: SKGSModel) -> SKGSModel:
    """MST over joint_cost; joints <- discovered pivots; global_tr <- cached
    root transforms (init_skeleton, sk_gs.py:1045-1050)."""
    parents, depth, root = skeleton.update_joint(
        model.joint_cost, model.params['sp_points'][..., :3], model.sp_alive,
        cfg.sk_knn_num)
    params = dict(model.params)
    m = cfg.num_superpoints
    a = jnp.arange(m)
    b = parents[:, 0]
    is_root = a == root
    joints = jnp.where(is_root[:, None] | ~model.sp_alive[:, None],
                       params['sp_points'][..., :3],
                       params['joint_pos'][a, b])
    params['joints'] = joints
    params['global_tr'] = model.sp_cache[:, root, :7]
    return model._replace(params=params, joint_parents=parents,
                          joint_depth=depth, joint_root=root)


def distill_sk_deform(cfg: SKGSConfig, model: SKGSModel, key,
                      steps: Optional[int] = None, lr: float = 1e-3
                      ) -> SKGSModel:
    """Distill sk_deform_net (+joints, global_tr, LBS weight params) to match
    the cached superpoint motion (init_sk_deform, sk_gs.py:926-1004).

    Losses cmp_t (SE3 log distance), cmp_p (point MSE), cmp_r, cmp_s with
    the default weights (cmp_p=1, cmp_t/r/s=0.01, exps/default.yaml).
    """
    steps = cfg.joint_init_steps if steps is None else steps
    T = model.sp_cache.shape[0]
    points_c = jax.lax.stop_gradient(model.params['xyz'])
    sp_w, sp_k = model.sp_weights, model.sp_knn
    # frozen weights: hoist the dense LBS rows out of the distill scan (the
    # sparse gather path costs a [100k, 5] gather per iteration x 2000)
    dense_sp_w = None
    if cfg.warp_method != 'largest':
        dense_sp_w = superpoints.dense_lbs_rows(
            sp_w, sp_k, cfg.num_superpoints)

    train_names = ['sk_deform', 'joints', 'global_tr']
    for n in ('sp_radius', 'sp_weight', 'sp_W', 'sk_feature'):
        if n in model.params:
            train_names.append(n)

    frozen = {k: v for k, v in model.params.items() if k not in train_names}

    def loss_fn(train_params, tid):
        params = {**frozen, **train_params}
        mm = model._replace(params=params)
        t = model.train_times[tid]
        sp_tr, sp_d_rot, sp_d_scale = split_sp_cache(cfg, model.sp_cache[tid])
        # target points under cached sp motion with frozen weights
        if dense_sp_w is None:
            points_t1 = points_c + superpoints.warp_points(
                points_c, sp_tr, sp_w, sp_k, cfg.warp_method, model.p2sp)
        else:
            empty = jnp.zeros((cfg.num_superpoints, 0), points_c.dtype)
            d1, _, _ = superpoints.warp_blend_dense(
                points_c, sp_tr, dense_sp_w, empty, empty)
            points_t1 = points_c + d1
        out = sk_stage(cfg, mm, points_c, t, time_id=tid)
        points_t2 = points_c + out.d_xyz
        sk_tr = out.aux['skT']
        diff = se3.se3_log(se3.se3_mul(se3.se3_inv(sp_tr), sk_tr))
        # masked MEANS over live rows (not mask-multiplied means over the
        # padded capacity): reference tensors carry no padding, so a
        # capacity-diluted mean would scale these distill gradients with
        # alive/capacity — and change scale at every bucket resize
        def mmean(x, mask):
            mb = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
            return jnp.sum(x * mb) / jnp.maximum(jnp.sum(mb), 1.0)
        cmp_t = mmean(skeleton._safe_norm(diff), model.sp_alive)
        cmp_p = mmean(jnp.square(points_t1 - points_t2),
                      model.alive[:, None])
        cmp_r = mmean(jnp.square(out.aux['sk_rot'] - sp_d_rot),
                      model.sp_alive[:, None])
        cmp_s = mmean(jnp.square(out.aux['sk_scale'] - sp_d_scale),
                      model.sp_alive[:, None])
        return 0.01 * cmp_t + 1.0 * cmp_p + 0.01 * cmp_r + 0.01 * cmp_s

    train_params = {k: model.params[k] for k in train_names}

    @jax.jit
    def run(train_params, key):
        opt = optim.adam_init(train_params)
        lrs = jax.tree.map(lambda _: lr, train_params)

        def step(carry, k):
            tp, opt = carry
            tid = jax.random.randint(k, (), 0, T)
            loss, g = jax.value_and_grad(loss_fn)(tp, tid)
            tp2, opt2 = optim.adam_update(g, opt, tp, lrs, eps=1e-8)
            return (tp2, opt2), loss

        keys = jax.random.split(key, steps)
        (tp, _), losses = jax.lax.scan(step, (train_params, opt), keys)
        return tp, losses

    tp, losses = run(train_params, key)
    params = {**model.params, **tp}
    return model._replace(params=params)


def init_skeleton(cfg: SKGSConfig, model: SKGSModel, key,
                  joint_steps: Optional[int] = None,
                  distill_steps: Optional[int] = None) -> SKGSModel:
    """Full sp->sk transition (init_skeleton, sk_gs.py:1006-1067)."""
    k1, k2 = jax.random.split(key)
    # train_times is a numpy array right after a checkpoint resume (device
    # arrays only appear once a jitted step has run); the distill scan
    # indexes it with a TRACED frame id, which numpy cannot do
    model = model._replace(train_times=jnp.asarray(model.train_times))
    # 1. cache sp transforms for all frames + freeze LBS weights
    sp_cache = compute_sp_transforms_all_frames(cfg, model.params,
                                                model.train_times)
    from .sk_gs import lbs_weights
    w, idx = lbs_weights(cfg, model.params, model.sp_alive, model.params['xyz'])
    p2sp = jnp.take_along_axis(idx, jnp.argmax(w, -1, keepdims=True), 1)[:, 0]
    model = model._replace(sp_cache=sp_cache, sp_weights=w, sp_knn=idx,
                           p2sp=p2sp)
    # 2. joint_pos init + optimization
    params = dict(model.params)
    params['joint_pos'] = joint_pos_init_midpoint(params)
    model = model._replace(params=params)
    model = optimize_joint_pos(cfg, model, k1, steps=joint_steps)
    # 3. MST + joints + global transforms
    model = finalize_joints(cfg, model)
    # 4. distill skeleton net
    model = distill_sk_deform(cfg, model, k2, steps=distill_steps)
    log.info('skeleton initialized (root=%d)', int(model.joint_root))
    return model


# ---------------------------------------------------------------- sp adjust

def superpoint_prune_split(cfg: SKGSConfig, model: SKGSModel,
                           opt_state: optim.AdamState
                           ) -> Tuple[SKGSModel, optim.AdamState, Dict[str, int]]:
    """Masked prune+split of superpoints (sk_gs.py:1593-1681)."""
    from .sk_gs import lbs_weights
    m_cap = cfg.num_superpoints
    weights, indices = lbs_weights(cfg, model.params, model.sp_alive,
                                   model.params['xyz'])
    # zero weights from dead gaussians
    weights = weights * model.alive[:, None]
    prune, split, new_pos = superpoints.superpoint_prune_split_masks(
        weights, indices, model.sp_alive, model.xyz_grad_accum, model.denom,
        model.params['xyz'], cfg.sp_prune_threshold, cfg.sp_split_threshold,
        m_cap)

    alive = model.sp_alive & ~prune
    # assign split copies to dead slots
    rank = jnp.cumsum(split) - 1
    dead_order = jnp.argsort(alive, stable=True)
    n_dead = m_cap - jnp.sum(alive)
    has_slot = split & (rank < n_dead)
    slot = dead_order[jnp.clip(rank, 0, m_cap - 1)]
    idx_scatter = jnp.where(has_slot, slot, m_cap)

    params = dict(model.params)
    for name in ('sp_points', 'joints', 'sp_hyper', 'sp_radius', 'sp_weight'):
        if name not in params:
            continue
        src = params[name]
        vals = src
        if name in ('sp_points', 'joints'):
            vals = jnp.where(split[:, None], new_pos, src[..., :3])
        params[name] = src.at[idx_scatter].set(vals, mode='drop')
    if 'sp_W' in params:
        # new columns copy the split source's column
        W = params['sp_W']
        newW = W.at[:, idx_scatter].set(W, mode='drop')
        params['sp_W'] = newW
    # joint_pos: copy rows and cols of split sources
    jp = params['joint_pos']
    jp = jp.at[idx_scatter].set(jp, mode='drop')
    jp = jp.at[:, idx_scatter].set(jp, mode='drop')
    params['joint_pos'] = jp

    sp_cache = model.sp_cache.at[:, idx_scatter].set(model.sp_cache, mode='drop')
    jc = model.joint_cost
    jc = jc.at[idx_scatter].set(jc, mode='drop')
    jc = jc.at[:, idx_scatter].set(jc, mode='drop')

    alive = alive | (jnp.zeros_like(alive).at[idx_scatter].set(True, mode='drop'))

    touched = jnp.zeros_like(alive).at[idx_scatter].set(True, mode='drop')
    new_opt = opt_state
    for name in ('sp_points', 'joints', 'sp_hyper', 'sp_radius', 'sp_weight',
                 'joint_pos'):
        if name in params:
            new_opt = optim.reset_rows(new_opt, name, touched)

    stats = {'n_pruned': jnp.sum(prune), 'n_split': jnp.sum(has_slot)}
    model = model._replace(params=params, sp_alive=alive, sp_cache=sp_cache,
                           joint_cost=jc)
    return model, new_opt, stats


def superpoint_merge(cfg: SKGSConfig, model: SKGSModel,
                     opt_state: optim.AdamState, key
                     ) -> Tuple[SKGSModel, optim.AdamState, Dict[str, int]]:
    """Merge superpoints with near-identical cached motion
    (superpoint_merge, sk_gs.py:1719-1784). Greedy non-overlapping pairing
    runs on host (non_overlap_merge, :1703-1717)."""
    sp_cache = compute_sp_transforms_all_frames(cfg, model.params,
                                                model.train_times)
    model = model._replace(sp_cache=sp_cache)
    min_diff, min_index = superpoints.superpoint_merge_masks(
        model.params['sp_points'][..., :3], model.sp_alive, sp_cache,
        cfg.num_knn, cfg.sp_merge_threshold)

    # host greedy non-overlap merge
    def _host(min_diff, min_index, alive):
        md = np.asarray(min_diff)
        mi = np.asarray(min_index)
        al = np.asarray(alive).copy()
        m = md.shape[0]
        merged = np.zeros(m, bool)
        removed = np.zeros(m, bool)
        for i in np.argsort(md):
            if not np.isfinite(md[i]) or md[i] >= cfg.sp_merge_threshold:
                break
            j = int(mi[i])
            if merged[i] or merged[j] or not al[i] or not al[j]:
                continue
            removed[i] = True
            merged[i] = True
            merged[j] = True
        return removed

    # host-eager (between steps; axon PJRT lacks pure_callback support)
    removed = jnp.asarray(_host(min_diff, min_index, model.sp_alive))
    alive = model.sp_alive & ~removed
    stats = {'n_merged': jnp.sum(removed)}
    return model._replace(sp_alive=alive), opt_state, stats

