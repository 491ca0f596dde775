"""SK-GS: skeleton-driven dynamic Gaussian splatting (the flagship model).

Functional re-design of ``SkeletonGaussianSplatting``
(/root/reference/networks/sk_gs.py:321). Staged training:
static -> init_fix -> init -> sp_fix -> sp -> sk_init -> sk_fix -> sk
(:407-413); stage dispatch happens host-side and selects one of a few
jitted step programs (SURVEY §7: <= 8 compiles instead of in-graph branching).

State = one params dict (optimizer-addressable leaves) + aux buffers, all
capacity-padded:  N-capacity Gaussians (alive mask) and M-capacity
superpoints (sp_alive mask).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quaternion as quat
from ..ops import se3
from . import skeleton, superpoints
from .deform import (DeformNetConfig, SkeletonNetConfig, deform_net_apply,
                     deform_net_init, skeleton_net_apply, skeleton_net_init)
from .gaussian_splatting import GaussianConfig, GaussianModel

ROT_BIAS = jnp.asarray([0.0, 0.0, 0.0, 1.0])

STAGE_NAMES = ('static', 'init_fix', 'init', 'sp_fix', 'sp', 'sk_init',
               'sk_fix', 'sk')


class SKGSConfig(NamedTuple):
    gauss: GaussianConfig = GaussianConfig()
    net: DeformNetConfig = DeformNetConfig()
    sk_net: SkeletonNetConfig = SkeletonNetConfig()
    train_schedule: Tuple[Tuple[str, int], ...] = (
        ('static', 0), ('init_fix', 2000), ('init', 8000), ('sp_fix', 3000),
        ('sp', 27000), ('sk_init', 0), ('sk_fix', 0), ('sk', 40000))
    num_superpoints: int = 512     # M capacity
    num_knn: int = 5
    hyper_dim: int = 8
    # rotation head parameterization (sk_gs.py:414-418): 'quaternion' = 4-dim
    # head + identity bias + normalize; 'lie' = 3-dim axis-angle head through
    # so3_exp (identity comes free from the tiny-std head init).
    # sk_net.out_dims[0] must match (train.py derives it).
    which_rotation: str = 'quaternion'
    # per-superpoint learned features concatenated to the skeleton-net
    # positional input (sk_feature, sk_gs.py:516-521,1073); 0 = off (the
    # reference's shipped configs). sk_net.p_in_channels must be
    # 3 + sk_feature_dim (train.py derives it).
    sk_feature_dim: int = 0
    LBS_method: str = 'W'
    warp_method: str = 'LBS'
    sep_rot: bool = False
    num_frames: int = 50
    canonical_time_id: int = 0
    use_canonical_net: bool = True
    canonical_replace_steps: Tuple[int, ...] = (20000,)
    sk_knn_num: int = 6
    sk_momentum: float = 0.9
    joint_update_interval: Tuple[int, int, int] = (1000, 20000, 40000)
    joint_init_steps: int = 10000
    init_num_times: int = 16
    init_sampling_step: int = 7500
    node_max_num_ratio_during_init: int = 16
    sp_prune_threshold: float = 1e-3
    sp_split_threshold: float = 0.0002
    sp_merge_threshold: float = 0.0005
    # stage-relative superpoint adjust/merge windows
    # (adaptive_control_cfg sp_adjust/sp_merge, exps/default.yaml:76-77)
    sp_adjust_interval: Tuple[int, int, int] = (100, 10_000, 20_000)
    sp_merge_interval: Tuple[int, int, int] = (100, 20_000, 30_000)
    sp_guided_detach: bool = True
    guided_step_start: int = 40000
    f_s: float = 0.1
    annealing_steps: int = 20000
    test_time_interpolate: bool = False
    # lr config (parity get_params, sk_gs.py:582-616)
    lr_deform_scale: float = 1.0
    lr_feature_scale: float = 2.5
    lr_deform_max_steps: int = 40000
    lr_joints: float = 0.1

    @property
    def stages(self) -> Dict[str, Tuple[int, int, int]]:
        sched = dict(self.train_schedule)
        out = {}
        step = 0
        for name in STAGE_NAMES:  # all stages always present (0-length ok)
            n = int(sched.get(name, 0))
            out[name] = (step, step + n, n)
            step += n
        return out

    @property
    def total_steps(self) -> int:
        return sum(n for _, n in self.train_schedule)

    @property
    def time_interval(self) -> float:
        return 1.0 / self.num_frames

    def stage_at(self, step: int) -> str:
        """get_now_stage parity (start < step <= end, sk_gs.py:1152-1158)."""
        for name, (start, end, n) in self.stages.items():
            if start < step <= end:
                return name
        return 'sk'

    @property
    def sp_cache_dim(self) -> int:
        return 14 if self.sep_rot else 10

    @property
    def sk_cache_dim(self) -> int:
        return sum(self.sk_net.out_dims)


class SKGSModel(NamedTuple):
    params: Dict[str, Any]
    # gaussian aux
    alive: jnp.ndarray
    active_sh_degree: jnp.ndarray
    max_radii2d: jnp.ndarray
    xyz_grad_accum: jnp.ndarray
    denom: jnp.ndarray
    # superpoint aux
    sp_alive: jnp.ndarray          # [M]
    sp_cache: jnp.ndarray          # [T, M, 14|10]
    sk_cache: jnp.ndarray          # [T, M, sum(sk_dims)]
    joint_cost: jnp.ndarray        # [M, M]
    joint_parents: jnp.ndarray     # [M, L]
    joint_depth: jnp.ndarray       # [M]
    joint_root: jnp.ndarray        # []
    sp_weights: jnp.ndarray        # [N, K] frozen LBS weights (sk stages)
    sp_knn: jnp.ndarray            # [N, K]
    p2sp: jnp.ndarray              # [N] hard assignment ('largest')
    train_times: jnp.ndarray       # [T]

    @property
    def capacity(self) -> int:
        return self.params['xyz'].shape[0]

    @property
    def m_capacity(self) -> int:
        return self.params['sp_points'].shape[0]

    def gauss_view(self) -> GaussianModel:
        return GaussianModel(
            params=self.params, alive=self.alive,
            active_sh_degree=self.active_sh_degree,
            max_radii2d=self.max_radii2d,
            xyz_grad_accum=self.xyz_grad_accum, denom=self.denom)


def init_model(key, cfg: SKGSConfig, base: GaussianModel,
               train_times: np.ndarray) -> SKGSModel:
    """Wrap an initialized GaussianModel with the SK-GS state."""
    n_cap = base.capacity
    m = cfg.num_superpoints
    t_frames = cfg.num_frames
    keys = jax.random.split(key, 8)

    params = dict(base.params)
    params['hyper'] = jnp.full((n_cap, cfg.hyper_dim), -1e-2)
    params['sp_points'] = jax.random.normal(keys[0], (m, 3))
    params['sp_hyper'] = jnp.zeros((m, cfg.hyper_dim))
    if cfg.LBS_method == 'W':
        params['sp_W'] = jnp.ones((n_cap, m))
    if cfg.LBS_method in ('kernel', 'weighted_kernel'):
        params['sp_radius'] = jax.random.normal(keys[1], (m,))
    if cfg.LBS_method == 'weighted_kernel':
        params['sp_weight'] = jnp.zeros((m,))
    params['joints'] = jnp.zeros((m, 3))
    params['joint_pos'] = jnp.zeros((m, m, 3))
    # identity per-frame root transforms (the reference zero-inits and
    # overwrites at skeleton init, sk_gs.py:527,1046; identity is safer)
    params['global_tr'] = jnp.tile(se3.se3_identity((1,)), (t_frames, 1))
    params['sp_deform'] = deform_net_init(keys[2], cfg.net)
    if cfg.use_canonical_net and cfg.canonical_time_id >= 0:
        params['canonical'] = deform_net_init(keys[3], cfg.net)
    params['sk_deform'] = skeleton_net_init(keys[4], cfg.sk_net)
    if cfg.sk_feature_dim > 0:
        # randn init (sk_gs.py:518); zeroed on superpoint-count changes in
        # the reference (:1589-1590) — our M is capacity-padded, rows ride
        params['sk_feature'] = jax.random.normal(
            keys[5], (m, cfg.sk_feature_dim))

    return SKGSModel(
        params=params,
        alive=base.alive,
        active_sh_degree=base.active_sh_degree,
        max_radii2d=base.max_radii2d,
        xyz_grad_accum=base.xyz_grad_accum,
        denom=base.denom,
        sp_alive=jnp.ones((m,), bool),
        sp_cache=jnp.zeros((t_frames, m, cfg.sp_cache_dim)),
        sk_cache=jnp.zeros((t_frames, m, cfg.sk_cache_dim)),
        joint_cost=jnp.zeros((m, m)),
        joint_parents=jnp.zeros((m, skeleton.MAX_LEVELS), jnp.int32),
        joint_depth=jnp.zeros((m,), jnp.int32),
        joint_root=jnp.zeros((), jnp.int32),
        sp_weights=jnp.zeros((n_cap, cfg.num_knn)),
        sp_knn=jnp.zeros((n_cap, cfg.num_knn), jnp.int32),
        p2sp=jnp.zeros((n_cap,), jnp.int32),
        train_times=jnp.asarray(train_times, jnp.float32),
    )


# ---------------------------------------------------------------- helpers

def skeleton_net_input(params: Dict[str, Any], joints: jnp.ndarray
                       ) -> jnp.ndarray:
    """Skeleton-net positional input: joints, plus the learned
    per-superpoint features when enabled (kinematic, sk_gs.py:1073)."""
    if 'sk_feature' in params:
        return jnp.concatenate([joints, params['sk_feature']], axis=-1)
    return joints


def sk_rot_activation(sk_r: jnp.ndarray, biased: bool = False) -> jnp.ndarray:
    """Raw rotation head -> unit quaternion. 4-dim head: +identity bias then
    normalize (quaternion mode, sk_gs.py:1076-1077); 3-dim head: axis-angle
    through so3_exp (which_rotation='lie', :414-416 to_SO3 = SO3.exp).
    ``biased`` marks values already carrying the identity bias (sk_cache
    rows are stored post-bias)."""
    if sk_r.shape[-1] == 4:
        return quat.normalize(sk_r if biased else sk_r + ROT_BIAS)
    return se3.so3_exp(sk_r)


def smooth_scale(cfg: SKGSConfig, step: int) -> float:
    """Stage-relative time-noise anneal (get_smooth_scale, sk_gs.py:723-739).
    Host-side."""
    sp_fix_start = cfg.stages['sp_fix'][0]
    s = step if step <= sp_fix_start else step - sp_fix_start
    lr_init, lr_final = cfg.f_s, 1e-15
    lr_delay_steps, lr_delay_mult = 0.01, 1.0
    if s < 0 or (lr_init == 0.0 and lr_final == 0.0):
        return 0.0
    delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
        0.5 * np.pi * np.clip(s / lr_delay_steps, 0, 1))
    t = np.clip(s / cfg.annealing_steps, 0, 1)
    return float(delay_rate * (lr_init * (1 - t) + lr_final * t))


def lbs_weights(cfg: SKGSConfig, params, sp_alive, points, use_hyper=True,
                k: Optional[int] = None):
    return superpoints.calc_lbs_weight(
        points, params['sp_points'][..., :3], sp_alive,
        k or cfg.num_knn, cfg.LBS_method,
        hyper=params['hyper'] if use_hyper and cfg.hyper_dim > 0 else None,
        sp_hyper=params['sp_hyper'] if use_hyper and cfg.hyper_dim > 0 else None,
        sp_W=params.get('sp_W'),
        sp_radius_raw=params.get('sp_radius'),
        sp_weight_raw=params.get('sp_weight'))


def sp_net_outputs(cfg: SKGSConfig, net_params, sp_points, t):
    """Run the superpoint deform net and normalize rotations with the
    identity bias (sk_gs.py:846-848)."""
    outs = deform_net_apply(net_params, cfg.net, jax.lax.stop_gradient(sp_points), t)
    d_rot = quat.normalize(outs['d_rotation'] + ROT_BIAS)
    g_rot = quat.normalize(outs['g_rotation'] + ROT_BIAS) if cfg.sep_rot else None
    return outs['d_xyz'], d_rot, g_rot, outs['d_scaling']


def sp_cache_row(cfg: SKGSConfig, spT, g_rot, d_scale):
    parts = [spT]
    if cfg.sep_rot:
        parts.append(g_rot)
    parts.append(d_scale)
    return jnp.concatenate(parts, axis=-1)


def split_sp_cache(cfg: SKGSConfig, row):
    if cfg.sep_rot:
        return row[..., :7], row[..., 7:11], row[..., 11:14]
    return row[..., :7], row[..., 3:7], row[..., 7:10]


# ---------------------------------------------------------------- stages

class StageOutputs(NamedTuple):
    d_xyz: jnp.ndarray
    d_rotation: jnp.ndarray
    d_scaling: jnp.ndarray
    aux: Dict[str, jnp.ndarray]


def init_stage(cfg: SKGSConfig, params, points, t, key=None,
               noise_scale: float = 0.0, use_canonical: bool = False
               ) -> StageOutputs:
    """Single warp field on all Gaussians (init_stage, sk_gs.py:741-749)."""
    if not cfg.net.is_blender and key is not None and noise_scale > 0:
        t = t + jax.random.normal(key, ()) * cfg.time_interval * noise_scale
    net = params['canonical'] if use_canonical else params['sp_deform']
    d_xyz = deform_net_apply(net, cfg.net, jax.lax.stop_gradient(points), t)['d_xyz']
    zero = jnp.zeros(())
    return StageOutputs(d_xyz, zero, zero, {})


def sp_stage(cfg: SKGSConfig, params, sp_alive, points, t, key=None,
             noise_scale: float = 0.0, use_canonical: bool = False,
             frozen_weights=None, frozen_knn=None, sp_points=None
             ) -> StageOutputs:
    """Superpoint-driven LBS warp (sp_stage, sk_gs.py:830-856)."""
    points = jax.lax.stop_gradient(points)
    sp_points_ = params['sp_points'][..., :3] if sp_points is None else sp_points
    if not cfg.net.is_blender and key is not None and noise_scale > 0:
        t = t + jax.random.normal(key, ()) * cfg.time_interval * noise_scale
    if use_canonical:
        outs = deform_net_apply(params['canonical'], cfg.net,
                                jax.lax.stop_gradient(sp_points_), t)
        d_xyz_sp = outs['d_xyz']
        d_rot_sp = quat.normalize(outs['d_rotation'] + ROT_BIAS)
        g_rot = quat.normalize(outs['g_rotation'] + ROT_BIAS) if cfg.sep_rot else None
        d_scale_sp = outs['d_scaling']
        weights, indices = frozen_weights, frozen_knn
    else:
        d_xyz_sp, d_rot_sp, g_rot, d_scale_sp = sp_net_outputs(
            cfg, params['sp_deform'], sp_points_, t)
        if frozen_weights is not None:
            # LBS weights depend only on (points, params), not on t: callers
            # evaluating the SAME points at another time (c_net canonical
            # pass) reuse the main pass's weights — identical values AND
            # gradients (same function of params)
            weights, indices = frozen_weights, frozen_knn
        else:
            weights, indices = lbs_weights(cfg, params, sp_alive, points)

    spT = superpoints.sp_transforms(d_xyz_sp, d_rot_sp, sp_points_, cfg.warp_method)
    p2sp = jnp.take_along_axis(
        indices, jnp.argmax(weights, axis=-1, keepdims=True), axis=-1)[:, 0]
    rot_attr = g_rot if g_rot is not None else d_rot_sp
    if cfg.warp_method == 'largest':
        d_points = superpoints.warp_points(points, spT, weights, indices,
                                           cfg.warp_method, p2sp)
        d_rotation = superpoints.blend_attr(rot_attr, weights, indices)
        d_scaling = superpoints.blend_attr(d_scale_sp, weights, indices)
    else:
        # dense-rows MXU path: one [N, M] @ [M, 19] matmul replaces the
        # row-aligned gathers + their scatter-add transposes
        dense_w = superpoints.dense_lbs_rows(weights, indices, spT.shape[0])
        d_points, d_rotation, d_scaling = superpoints.warp_blend_dense(
            points, spT, dense_w, rot_attr, d_scale_sp)
    aux = {'spT': spT, 'knn_w': weights, 'knn_i': indices,
           'sp_rot': rot_attr, 'sp_scale': d_scale_sp, 'p2sp': p2sp,
           'cache_row': sp_cache_row(cfg, spT, g_rot, d_scale_sp)}
    return StageOutputs(d_points, d_rotation, d_scaling, aux)


def sk_stage(cfg: SKGSConfig, model: SKGSModel, points, t, time_id=None,
             sk_r_delta=None, detach: bool = False,
             training: bool = True) -> StageOutputs:
    """Skeleton-driven warp via forward kinematics (sk_stage,
    sk_gs.py:1109-1150). Assumes the skeleton is initialized (sk_is_init):
    joints = params['joints'], global transform from params['global_tr'].

    Eval with ``cfg.test_time_interpolate`` uses the per-frame ``sk_cache``
    (written by the sk-family train step) instead of re-running the
    skeleton net: lerp cached (sk_r, d_rot, d_scale) between the two
    neighbouring train frames (kinematic, sk_gs.py:1071-1086)."""
    params = model.params
    points = jax.lax.stop_gradient(points)
    joints = params['joints']

    if time_id is not None:
        g_tr = params['global_tr'][time_id]
    else:
        # test-time interpolation over cached frames
        tt = model.train_times
        idx2 = jnp.clip(jnp.searchsorted(tt, t.reshape(())), 1, tt.shape[0] - 1)
        idx1 = idx2 - 1
        w = (t.reshape(()) - tt[idx1]) / jnp.maximum(tt[idx2] - tt[idx1], 1e-8)
        g_tr = se3.se3_interpolate(params['global_tr'][idx1],
                                   params['global_tr'][idx2], w)

    dims = tuple(cfg.sk_net.out_dims)
    if not training and cfg.test_time_interpolate:
        if time_id is not None:
            row = model.sk_cache[time_id]
        else:
            tt = model.train_times
            idx2 = jnp.clip(jnp.searchsorted(tt, t.reshape(())), 1,
                            tt.shape[0] - 1)
            idx1 = idx2 - 1
            w = jnp.clip((t.reshape(()) - tt[idx1])
                         / jnp.maximum(tt[idx2] - tt[idx1], 1e-8), 0.0, 1.0)
            row = (1.0 - w) * model.sk_cache[idx1] + w * model.sk_cache[idx2]
        sk_r = row[:, :dims[0]]
        d_rot = row[:, dims[0]:dims[0] + dims[1]]
        d_scale = row[:, dims[0] + dims[1]:]
        sk_r = sk_rot_activation(sk_r, biased=True)
        cache_row = row
    else:
        x_in = skeleton_net_input(params, joints)
        sk_r_raw, d_rot, d_scale = skeleton_net_apply(params['sk_deform'],
                                                      cfg.sk_net, x_in, t)
        sk_r = sk_rot_activation(sk_r_raw)
        # cache stores what the reference caches (kinematic, sk_gs.py:1078-
        # 1080): the normalized quaternion in quaternion mode, the RAW
        # axis-angle in lie mode (activation re-applied on the read path)
        cached_r = sk_r if sk_r_raw.shape[-1] == 4 else sk_r_raw
        cache_row = jnp.concatenate([cached_r, d_rot, d_scale], axis=-1)

    sk_T = skeleton.kinematic_transforms(joints, sk_r, g_tr,
                                         model.joint_parents, model.joint_root,
                                         sk_r_delta)
    if detach:
        sk_T = jax.lax.stop_gradient(sk_T)
        d_rot = jax.lax.stop_gradient(d_rot)
        d_scale = jax.lax.stop_gradient(d_scale)

    # LBS against joints (plain distance weights, calc_LBS_weight with no
    # hyper features, sk_gs.py:1144)
    weights, indices = superpoints.calc_lbs_weight(
        points, joints, model.sp_alive, cfg.num_knn, cfg.LBS_method,
        sp_W=params.get('sp_W'), sp_radius_raw=params.get('sp_radius'),
        sp_weight_raw=params.get('sp_weight'))
    dense_w = superpoints.dense_lbs_rows(weights, indices, sk_T.shape[0])
    d_xyz, d_rotation, d_scaling = superpoints.warp_blend_dense(
        points, sk_T, dense_w, d_rot, d_scale)
    aux = {'skT': sk_T, 'knn_w': weights, 'knn_i': indices, 'sk_rot': d_rot,
           'sk_scale': d_scale, 'g_tr': g_tr, 'd_xyz': d_xyz,
           'd_rot': d_rotation, 'd_scale': d_scaling, 'cache_row': cache_row}
    return StageOutputs(d_xyz, d_rotation, d_scaling, aux)


def forward_deltas(cfg: SKGSConfig, model: SKGSModel, t, stage: str,
                   time_id=None, key=None, noise_scale: float = 0.0,
                   sk_r_delta=None, training: bool = True) -> StageOutputs:
    """Stage-dispatched deformation (forward, sk_gs.py:1160-1204).
    ``stage`` is a host-side string -> separate jitted programs per stage."""
    points = model.params['xyz']
    if stage == 'static':
        zero = jnp.zeros(())
        return StageOutputs(zero, zero, zero, {})
    if stage in ('init', 'init_fix'):
        out = init_stage(cfg, model.params, points, t, key, noise_scale)
        if stage == 'init_fix':
            out = StageOutputs(jax.lax.stop_gradient(out.d_xyz),
                               out.d_rotation, out.d_scaling, out.aux)
        return out
    if stage in ('sp', 'sp_fix'):
        out = sp_stage(cfg, model.params, model.sp_alive, points, t, key,
                       noise_scale)
        if stage == 'sp_fix':
            out = StageOutputs(*[jax.lax.stop_gradient(x) for x in
                                 (out.d_xyz, out.d_rotation, out.d_scaling)],
                               out.aux)
        return out
    # sk stages
    return sk_stage(cfg, model, points, t, time_id, sk_r_delta,
                    detach=(stage == 'sk_fix'), training=training)
