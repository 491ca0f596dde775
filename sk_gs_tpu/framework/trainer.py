"""Staged SK-GS training loop (host orchestration + per-stage jitted steps).

The functional re-design of ``GaussianTrainTask``
(/root/reference/train.py:18-389) + ``IterableFramework.run``
(my_ext/framework.py:634-691):

- stage dispatch is host-side; each stage family gets ONE jitted train step
  (SURVEY §7: <= 8 compiles, no in-graph stage branching);
- LR schedules / loss-weight schedules / interval checks run on host and
  enter the step as traced scalars (never recompile);
- stage transitions (superpoint init, gaussian re-init, skeleton init) and
  adaptive control mutate the capacity-padded state between steps;
- per-frame caches (sp_cache) update inside the step via scatter.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..data.base import Scene, SceneMeta
from ..models import optim, sk_gs, sk_gs_ops, skeleton, superpoints
from ..models.gaussian_splatting import (densify_and_prune, expon_lr,
                                         ndc_grad_norm, reset_opacity)
from ..models.losses import LossWeights, l1_loss, mse_loss, psnr, ssim_loss
from ..models.sk_gs import SKGSConfig, SKGSModel, forward_deltas
from ..render import RasterConfig, composite_background, render
from ..render.settings import GaussianInputs, ViewParams

log = logging.getLogger(__name__)

LW_NAMES = ('image', 'ssim', 'sparse', 'smooth', 'joint', 'joint_all',
            'c_net', 'cmp_p', 'cmp_t', 'cmp_r', 'cmp_s', 'elastic', 'acc',
            'arap', 're_pos', 'jp_dist', 'sp_arap_t', 'sp_arap_ct', 'arap_p')


def expon_lr_traced(s, lr_init, lr_final, lr_delay_mult, max_steps):
    """In-graph get_expon_lr_func (host scalars -> one traced step input;
    per-step scalar uploads through the TPU tunnel cost ~10 ms each)."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros(())
    delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
        0.5 * jnp.pi * jnp.clip(s / 0.01, 0, 1))  # lr_delay_steps fixed 0.01
    t = jnp.clip(s / max_steps, 0.0, 1.0)
    return delay_rate * jnp.exp(
        jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)


def check_interval_v2(step: int, interval: int, start: int, end: int,
                      close: str = '()') -> bool:
    """(every, start, end) interval logic (my_ext/utils/utils.py:126-146).
    end < 0 means no end."""
    if interval is None or interval <= 0:
        return False
    lo_ok = step >= start if close[0] == '[' else step > start
    hi_ok = True if end < 0 else (step <= end if close[1] == ']' else step < end)
    return lo_ok and hi_ok and (step - start) % interval == 0


# ---------------------------------------------------------------- loss

def masked_mean(x, mask):
    """Mean of x over the elements where (broadcast) mask is set.

    The capacity-invariant translation of the reference's plain .mean():
    reference tensors hold only the TRUE rows, so means divide by the live
    count — dividing by the padded capacity instead makes every masked
    loss scale with alive/capacity, which shifts effective loss weights
    at every capacity-bucket change (the root cause of the round-5
    from-scratch bucketed divergence at the init_fix->init boundary)."""
    mask_b = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * mask_b) / jnp.maximum(jnp.sum(mask_b), 1.0)


def weight_sparsity_loss(w, mask=None):
    """Entropy sparsity on LBS weights (loss_weight_sparsity, sk_gs.py:1339).
    ``mask``: alive rows — dead capacity rows carry softmax junk and must
    not dilute (or pollute) the mean."""
    eps = 1e-7
    ent = -(w * jnp.log(w + eps) + (1 - w) * jnp.log(1 - w + eps))
    if mask is None:
        return jnp.mean(ent)
    return masked_mean(ent, mask[:, None])


def weight_smooth_loss(w, knn_index):
    """KNN weight TV (loss_weight_smooth, sk_gs.py:1357-1359)."""
    return jnp.mean(jnp.abs(w[:, None] - w[knn_index]))


@partial(jax.custom_vjp, nondiff_argnums=())
def _smooth_loss_sorted(w, knn_index, perm, sorted_ids, mask):
    return masked_mean(jnp.abs(w[:, None] - w[knn_index]),
                       mask[:, None, None])


def _smooth_sorted_fwd(w, knn_index, perm, sorted_ids, mask):
    # alive-row mask folded into the diffs: dead rows contribute exactly 0
    # to the value AND the backward (sign(0) == 0), and the denominator is
    # the live element count — capacity-bucket invariant
    diff = (w[:, None] - w[knn_index]) * mask[:, None, None]  # [N, J, K]
    denom = jnp.maximum(jnp.sum(mask), 1.0) * (diff.shape[1] * diff.shape[2])
    return jnp.sum(jnp.abs(diff)) / denom, (diff, perm, sorted_ids, denom)


def _smooth_sorted_bwd(res, g):
    diff, perm, sorted_ids, denom = res
    n, j, k = diff.shape
    s = jnp.sign(diff) * (g / denom)                       # d|x| cotangent
    # d/dw_i: + sum over i's J neighbors (plain reduce)
    g_i = jnp.sum(s, axis=1)
    # d/dw_j: - sum over all rows listing j. The gather transpose would be
    # a ~2M-row scatter-add (~28 ms/step on v5e at [100k, 20, 5]); instead
    # reorder the cotangent rows by the knn sort permutation (computed once
    # per gs_knn update) and reduce contiguous sorted segments.
    flat = s.reshape(n * j, k)[perm]
    g_j = jax.ops.segment_sum(flat, sorted_ids, num_segments=n,
                              indices_are_sorted=True)
    return g_i - g_j, None, None, None, None


_smooth_loss_sorted.defvjp(_smooth_sorted_fwd, _smooth_sorted_bwd)


def smooth_loss_fast(w, knn_index, perm, sorted_ids, mask):
    """Alive-masked weight_smooth_loss with a sorted-segment backward.
    Falls back to the plain gather/scatter autodiff when no permutation
    is available."""
    if perm is None:
        return masked_mean(jnp.abs(w[:, None] - w[knn_index]),
                           mask[:, None, None])
    return _smooth_loss_sorted(w, knn_index, perm, sorted_ids, mask)


# ------------------------------------------------------- multi-chip slicing

# params leaves / model fields with a leading Gaussian-capacity axis: under
# the mesh 'gs' axis each chip computes the per-Gaussian work (deform,
# preprocess, per-point losses) on its contiguous 1/n_gs slice. Gradients
# w.r.t. the FULL (replicated) params flow through the dynamic-slice
# transpose (zeros off-slice), so a psum over 'gs' reassembles exact
# full-capacity gradients — the TPU equivalent of the reference's
# single-GPU whole-scene backward.
PER_POINT_PARAMS = ('xyz', 'f_dc', 'f_rest', 'opacity', 'scaling',
                    'rotation', 'hyper', 'sp_W')
PER_POINT_FIELDS = ('alive', 'max_radii2d', 'xyz_grad_accum', 'denom',
                    'sp_weights', 'sp_knn', 'p2sp')


def slice_model_gs(model: SKGSModel, i, n_gs: int):
    """Contiguous capacity slice ``i`` of ``n_gs`` of the per-point leaves
    (superpoint/skeleton/net leaves stay replicated)."""
    n = model.capacity
    nl = n // n_gs
    sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * nl, nl, 0)
    params = {k: (sl(v) if k in PER_POINT_PARAMS else v)
              for k, v in model.params.items()}
    fields = {f: sl(getattr(model, f)) for f in PER_POINT_FIELDS}
    return model._replace(params=params, **fields)


@dataclass
class TrainerState:
    model: SKGSModel
    opt_state: optim.AdamState
    step: int = 0
    key: jax.Array = None
    gs_knn_index: Optional[jnp.ndarray] = None
    # sorted-segment backward for the smooth loss: argsort of the flat knn
    # index + the sorted ids, refreshed with gs_knn_index (derived — NOT
    # checkpointed; recomputed from gs_knn_index on restore)
    gs_knn_perm: Optional[jnp.ndarray] = None
    gs_knn_sorted: Optional[jnp.ndarray] = None
    best_psnr: float = -1.0
    skeleton_initialized: bool = False
    sp_initialized: bool = False
    reinit_done: bool = False


class SKGSTrainer:
    """Host-side orchestration of the staged training."""

    def __init__(self, cfg: SKGSConfig, rcfg: RasterConfig, scene: Scene,
                 meta: SceneMeta, model: SKGSModel,
                 loss_weights: Optional[LossWeights] = None,
                 eval_scene: Optional[Scene] = None,
                 pcd: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 gs_knn_num: int = 20,
                 gs_knn_update_interval: Tuple[int, int] = (1000, 3000),
                 sampler=None,
                 seed: int = 0,
                 clip_norm: float = 0.0,
                 batch_views: int = 1,
                 optimizer: str = 'adam',
                 mesh=None,
                 capacity_buckets: bool = False,
                 capacity_check_interval: int = 500,
                 capacity_min_bucket: int = 4096,
                 capacity_multiple: Optional[int] = None):
        self.cfg = cfg
        self.rcfg = rcfg
        # capacity bucketing (models/capacity.py): with static padding every
        # step pays for the FULL configured capacity even when few Gaussians
        # are alive; bucketing compacts + resizes to track the population,
        # re-jitting on (rare) bucket changes
        self.capacity_buckets = capacity_buckets
        self.capacity_check_interval = capacity_check_interval
        self._max_capacity = model.capacity
        self._max_pair_capacity = rcfg.pair_capacity
        self._last_metrics: Optional[Dict[str, Any]] = None
        self._cap_dirty = False
        n_gs_ = mesh.shape['gs'] if mesh is not None else 1
        if capacity_multiple is None:
            # DMA-friendly row counts that also divide the mesh 'gs' axis
            capacity_multiple = 1024 * n_gs_ // np.gcd(1024, n_gs_)
        elif capacity_multiple % n_gs_ != 0:
            raise ValueError(f'capacity_multiple {capacity_multiple} not '
                             f'divisible by mesh gs axis {n_gs_}')
        self._cap_multiple = capacity_multiple
        self._cap_min_bucket = capacity_min_bucket
        # multi-chip training: a jax Mesh with ('view', 'gs') axes. Views
        # data-parallel over 'view' (grad psum over ICI); per-Gaussian work
        # and the rasterizer sharded over 'gs' (all-to-all splat exchange to
        # tile-row bands). None = single-chip step (identical math).
        self.mesh = mesh
        if mesh is not None:
            n_view, n_gs = mesh.shape['view'], mesh.shape['gs']
            if batch_views % n_view != 0:
                raise ValueError(
                    f"batch_views {batch_views} not divisible by mesh view "
                    f"axis {n_view}")
            if model.capacity % n_gs != 0:
                raise ValueError(
                    f"capacity {model.capacity} not divisible by mesh gs "
                    f"axis {n_gs}")
            if rcfg.grid_h % n_gs != 0:
                raise ValueError(
                    f"grid_h {rcfg.grid_h} not divisible by mesh gs axis "
                    f"{n_gs} (pad image height)")
        self.scene = scene
        self.eval_scene = eval_scene
        self.meta = meta
        self.pcd = pcd
        self.loss_w = loss_weights or LossWeights({
            'image': {'method': 'l1', 'lambda': 0.8}, 'ssim': 0.2,
            'sparse': 0.1, 'smooth': 0.1, 'joint': 1.0, 'joint_all': 1.0,
            'c_net': 1.0, 'cmp_p': 1.0, 'cmp_t': 0.01, 'cmp_r': 0.01,
            'cmp_s': 0.01})
        self.gs_knn_num = gs_knn_num
        self.gs_knn_update_interval = gs_knn_update_interval
        # reference --grad-clip / nominal-batch-size grad accumulation
        # (my_ext/framework.py:264-306, my_ext/trainer.py:21-47)
        self.clip_norm = clip_norm
        self.batch_views = batch_views
        # optimizer registry (make_optimizer, my_ext/optimizer/build.py:85
        # parity); surgery helpers work on any registered state shape
        self.opt_init, self.opt_update = optim.make_optimizer(optimizer)
        # private copy: the jitted step DONATES model/opt buffers, which
        # would delete the caller's arrays (e.g. one init model shared by
        # two trainers in parity tests)
        model = jax.tree.map(jnp.array, model)
        self.state = TrainerState(
            model=model, opt_state=self.opt_init(model.params),
            key=jax.random.PRNGKey(seed),
            gs_knn_index=jnp.zeros((model.capacity, gs_knn_num), jnp.int32))
        self._refresh_knn_perm()
        self._step_fns: Dict[str, Callable] = {}
        self._eval_fns: Dict[str, Callable] = {}
        # optional callback(name) saving a named stage snapshot (the
        # reference saves init.pth / sk_init.pth at stage boundaries)
        self.snapshot_fn: Optional[Callable[[str], None]] = None
        from ..data.sampler import UniformSampler
        self.sampler = sampler or UniformSampler(scene.num_views, seed)
        self._bg = jnp.asarray(
            self.meta.background if self.meta.background is not None
            else (np.ones(3, np.float32)
                  if self.meta.background_type == 'white'
                  else np.zeros(3, np.float32)))

    # ------------------------------------------------------------ lr

    def lr_trees(self, step: int) -> Dict[str, Any]:
        """Per-leaf LRs (get_params + update_learning_rate parity,
        sk_gs.py:582-634). Stage-relative step offsets for deform/xyz."""
        cfg = self.cfg
        g = cfg.gauss
        stages = cfg.stages
        if step <= stages['sp_fix'][0]:
            s = step
        elif step <= stages['sp'][1]:
            s = step - stages['sp_fix'][0]
        else:
            s = step - stages['sk_init'][0]
        spatial = 5.0  # sk_gs.py:583 fixes lr_spatial_scale=5
        lr = g.lr
        xyz_lr = expon_lr(s, lr * g.lr_position_init * spatial,
                          lr * g.lr_position_final * spatial,
                          lr_delay_mult=g.lr_position_delay_mult,
                          max_steps=g.lr_position_max_steps)
        deform_base = cfg.lr_deform_scale * lr * spatial * g.lr_position_init
        deform_lr = expon_lr(s, deform_base,
                             lr * g.lr_position_final * cfg.lr_deform_scale,
                             lr_delay_mult=g.lr_position_delay_mult,
                             max_steps=cfg.lr_deform_max_steps)
        lr_f = lr * cfg.lr_feature_scale
        flat = {
            'xyz': xyz_lr, 'f_dc': lr * g.lr_feature,
            'f_rest': lr * g.lr_feature / 20.0,
            'opacity': lr * g.lr_opacity, 'scaling': lr * g.lr_scaling,
            'rotation': lr * g.lr_rotation,
            'hyper': lr_f, 'sp_hyper': lr_f,
            'sp_points': deform_base, 'sp_W': deform_base,
            'sp_radius': deform_base, 'sp_weight': deform_base,
            'joint_pos': deform_base, 'global_tr': 0.0,
            'joints': deform_base * cfg.lr_joints,
            'sk_feature': lr,  # reference group lr (sk_gs.py:609-610)
        }
        params = self.state.model.params
        tree = {}
        for name, leaf in params.items():
            if name in ('sp_deform', 'canonical', 'sk_deform'):
                tree[name] = jax.tree.map(lambda _: deform_lr, leaf)
            else:
                tree[name] = flat.get(name, 0.0)
        return tree

    def lr_trees_traced(self, s):
        """Same as lr_trees but from ONE traced stage-relative step scalar
        (built inside the jitted step; avoids ~30 scalar uploads/step)."""
        cfg = self.cfg
        g = cfg.gauss
        spatial = 5.0
        lr = g.lr
        xyz_lr = expon_lr_traced(s, lr * g.lr_position_init * spatial,
                                 lr * g.lr_position_final * spatial,
                                 g.lr_position_delay_mult,
                                 g.lr_position_max_steps)
        deform_base = cfg.lr_deform_scale * lr * spatial * g.lr_position_init
        deform_lr = expon_lr_traced(s, deform_base,
                                    lr * g.lr_position_final * cfg.lr_deform_scale,
                                    g.lr_position_delay_mult,
                                    cfg.lr_deform_max_steps)
        lr_f = lr * cfg.lr_feature_scale
        flat = {
            'xyz': xyz_lr, 'f_dc': lr * g.lr_feature,
            'f_rest': lr * g.lr_feature / 20.0,
            'opacity': lr * g.lr_opacity, 'scaling': lr * g.lr_scaling,
            'rotation': lr * g.lr_rotation,
            'hyper': lr_f, 'sp_hyper': lr_f,
            'sp_points': deform_base, 'sp_W': deform_base,
            'sp_radius': deform_base, 'sp_weight': deform_base,
            'joint_pos': deform_base, 'global_tr': 0.0,
            'joints': deform_base * cfg.lr_joints,
            'sk_feature': lr,  # reference group lr (sk_gs.py:609-610)
        }
        tree = {}
        for name, leaf in self.state.model.params.items():
            if name in ('sp_deform', 'canonical', 'sk_deform'):
                tree[name] = jax.tree.map(lambda _: deform_lr, leaf)
            else:
                tree[name] = flat.get(name, 0.0)
        return tree

    def stage_rel_step(self, step: int) -> int:
        stages = self.cfg.stages
        if step <= stages['sp_fix'][0]:
            return step
        if step <= stages['sp'][1]:
            return step - stages['sp_fix'][0]
        return step - stages['sk_init'][0]

    # ------------------------------------------------------------ step fns

    def _get_step_fn(self, stage: str) -> Callable:
        family = {'static': 'static', 'init_fix': 'init', 'init': 'init',
                  'sp_fix': 'sp', 'sp': 'sp', 'sk_init': 'sk_init',
                  'sk_fix': 'sk', 'sk': 'sk'}[stage]
        if family not in self._step_fns:
            self._step_fns[family] = self._build_step_fn(family)
        return self._step_fns[family]

    def _build_step_fn(self, family: str) -> Callable:
        cfg, rcfg = self.cfg, self.rcfg
        update_cache = family == 'sp'
        # densify-grad units: our means2d (and its offset hook) are PIXEL
        # coordinates, but the reference accumulates the viewspace gradient
        # in NDC units — its CUDA backward scales by ddelx_dx = 0.5*W
        # (gaussian_render.cu:239,329) before the norm that
        # densify_grad_threshold=0.0002 is calibrated against
        # (gaussian_splatting.py:503-513). Without this factor the
        # threshold is ~(W/2)x too high and densification NEVER fires:
        # the population can only shrink (round-3 white-render collapse,
        # 2000 -> 109 -> 0 alive by the first post-reset prune).
        _IMAGE_SIZE = (rcfg.image_width, rcfg.image_height)
        # sk stages cache the per-frame skeleton-net outputs for the
        # test_time_interpolate eval path (kinematic, sk_gs.py:1077-1079)
        update_sk_cache = family == 'sk'
        image_method = self.loss_w.cfg('image').get('method', 'l1')
        # multi-chip: per-sample losses are computed on the 'gs' slice (or
        # replicated for M-level terms) and scaled by 1/n_gs so the psum
        # over the mesh reproduces the single-chip values exactly
        par = self.mesh is not None
        n_gs_ax = self.mesh.shape['gs'] if par else 1
        n_view_ax = self.mesh.shape['view'] if par else 1
        loss_scale = 1.0 / n_gs_ax
        exch_cap = max(rcfg.pair_capacity // max(n_gs_ax, 1), 1024)
        with_motion_reg = (family in ('sp', 'init')
                           and any(self.loss_w.ever_nonzero(n)
                                   for n in ('elastic', 'acc', 'arap')))
        with_cnet = (family in ('sp', 'init')
                     and cfg.use_canonical_net
                     and self.loss_w.ever_nonzero('c_net'))

        with_sp_extras = (family == 'sp' and any(
            self.loss_w.ever_nonzero(n)
            for n in ('re_pos', 'jp_dist', 'sp_arap_t', 'sp_arap_ct')))
        with_guided = (family == 'sp' and cfg.guided_step_start >= 0
                       and any(self.loss_w.ever_nonzero(n)
                               for n in ('cmp_t', 'cmp_r', 'cmp_s')))
        with_arap_p = (family == 'init'
                       and self.loss_w.ever_nonzero('arap_p'))

        def sp_extra_losses(params, m, aux, points_t, a, b, is_root, lw):
            """Optional sp-stage regularizers (all weight-0 by default in the
            reference too): re_pos = loss_reconstruct (sk_gs.py:1489-1499),
            jp_dist (sk_gs.py:1560-1566), sp_arap_t/sp_arap_ct = loss_sp_arap
            (sk_gs.py:1371-1383)."""
            from ..ops import se3
            out = {}
            spT = aux['spT']
            sp_pts = params['sp_points'][..., :3]
            alive = m.sp_alive
            if self.loss_w.ever_nonzero('re_pos'):
                re_sp = superpoints.get_superpoint_features(
                    points_t, aux['knn_i'], aux['knn_w'],
                    cfg.num_superpoints)
                sp_t = se3.se3_act(spT, sp_pts)
                out['re_pos'] = lw['re_pos'] * masked_mean(
                    jnp.square(sp_t - re_sp), alive[:, None])
            if self.loss_w.ever_nonzero('jp_dist'):
                sp_t = jax.lax.stop_gradient(se3.se3_act(spT, sp_pts))
                piv = params['joint_pos'][a, b]          # [M, 3] pivots
                joints_w = se3.se3_act(spT[b], piv)
                mask_j = alive & ~is_root
                out['jp_dist'] = lw['jp_dist'] * (
                    masked_mean(jnp.square(joints_w - sp_t[a]),
                                mask_j[:, None])
                    + masked_mean(jnp.square(joints_w - sp_t[b]),
                                  mask_j[:, None]))
            if self.loss_w.ever_nonzero('sp_arap_t') or \
                    self.loss_w.ever_nonzero('sp_arap_ct'):
                sp_c = jax.lax.stop_gradient(sp_pts)
                _, knn = superpoints.masked_knn(
                    sp_c, sp_c, alive, cfg.sk_knn_num + 1)
                knn = knn[:, 1:]                          # drop self
                rel = se3.se3_mul(se3.se3_inv(spT[:, None]), spT[knn])
                pair_alive = alive[:, None] & alive[knn]
                out['sp_arap_t'] = lw['sp_arap_t'] * masked_mean(
                    jnp.sqrt(jnp.sum(jnp.square(se3.se3_log(rel)), -1)
                             + 1e-12), pair_alive)
                sp_t = se3.se3_act(spT, sp_c)
                d_c = jnp.sum(jnp.square(sp_c[:, None] - sp_c[knn]), -1)
                d_t = jnp.sum(jnp.square(sp_t[:, None] - sp_t[knn]), -1)
                out['sp_arap_ct'] = lw['sp_arap_ct'] * masked_mean(
                    jnp.abs(d_c - d_t), pair_alive)
            return out

        def guided_losses(params, m, aux, t, s_rel, lw):
            """sp-stage skeleton warmup: drive the sk net + FK toward the
            superpoint transforms (loss_guided_sp, sk_gs.py:1438-1454),
            gated on global step > guided_step_start."""
            from ..models.deform import skeleton_net_apply
            from ..ops import quaternion as quat
            from ..ops import se3
            sp_tr = jax.lax.stop_gradient(aux['spT'])
            sp_rot = jax.lax.stop_gradient(aux['sp_rot'])
            sp_scale = jax.lax.stop_gradient(aux['sp_scale'])
            a = jnp.arange(cfg.num_superpoints)
            b = m.joint_parents[:, 0]
            joints = params['joint_pos'][a, b]
            sk_r, sk_d_rot, sk_d_scale = skeleton_net_apply(
                params['sk_deform'], cfg.sk_net,
                sk_gs.skeleton_net_input(params, joints), t)
            sk_r = sk_gs.sk_rot_activation(sk_r)
            sk_T = skeleton.kinematic_transforms(
                joints, sk_r, sp_tr[m.joint_root], m.joint_parents,
                m.joint_root)
            rel = se3.se3_mul(se3.se3_inv(sp_tr), sk_T)
            gate = (s_rel + cfg.stages['sp_fix'][0]
                    > cfg.guided_step_start).astype(jnp.float32)
            alive = m.sp_alive
            return {
                'g_cmp_t': gate * lw['cmp_t'] * masked_mean(
                    jnp.sqrt(jnp.sum(jnp.square(se3.se3_log(rel)), -1)
                             + 1e-12), alive),
                'g_cmp_r': gate * lw['cmp_r'] * masked_mean(
                    jnp.square(sk_d_rot - sp_rot), alive[:, None]),
                'g_cmp_s': gate * lw['cmp_s'] * masked_mean(
                    jnp.square(sk_d_scale - sp_scale), alive[:, None]),
            }

        def motion_reg_losses(losses, params, m, t, lw, key):
            """elastic / acc / arap on superpoint (or sampled point)
            trajectories (loss_elastic/acc/arap, sk_gs.py:1385-1436). At the
            init stage superpoints don't exist yet — the reference samples
            num_superpoints random gaussians instead (loss(), sk_gs.py:
            1539-1547); sp stage uses the superpoints themselves."""
            from ..models import regularizers as reg
            from ..models.deform import deform_net_apply
            k1, k2, k3, k4 = jax.random.split(key, 4)
            if family == 'init':
                r = jax.random.uniform(k4, (m.capacity,)) \
                    + jnp.where(m.alive, 0.0, 1e9)
                idx = jnp.argsort(r)[:cfg.num_superpoints]
                sp_pts = jax.lax.stop_gradient(params['xyz'][idx])
                mask = m.alive[idx]
            else:
                sp_pts = jax.lax.stop_gradient(params['sp_points'][..., :3])
                mask = m.sp_alive
            dt = cfg.time_interval
            tq = t.reshape(())

            def warp_at(ts):
                def one(tt):
                    return deform_net_apply(params['sp_deform'], cfg.net,
                                            sp_pts, tt)['d_xyz'] + sp_pts
                return jax.vmap(one)(ts)  # [S, M, 3]

            if self.loss_w.ever_nonzero('elastic'):
                t_samp = jax.random.uniform(k1, (8,)) * dt + tq - 0.5 * dt
                nodes_t = jnp.transpose(warp_at(t_samp), (1, 0, 2))  # [M,S,3]
                w_e, idx_e = superpoints.calc_lbs_weight(
                    sp_pts, sp_pts, mask, 3, 'dist',
                    hyper=params['sp_hyper'], sp_hyper=params['sp_hyper'])
                losses['elastic'] = lw['elastic'] * reg.elastic_loss(
                    nodes_t, idx_e[:, 1:], w_e[:, 1:])
            if self.loss_w.ever_nonzero('acc'):
                dt3 = 3.0 * dt
                ts = jnp.stack([tq - dt3, tq, tq + dt3])
                nodes3 = jnp.transpose(warp_at(ts), (1, 0, 2))
                losses['acc'] = lw['acc'] * reg.acc_loss(
                    nodes3, mask.astype(jnp.float32))
            if self.loss_w.ever_nonzero('arap'):
                t_samp = jax.random.uniform(k3, (2,)) * dt + tq - 0.5 * dt
                nodes_seq = warp_at(t_samp)  # [2, M, 3]
                nn_idx, w_a, _ = reg.arap_connectivity(nodes_seq[0], mask,
                                                       k=10)
                losses['arap'] = lw['arap'] * reg.arap_error(
                    nodes_seq, nn_idx, w_a)
            return losses

        def cnet_loss(losses, params, m, t, points_out, lw, stage,
                      aux_main=None, mmean=masked_mean):
            """Canonical-net consistency (loss_canonical_net,
            sk_gs.py:1501-1515)."""
            tc = m.train_times[cfg.canonical_time_id]
            if stage in ('init', 'init_fix'):
                d_c = jax.lax.stop_gradient(sk_gs.init_stage(
                    cfg, params, params['xyz'], tc).d_xyz)
                points_c = d_c + params['xyz']
                d_t = sk_gs.init_stage(cfg, params, points_c, t,
                                       use_canonical=True).d_xyz
                points_t = d_t + points_c
            else:
                # reuse the main pass's (time-independent) LBS weights on
                # the same points — identical values and gradients, one
                # fewer [100k, 512] KNN per step
                fw = aux_main['knn_w'] if aux_main else None
                fk = aux_main['knn_i'] if aux_main else None
                out_c = sk_gs.sp_stage(cfg, params, m.sp_alive,
                                       params['xyz'], tc,
                                       frozen_weights=fw, frozen_knn=fk)
                points_c = jax.lax.stop_gradient(out_c.d_xyz) + params['xyz']
                from ..ops import se3 as se3_ops
                sp_points_c = jax.lax.stop_gradient(
                    se3_ops.se3_act(out_c.aux['spT'],
                                    params['sp_points'][..., :3]))
                out_t = sk_gs.sp_stage(cfg, params, m.sp_alive, points_c, t,
                                       use_canonical=True,
                                       frozen_weights=out_c.aux['knn_w'],
                                       frozen_knn=out_c.aux['knn_i'],
                                       sp_points=sp_points_c)
                points_t = out_t.d_xyz + points_c
            losses['c_net'] = lw['c_net'] * mmean(
                jnp.square(points_t - jax.lax.stop_gradient(points_out)),
                m.alive[:, None])
            return losses

        def _core(stage: str, model: SKGSModel, opt_state, view: ViewParams,
                  image, t, time_id, sched, kns, kbs, k_other, bg,
                  gs_knn_index, knn_perm=None, knn_sorted=None):
            """The full train step body. Single-chip: called directly under
            jit. Multi-chip: runs per-chip inside shard_map over the
            ('view', 'gs') mesh — samples sharded over 'view', per-Gaussian
            work over 'gs', with psums reassembling the exact single-chip
            update (grads through the slice transpose, losses via the
            1/n_gs scaling)."""
            # sched packs [stage_rel_step, noise_scale, *loss_weights] as ONE
            # device array: per-scalar uploads through the tunnel are ~10 ms
            s_rel = sched[0]
            noise_scale = sched[1]
            lw = {name: sched[2 + i] for i, name in enumerate(LW_NAMES)}
            lrs = self.lr_trees_traced(s_rel)
            # grad accumulation (reference nominal-batch-size,
            # my_ext/framework.py:264-306): stacked [K, ...] sample inputs
            batched = view.Tw2v.ndim == 3

            def cap_masked_mean(x, mask):
                """masked_mean over GLOBAL capacity rows. Under the gs
                mesh, x/mask are local slices: local masked sums over the
                psum'd global live count, pre-compensating the uniform
                1/n_gs loss scale applied to every loss below."""
                mask_b = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
                num = jnp.sum(x * mask_b)
                den = jnp.sum(mask_b)
                if par:
                    num = num * n_gs_ax
                    den = jax.lax.psum(den, 'gs')
                return num / jnp.maximum(den, 1.0)

            def loss_fn(params, m2d_off, view, image, t, time_id, k_noise,
                        k_bg):
                bg_s = bg
                if image.shape[-1] == 4:
                    # dynamic background: target composited in-graph per
                    # sample against the SAME bg the render uses
                    # (get_background semantics, datasets/base.py:125-144)
                    from ..data.base import sample_background
                    h_img, w_img = image.shape[0], image.shape[1]
                    bg_s = sample_background(
                        self.meta.background_type, k_bg, h_img, w_img,
                        checker=bg, reference_rgb=image[..., :3])
                    alpha_t = image[..., 3:4]
                    image = image[..., :3] * alpha_t + bg_s * (1.0 - alpha_t)
                m_full = model._replace(params=params)
                if par:
                    m = slice_model_gs(m_full, jax.lax.axis_index('gs'),
                                       n_gs_ax)
                    m2d_off = jax.lax.dynamic_slice_in_dim(
                        m2d_off, jax.lax.axis_index('gs') * m.capacity,
                        m.capacity, 0)
                    knn_index = jax.lax.dynamic_slice_in_dim(
                        gs_knn_index, jax.lax.axis_index('gs') * m.capacity,
                        m.capacity, 0)
                else:
                    m = m_full
                    knn_index = gs_knn_index
                out_def = forward_deltas(cfg, m, t, stage, time_id=time_id,
                                         key=k_noise, noise_scale=noise_scale)
                p = m.params
                scaling = p['scaling']
                if family in ('init',):
                    # uniform scales during init (get_scaling, sk_gs.py:560-564)
                    # (global masked mean: under par the slice-local mean
                    # would differ from the single-chip value)
                    mean_s = masked_mean(m_full.params['scaling'],
                                         m_full.alive[:, None])
                    scaling = jnp.broadcast_to(mean_s, scaling.shape)
                scales = jnp.exp(scaling) + out_def.d_scaling
                rot = p['rotation'] + out_def.d_rotation
                # sqrt(sum+eps) form: finite gradient even at zero rows
                rot = rot * jax.lax.rsqrt(
                    jnp.sum(jnp.square(rot), axis=-1, keepdims=True) + 1e-18)
                sh = jnp.concatenate([p['f_dc'], p['f_rest']], axis=1)
                opac = jax.nn.sigmoid(p['opacity'][:, 0])
                if stage == 'sk_init':
                    # rgb path detached (sk_gs.py:1182-1184, 1580-1581)
                    sh = jax.lax.stop_gradient(sh)
                    opac = jax.lax.stop_gradient(opac)
                g = GaussianInputs(
                    means3d=p['xyz'] + out_def.d_xyz, scales=scales,
                    rotations=rot, opacities=opac, sh=sh, mask=m.alive)
                if par:
                    # gs-sharded raster: local preprocess -> all-to-all splat
                    # exchange to tile-row bands -> band-local (Pallas)
                    # blend -> row all-gather (SSIM windows need the full
                    # image; the gather transpose reduce-scatters the pixel
                    # grads back to the owning band)
                    from ..parallel.sharded_render import exchange_render_band
                    from ..render.preprocess import preprocess as _prep
                    pre = _prep(g, view, rcfg,
                                active_sh_degree=m.active_sh_degree)
                    pre = pre._replace(means2d=pre.means2d + m2d_off)
                    band_img, band_opac, ovf = exchange_render_band(
                        pre, opac, rcfg, 'gs', n_gs_ax, exch_cap)
                    out = {
                        'images': jax.lax.all_gather(band_img, 'gs', axis=0,
                                                     tiled=True),
                        'opacity': jax.lax.all_gather(band_opac, 'gs', axis=0,
                                                      tiled=True),
                        'radii': pre.radius,
                        'overflow': ovf,
                    }
                else:
                    out = render(g, view, rcfg,
                                 active_sh_degree=m.active_sh_degree,
                                 means2d_offset=m2d_off)
                img = composite_background(out['images'], out['opacity'],
                                           bg_s)

                img_loss = mse_loss if image_method == 'mse' else l1_loss
                losses = {
                    'rgb': lw['image'] * img_loss(img, image),
                    'ssim': lw['ssim'] * ssim_loss(img, image),
                }
                aux = dict(out_def.aux)
                if family == 'sp':
                    w = aux['knn_w']
                    ent = -(w * jnp.log(w + 1e-7)
                            + (1 - w) * jnp.log(1 - w + 1e-7))
                    losses['sparse'] = lw['sparse'] * cap_masked_mean(
                        ent, m.alive[:, None])
                    if par:
                        # neighbors live on other gs shards: gather the full
                        # weight table, difference against local rows
                        w_full = jax.lax.all_gather(w, 'gs', axis=0,
                                                    tiled=True)
                        losses['smooth'] = lw['smooth'] * cap_masked_mean(
                            jnp.abs(w[:, None] - w_full[knn_index]),
                            m.alive[:, None, None])
                    else:
                        losses['smooth'] = lw['smooth'] * smooth_loss_fast(
                            w, knn_index, knn_perm, knn_sorted, m.alive)
                    # joint discovery losses
                    cost = skeleton.joint_cost_matrix(
                        params['joint_pos'],
                        jax.lax.stop_gradient(aux['spT'])
                        if cfg.sp_guided_detach else aux['spT'],
                        model.sp_alive)
                    cost_f = jnp.where(jnp.isfinite(cost), cost, 0.0)
                    a = jnp.arange(cfg.num_superpoints)
                    b = model.joint_parents[:, 0]
                    is_root = a == model.joint_root
                    pair_cost = jnp.where(
                        is_root | ~model.sp_alive, 0.0,
                        0.5 * (cost_f[a, b] + cost_f[b, a]))
                    losses['joint'] = lw['joint'] * masked_mean(
                        pair_cost, (~is_root) & model.sp_alive)
                    alive2 = model.sp_alive[:, None] & model.sp_alive[None, :]
                    losses['joint_all'] = lw['joint_all'] * masked_mean(
                        cost_f, alive2)
                    aux['joint_cost_now'] = jax.lax.stop_gradient(cost_f)
                    if with_sp_extras:
                        pts_t_e = p['xyz'] + out_def.d_xyz
                        aux_e, m_e = aux, m
                        if par:
                            # re_pos needs the full point->superpoint segment
                            # reduce: gather the per-point pieces and compute
                            # replicated (cheap M-level math; /n_gs restores
                            # the value after the mesh psum)
                            gath = lambda x: jax.lax.all_gather(
                                x, 'gs', axis=0, tiled=True)
                            pts_t_e = gath(pts_t_e)
                            aux_e = dict(aux)
                            aux_e['knn_w'] = gath(aux['knn_w'])
                            aux_e['knn_i'] = gath(aux['knn_i'])
                            m_e = m_full
                        losses.update(sp_extra_losses(
                            params, m_e, aux_e, pts_t_e, a, b, is_root, lw))
                    if with_guided:
                        losses.update(guided_losses(params, m, aux, t,
                                                    s_rel, lw))
                if stage == 'sk_init':
                    # distill vs cached sp motion (loss_guided_sk_v2,
                    # sk_gs.py:1467-1487)
                    sp_tr, sp_d_rot, sp_d_scale = sk_gs.split_sp_cache(
                        cfg, m.sp_cache[time_id])
                    sp_tr = jax.lax.stop_gradient(sp_tr)
                    points = jax.lax.stop_gradient(p['xyz'])
                    if cfg.warp_method == 'largest':
                        sp_d_xyz = superpoints.warp_points(
                            points, sp_tr, m.sp_weights, m.sp_knn,
                            cfg.warp_method, m.p2sp)
                        sp_rot_b = superpoints.blend_attr(
                            sp_d_rot, m.sp_weights, m.sp_knn)
                        sp_scale_b = superpoints.blend_attr(
                            sp_d_scale, m.sp_weights, m.sp_knn)
                    else:
                        dw = superpoints.dense_lbs_rows(
                            m.sp_weights, m.sp_knn, sp_tr.shape[0])
                        sp_d_xyz, sp_rot_b, sp_scale_b = \
                            superpoints.warp_blend_dense(
                                points, sp_tr, dw, sp_d_rot, sp_d_scale)
                    losses['rgb'] = jax.lax.stop_gradient(losses['rgb'])
                    losses['ssim'] = jax.lax.stop_gradient(losses['ssim'])
                    am = m.alive[:, None]
                    losses['cmp_t'] = lw['cmp_t'] * cap_masked_mean(
                        jnp.square(out_def.d_xyz - sp_d_xyz), am)
                    losses['cmp_r'] = lw['cmp_r'] * cap_masked_mean(
                        jnp.square(out_def.d_rotation - sp_rot_b), am)
                    losses['cmp_s'] = lw['cmp_s'] * cap_masked_mean(
                        jnp.square(out_def.d_scaling - sp_scale_b), am)

                if with_arap_p:
                    # p_arap_ct_init: KNN-distance preservation on the warped
                    # gaussians (loss_points_arap, sk_gs.py:1361-1369); dead
                    # capacity rows are banished far away so they never enter
                    # an alive point's neighborhood
                    from ..models import regularizers as reg
                    from ..ops.knn import knn as knn_op
                    pts_t = p['xyz'] + out_def.d_xyz
                    xyz_a, alive_a = p['xyz'], m.alive
                    if par:
                        # KNN needs the whole point set: gather the warped
                        # points (grads reduce-scatter back through the
                        # gather transpose), compute replicated
                        pts_t = jax.lax.all_gather(pts_t, 'gs', axis=0,
                                                   tiled=True)
                        xyz_a = m_full.params['xyz']
                        alive_a = m_full.alive
                    far = jnp.where(alive_a[:, None], pts_t,
                                    pts_t + 1e6)
                    _, nn_idx = knn_op(jax.lax.stop_gradient(far),
                                       jax.lax.stop_gradient(far),
                                       self.gs_knn_num + 1)
                    losses['arap_p'] = lw['arap_p'] * reg.points_arap_loss(
                        xyz_a, pts_t, nn_idx[:, 1:], alive_a)
                if with_motion_reg:
                    # M-level (superpoint trajectories; the init family
                    # samples rows of the replicated full xyz): replicated
                    losses = motion_reg_losses(losses, params, m_full, t, lw,
                                               k_other)
                if with_cnet:
                    aux_main = aux if family == 'sp' and 'knn_w' in aux \
                        else None
                    losses = cnet_loss(losses, p, m, t,
                                       p['xyz'] + out_def.d_xyz, lw, stage,
                                       aux_main=aux_main, mmean=cap_masked_mean)

                if par:
                    # uniform 1/n_gs: slice-mean losses sum to the global
                    # mean across the gs psum; replicated (image/M-level)
                    # losses are counted once
                    losses = {k: v * loss_scale for k, v in losses.items()}
                total = sum(losses.values())
                aux['losses'] = losses
                aux['psnr'] = psnr(img, image)
                aux['radii'] = out['radii']
                aux['overflow'] = out['overflow']
                # pair high-water mark for capacity bucketing (0 under the
                # exchange path, which has its own per-band capacities)
                aux['num_pairs'] = out.get('num_pairs', jnp.zeros((), jnp.int32))
                # training-health diagnostics (caught the round-3 white-
                # render collapse: n_vis -> 0 while the loss stayed finite)
                aux['n_vis'] = jnp.sum((out['radii'] > 0) & m.alive)
                dx = out_def.d_xyz
                aux['dxyz_max'] = (
                    jnp.max(jnp.abs(jnp.where(m.alive[:, None], dx, 0.0)))
                    if getattr(dx, 'ndim', 0) == 2 else jnp.zeros(()))
                return total, aux

            m2d_off = jnp.zeros((model.capacity, 2))
            vgrad = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
            if not batched:
                (total, aux), grads = vgrad(model.params, m2d_off, view,
                                            image, t, time_id, kns, kbs)
                pgrads, m2d_grad = grads
                aux_k = jax.tree.map(lambda x: x[None], aux)
                time_ids = time_id[None]
                K_tot = 1
            else:
                K = view.Tw2v.shape[0]   # local sample count under par

                def body(carry, inp):
                    view_i, image_i, t_i, tid_i, kn_i, kb_i = inp
                    (tot_i, aux_i), (pg_i, mg_i) = vgrad(
                        model.params, m2d_off, view_i, image_i, t_i, tid_i,
                        kn_i, kb_i)
                    acc_t, acc_pg, acc_mg = carry
                    acc_pg = jax.tree.map(jnp.add, acc_pg, pg_i)
                    return (acc_t + tot_i, acc_pg, acc_mg + mg_i), aux_i

                zeros = (jnp.zeros(()),
                         jax.tree.map(jnp.zeros_like, model.params),
                         m2d_off)
                (tot_sum, pg_sum, mg_sum), aux_k = jax.lax.scan(
                    body, zeros, (view, image, t, time_id, kns, kbs))
                K_tot = K * n_view_ax
                if par:
                    axes = ('view', 'gs')
                    tot_sum = jax.lax.psum(tot_sum, axes)
                    pg_sum = jax.lax.psum(pg_sum, axes)
                    mg_sum = jax.lax.psum(mg_sum, axes)
                total = tot_sum / K_tot
                pgrads = jax.tree.map(lambda x: x / K_tot, pg_sum)
                m2d_grad = mg_sum / K_tot
                aux = jax.tree.map(lambda x: x[-1], aux_k)
                time_ids = time_id
            # gradient sanitization: a single degenerate splat can emit a
            # localized NaN gradient (seen live at dense-run step 12940:
            # one row's xyz/scaling/rotation grad went non-finite and one
            # Adam update poisoned the row, then the whole model). Dropping
            # the non-finite ENTRIES keeps every healthy gradient; the
            # count is surfaced in metrics as n_bad_grad for visibility.
            n_bad_grad = sum(
                jnp.sum(~jnp.isfinite(g)) for g in jax.tree.leaves(pgrads))
            pgrads = jax.tree.map(
                lambda g: jnp.where(jnp.isfinite(g), g, 0.0), pgrads)
            new_params, new_opt = self.opt_update(
                pgrads, opt_state, model.params, lrs,
                clip_norm=self.clip_norm)
            model = model._replace(params=new_params)
            if par:
                # reassemble full-capacity per-sample stats from the gs
                # slices, then combine across the view axis with the same
                # any/max/sum semantics as the single-chip K-sample batch
                gath = lambda x: jax.lax.all_gather(x, 'gs', axis=1,
                                                    tiled=True)
                radii_k = gath(aux_k['radii'])               # [K_l, N]
                seen_k = radii_k > 0
                seen = jax.lax.pmax(
                    jnp.any(seen_k, axis=0).astype(jnp.int32), 'view') > 0
                radii_max = jax.lax.pmax(
                    jnp.max(radii_k, axis=0).astype(jnp.float32), 'view')
                n_seen = jax.lax.psum(
                    jnp.sum(seen_k, axis=0).astype(jnp.float32), 'view')
                gnorm = ndc_grad_norm(m2d_grad, _IMAGE_SIZE, eps=1e-24)
                model = model._replace(
                    max_radii2d=jnp.where(seen, jnp.maximum(
                        model.max_radii2d, radii_max), model.max_radii2d),
                    xyz_grad_accum=jnp.where(
                        seen, model.xyz_grad_accum + gnorm,
                        model.xyz_grad_accum),
                    denom=model.denom + n_seen)
            else:
                model = model._replace(**_stats_update(model, aux_k,
                                                       m2d_grad))
            if (update_cache or update_sk_cache) and 'cache_row' in aux:
                rows_k = jax.lax.stop_gradient(aux_k['cache_row'])
                if par:
                    time_ids = jax.lax.all_gather(time_ids, 'view', axis=0,
                                                  tiled=True)
                    rows_k = jax.lax.all_gather(rows_k, 'view', axis=0,
                                                tiled=True)
                if update_cache:
                    model = model._replace(
                        sp_cache=model.sp_cache.at[time_ids].set(rows_k))
                else:
                    model = model._replace(
                        sk_cache=model.sk_cache.at[time_ids].set(rows_k))
            if update_cache and cfg.warp_method == 'largest' and 'p2sp' in aux:
                p2sp_new = jax.lax.stop_gradient(aux['p2sp'])
                if par:
                    # single-chip takes the LAST sample's assignment: that
                    # sample lives on the last view chip
                    p2sp_new = jax.lax.all_gather(p2sp_new, 'gs', axis=0,
                                                  tiled=True)
                    last = jax.lax.axis_index('view') == n_view_ax - 1
                    p2sp_new = jax.lax.psum(
                        jnp.where(last, p2sp_new, 0), 'view')
                model = model._replace(p2sp=p2sp_new)
            if 'joint_cost_now' in aux:
                cost_sum = jnp.sum(aux_k['joint_cost_now'], axis=0)
                if par:
                    cost_sum = jax.lax.psum(cost_sum, 'view')
                cost_mean = cost_sum / K_tot
                new_cost = model.joint_cost * cfg.sk_momentum \
                    + cost_mean * (1 - cfg.sk_momentum)
                model = model._replace(joint_cost=new_cost)
            loss_sums = {k: jnp.sum(v) for k, v in aux_k['losses'].items()}
            psnr_sum = jnp.sum(aux_k['psnr'])
            ovf = jnp.any(aux_k['overflow'])
            npairs = jnp.max(aux_k['num_pairs'])
            if par:
                loss_sums = jax.lax.psum(loss_sums, ('view', 'gs'))
                psnr_sum = jax.lax.psum(psnr_sum, 'view')
                ovf = jax.lax.pmax(ovf.astype(jnp.int32),
                                   ('view', 'gs')) > 0
                npairs = jax.lax.pmax(npairs, ('view', 'gs'))
            metrics = {'loss': total,
                       'psnr': psnr_sum / K_tot,
                       'overflow': ovf,
                       'num_pairs': npairs,
                       'n_vis': jnp.max(aux_k['n_vis']),
                       'n_bad_grad': n_bad_grad,
                       'dxyz_max': jnp.max(aux_k['dxyz_max']),
                       **{k: v / K_tot for k, v in loss_sums.items()}}
            return model, new_opt, metrics

        def _stats_update(model, aux_k, m2d_grad):
            # aux_k holds stacked [K, ...] per-sample stats; the mean
            # means2d grad stands in for the per-backward accumulation
            seen_k = aux_k['radii'] > 0                      # [K, N]
            seen = jnp.any(seen_k, axis=0)
            radii_max = jnp.max(aux_k['radii'], axis=0)
            max_r = jnp.where(seen, jnp.maximum(
                model.max_radii2d, radii_max.astype(jnp.float32)),
                model.max_radii2d)
            gnorm = ndc_grad_norm(m2d_grad, _IMAGE_SIZE, eps=1e-24)
            n_seen = jnp.sum(seen_k, axis=0).astype(jnp.float32)
            return {
                'max_radii2d': max_r,
                'xyz_grad_accum': jnp.where(
                    seen, model.xyz_grad_accum + gnorm, model.xyz_grad_accum),
                'denom': model.denom + n_seen,
            }

        # donate model + optimizer state: in-place buffer reuse halves the
        # peak HBM of the step (~700 MB at full capacity) and avoids
        # alloc/free churn per step
        @partial(jax.jit, static_argnames=('stage', 'batched'),
                 donate_argnums=(0, 1))
        def train_step(model: SKGSModel, opt_state, scene: Scene,
                       sched, key, bg, gs_knn_index, knn_perm, knn_sorted,
                       stage: str, batched: bool):
            # ONE dispatch per step: sample indices ride packed as f32 at
            # the tail of the sched vector (exact for ints < 2^24), the RNG
            # split and all scene gathers happen in-graph (each host-side
            # device op is a ~2-9 ms tunnel round-trip)
            idxs = sched[2 + len(LW_NAMES):].astype(jnp.int32)
            sched = sched[:2 + len(LW_NAMES)]
            new_key, k_step = jax.random.split(key)
            k_noise, k_other, k_bg = jax.random.split(k_step, 3)
            if batched:
                view = jax.tree.map(lambda x: x[idxs], scene.view_tree())
                image = scene.images[idxs]
                t = scene.times[idxs]
                time_id = scene.time_ids[idxs]
                # per-sample keys split GLOBALLY so the multi-chip stream
                # matches the single-chip scan order exactly
                K = idxs.shape[0]
                kns = jax.random.split(k_noise, K)
                kbs = jax.random.split(k_bg, K)
            else:
                vidx = idxs[0]
                view = scene.view(vidx)
                image = scene.images[vidx]
                t = scene.times[vidx]
                time_id = scene.time_ids[vidx]
                kns, kbs = k_noise, k_bg
            if not par:
                model, opt_state, metrics = _core(
                    stage, model, opt_state, view, image, t, time_id,
                    sched, kns, kbs, k_other, bg, gs_knn_index,
                    knn_perm, knn_sorted)
                return model, opt_state, metrics, new_key
            if not batched:
                raise ValueError("multi-chip training requires stacked "
                                 "[K, ...] sample batches (batch_views)")
            from ..parallel.mesh import shard_map_compat
            pv, pr = P('view'), P()
            fn = shard_map_compat(
                partial(_core, stage), self.mesh,
                in_specs=(pr, pr, pv, pv, pv, pv, pr, pv, pv, pr, pr, pr),
                out_specs=(pr, pr, pr))
            model, opt_state, metrics = fn(
                model, opt_state, view, image, t, time_id, sched,
                kns, kbs, k_other, bg, gs_knn_index)
            return model, opt_state, metrics, new_key

        return train_step

    # ------------------------------------------------------------ events

    def maybe_stage_events(self, step: int):
        """Host-side stage transitions BEFORE/AFTER steps."""
        cfg = self.cfg
        st = self.state
        stages = cfg.stages
        has_sp = stages['sp_fix'][2] > 0 or stages['sp'][2] > 0
        # init_superpoints at init_sampling_step (adaptive_control_init_stage,
        # sk_gs.py:1967-1972)
        if (not st.sp_initialized and step == cfg.init_sampling_step
                and has_sp):
            st.key, k = jax.random.split(st.key)
            st.model, st.opt_state = sk_gs_ops.init_superpoints(
                cfg, st.model, st.opt_state, k)
            st.sp_initialized = True
            log.info('step %d: superpoints initialized by FPS', step)
        # gaussian re-init at sp_fix start (hook_after_train_step)
        if (not st.reinit_done and step == stages['sp_fix'][0]
                and has_sp and stages['sp_fix'][0] > 0
                and self.pcd is not None):
            # the reinit needs room for ALL pcd points: a bucketed run may
            # have shrunk capacity below that (the init-stage superpoint
            # replacement leaves only ~M alive) — grow the bucket first
            n_pts = len(self.pcd[0])
            if self.capacity_buckets and st.model.capacity < n_pts:
                from ..models import capacity as cap_mod
                new_cap = cap_mod.next_bucket(
                    n_pts, min_bucket=self._cap_min_bucket,
                    multiple=self._cap_multiple, max_cap=self._max_capacity)
                log.info('step %d: capacity %d -> %d for the pcd reinit '
                         '(%d points)', step, st.model.capacity, new_cap,
                         n_pts)
                st.model, st.opt_state = cap_mod.resize_model(
                    st.model, st.opt_state, new_cap)
                self.update_gs_knn(step, force=True)
                self._step_fns.clear()
                self._eval_fns.clear()
            st.model, st.opt_state = sk_gs_ops.reinit_gaussians_at_sp_fix(
                cfg, st.model, st.opt_state, self.pcd[0], self.pcd[1])
            st.reinit_done = True
            log.info('step %d: gaussians re-initialized from pcd', step)
            if self.snapshot_fn is not None:
                self.snapshot_fn('init.npz')  # sk_gs.py:1906 parity
        # canonical-net replacement (hook_before_train_step,
        # sk_gs.py:1865-1876): move points/superpoints to the canonical
        # frame and swap sp_deform <- canonical weights
        if (cfg.use_canonical_net and 'canonical' in st.model.params
                and step > stages['sp_fix'][0]
                and step in cfg.canonical_replace_steps):
            self._canonical_replace()
        # skeleton init lazily at first sk-family step
        stage = cfg.stage_at(step)
        if stage in ('sk_init', 'sk_fix', 'sk') and not st.skeleton_initialized:
            st.key, k = jax.random.split(st.key)
            st.model = sk_gs_ops.init_skeleton(
                cfg, st.model, k,
                joint_steps=min(cfg.joint_init_steps, 2000),
                distill_steps=min(cfg.joint_init_steps, 2000))
            # loud failure beats a silent white render: a NaN that slips
            # through the distill loop would otherwise train garbage for the
            # whole 40k-step sk stage (n_vis=0 in metrics was the only tell)
            import jax.numpy as jnp
            for name in ('joints', 'global_tr', 'sk_deform'):
                leaves = jax.tree.leaves(st.model.params.get(name))
                bad = sum(int(jnp.sum(~jnp.isfinite(x))) for x in leaves)
                if bad:
                    raise FloatingPointError(
                        f"init_skeleton produced {bad} non-finite values in "
                        f"params['{name}'] — aborting before the sk stage "
                        f"trains on a broken skeleton")
            st.skeleton_initialized = True
            log.info('step %d: skeleton initialized', step)
            if self.snapshot_fn is not None:
                self.snapshot_fn('sk_init.npz')  # sk_gs.py:1066 parity

    def _canonical_replace(self):
        import jax.numpy as jnp
        from ..models import sk_gs as skm
        from ..ops import se3 as se3_ops
        st = self.state
        cfg = self.cfg
        params = st.model.params
        tc = st.model.train_times[cfg.canonical_time_id]
        out_c = skm.sp_stage(cfg, params, st.model.sp_alive, params['xyz'], tc)
        new_params = dict(params)
        new_params['xyz'] = jax.lax.stop_gradient(
            params['xyz'] + out_c.d_xyz)
        new_params['sp_points'] = jax.lax.stop_gradient(se3_ops.se3_act(
            out_c.aux['spT'], params['sp_points'][..., :3]))
        # DEEP copy, not an identity map: sp_deform and canonical sharing
        # the same buffers makes the donated step see duplicate donated
        # inputs -> TPU INVALID_ARGUMENT (reproduced at step 20000)
        new_params['sp_deform'] = jax.tree.map(jnp.array,
                                               params['canonical'])
        st.model = st.model._replace(params=new_params)
        log.info('canonical net replacement applied at step %d', st.step + 1)

    def maybe_adaptive_control(self, step: int):
        """Densify/prune/superpoint adjust on intervals (adaptive_control,
        sk_gs.py:1940-2036). Host interval logic, jitted mutations."""
        cfg = self.cfg
        g = cfg.gauss
        st = self.state
        stages = cfg.stages
        stage = cfg.stage_at(step)
        if stage in ('static', 'init', 'init_fix'):
            rel = step
            if rel < cfg.init_sampling_step and check_interval_v2(
                    rel, *g.init_densify_prune_interval):
                # size threshold kicks in after the first opacity reset
                # (adaptive_control_init_stage, sk_gs.py:1949)
                size_thr = g.prune_max_screen_size \
                    if rel > g.opacity_reset_interval[0] else 0.0
                do_dens = True
                if not cfg.net.is_blender:
                    # real-capture nets cap init growth at M * ratio
                    # (grad_max=inf branch, sk_gs.py:1950-1956)
                    n_alive = int(jnp.sum(self.state.model.alive))
                    if n_alive > (cfg.num_superpoints
                                  * cfg.node_max_num_ratio_during_init):
                        do_dens = False
                self._densify_prune(do_dens, True, rel, size_thr)
            if rel < cfg.init_sampling_step and check_interval_v2(
                    rel, *g.init_opacity_reset_interval):
                self._reset_opacity()
            return
        if stage in ('sp_fix', 'sp'):
            rel = step - stages['sp_fix'][0]
        elif stage in ('sk_fix', 'sk'):
            return  # sk_densify_gs defaults False (sk_gs.py:1983)
        else:
            return

        is_sp = stage == 'sp'
        if is_sp and check_interval_v2(rel, *cfg.sp_adjust_interval,
                                       close='[)'):
            st.model, st.opt_state, stats = sk_gs_ops.superpoint_prune_split(
                cfg, st.model, st.opt_state)
            log.info('step %d: sp prune/split -%d +%d', step,
                     int(stats['n_pruned']), int(stats['n_split']))
        if is_sp and check_interval_v2(rel, *cfg.sp_merge_interval,
                                       close='[)'):
            st.key, k = jax.random.split(st.key)
            st.model, st.opt_state, stats = sk_gs_ops.superpoint_merge(
                cfg, st.model, st.opt_state, k)
            log.info('step %d: sp merge -%d', step, int(stats['n_merged']))

        if check_interval_v2(rel, *g.densify_interval):
            size_thr = g.prune_max_screen_size \
                if rel > g.opacity_reset_interval[1] else 0.0
            self._densify_prune(True, True, rel, size_thr)
        if (rel > 1 and (rel - 1) % g.opacity_reset_interval[0] == 0) or \
                (self.meta.background_type == 'white'
                 and rel == g.densify_interval[1]):
            self._reset_opacity()

    def _densify_prune(self, do_densify, do_prune, rel_step, size_thr=0.0):
        st = self.state
        st.key, k = jax.random.split(st.key)
        gm = st.model.gauss_view()
        gm2, st.opt_state, stats = densify_and_prune(
            gm, st.opt_state, self.cfg.gauss, self.meta.cameras_extent, k,
            jnp.asarray(do_densify), jnp.asarray(do_prune),
            jnp.asarray(size_thr, jnp.float32))
        st.model = st.model._replace(
            params={**st.model.params, **gm2.params}, alive=gm2.alive,
            max_radii2d=gm2.max_radii2d, xyz_grad_accum=gm2.xyz_grad_accum,
            denom=gm2.denom)
        # population changed: let the next step's bucket check re-evaluate
        self._cap_dirty = True

    def _reset_opacity(self):
        st = self.state
        gm = st.model.gauss_view()
        gm2, st.opt_state = reset_opacity(gm, st.opt_state)
        st.model = st.model._replace(
            params={**st.model.params, **gm2.params})

    def maybe_resize_capacity(self, step: int):
        """Bucket the Gaussian capacity + pair capacity to the population
        (models/capacity.py). Three scalar syncs every check interval."""
        if not self.capacity_buckets:
            return
        if (step % self.capacity_check_interval != 0 and step != 1
                and not self._cap_dirty):
            return
        self._cap_dirty = False
        from ..models import capacity as cap_mod
        st = self.state
        n_alive = int(jnp.sum(st.model.alive))
        new_cap = cap_mod.next_bucket(n_alive,
                                      min_bucket=self._cap_min_bucket,
                                      multiple=self._cap_multiple,
                                      max_cap=self._max_capacity)
        new_pair = self.rcfg.pair_capacity
        lm = self._last_metrics
        if lm is not None and 'num_pairs' in lm:
            pairs = int(np.asarray(lm['num_pairs']))
            if bool(np.asarray(lm.get('overflow', False))):
                pairs = max(pairs * 2, self.rcfg.pair_capacity * 2)
            # pairs == 0 means the gs-sharded exchange path (which manages
            # its own per-band capacities and reports no global high-water
            # mark) — resizing on it would collapse pair_capacity to the
            # min bucket and oscillate, silently dropping splat pairs
            if pairs > 0:
                new_pair = cap_mod.pair_bucket(
                    pairs, chunk=self.rcfg.chunk,
                    max_cap=self._max_pair_capacity)
        if new_cap == st.model.capacity and new_pair == self.rcfg.pair_capacity:
            return
        log.info('step %d: capacity %d -> %d (alive %d), pair_capacity '
                 '%d -> %d', step, st.model.capacity, new_cap, n_alive,
                 self.rcfg.pair_capacity, new_pair)
        if new_cap != st.model.capacity:
            st.model, st.opt_state = cap_mod.resize_model(
                st.model, st.opt_state, new_cap)
            # rows moved: rebuild the row-indexed smooth-loss KNN state
            self.update_gs_knn(step, force=True)
        self.rcfg = self.rcfg._replace(pair_capacity=new_pair)
        # capacity + pair capacity are baked into every jitted program
        self._step_fns.clear()
        self._eval_fns.clear()

    def update_sh_degree(self, step: int):
        """SH-degree warmup restarts at sp_fix
        (change_with_training_progress, sk_gs.py:1856-1863)."""
        cfg = self.cfg
        sp_fix_start = cfg.stages['sp_fix'][0]
        m = self.state.model
        # interval check FIRST: int(active_sh_degree) is a blocking D2H
        # tunnel round-trip — only pay it on the 1-in-1000 steps
        if (step > sp_fix_start
                and (step - sp_fix_start) % 1000 == 0
                and int(m.active_sh_degree) < cfg.gauss.sh_degree):
            self.state.model = m._replace(
                active_sh_degree=m.active_sh_degree + 1)

    def update_gs_knn(self, step: int, force: bool = False):
        if not force \
                and not check_interval_v2(step, *self.gs_knn_update_interval,
                                          -1) \
                and step != 1:
            return
        from ..ops.knn import knn as knn_op
        pts = self.state.model.params['xyz']
        big = jnp.where(self.state.model.alive, 0.0, 1e12)
        pts_m = pts + big[:, None]
        _, idx = knn_op(pts_m, pts_m, self.gs_knn_num + 1)
        self.state.gs_knn_index = idx[:, 1:]
        self._refresh_knn_perm()

    def _refresh_knn_perm(self):
        flat = self.state.gs_knn_index.reshape(-1)
        perm = jnp.argsort(flat).astype(jnp.int32)
        self.state.gs_knn_perm = perm
        self.state.gs_knn_sorted = flat[perm]

    # ------------------------------------------------------------ checkpoint

    def ckpt_state(self) -> Dict[str, Any]:
        """Everything needed to resume EXACTLY (reference parity:
        my_ext/checkpoint.py:86-108 restores every stored object). Includes
        the stage-transition flags — without them a resume inside sk_fix/sk
        would re-run init_skeleton and clobber the trained skeleton."""
        st = self.state
        return {
            'model': st.model,
            'opt': st.opt_state,
            'flags': {
                'skeleton_initialized': np.asarray(st.skeleton_initialized),
                'sp_initialized': np.asarray(st.sp_initialized),
                'reinit_done': np.asarray(st.reinit_done),
                'best_psnr': np.asarray(st.best_psnr, np.float32),
                'key': st.key,
                'gs_knn_index': st.gs_knn_index,
            },
        }

    def restore(self, loaded: Dict[str, Any], step: int):
        """Restore from a ``ckpt_state()``-shaped dict.

        Legacy checkpoints carry no flags; ``load_into_pytree`` then leaves
        the (False) template defaults in place. Stage inference covers that:
        a checkpoint at step S inside an sk stage was necessarily written
        AFTER the lazy skeleton init ran, so OR-ing loaded flags with the
        schedule-derived values is always correct."""
        st = self.state
        st.model = loaded['model']
        if loaded.get('opt') is not None:
            st.opt_state = loaded['opt']
        st.step = step
        stage = self.cfg.stage_at(max(step, 1))
        flags = loaded.get('flags', {})
        st.skeleton_initialized = (
            bool(np.asarray(flags.get('skeleton_initialized', False)))
            or stage in ('sk_init', 'sk_fix', 'sk'))
        st.sp_initialized = (
            bool(np.asarray(flags.get('sp_initialized', False)))
            or step >= self.cfg.init_sampling_step)
        st.reinit_done = (
            bool(np.asarray(flags.get('reinit_done', False)))
            or (self.cfg.stages['sp_fix'][0] > 0
                and step >= self.cfg.stages['sp_fix'][0]))
        if 'best_psnr' in flags:
            st.best_psnr = float(np.asarray(flags['best_psnr']))
        if 'key' in flags:
            st.key = jnp.asarray(flags['key'])
        if 'gs_knn_index' in flags:
            st.gs_knn_index = jnp.asarray(flags['gs_knn_index'])
            self._refresh_knn_perm()
        if stage in ('sp', 'sp_fix') and not np.any(
                np.asarray(st.gs_knn_index)):
            self.update_gs_knn(1)  # legacy ckpt: rebuild the smooth-loss KNN

    # ------------------------------------------------------------ main loop

    def train_step(self, step: int) -> Dict[str, float]:
        """Run training step ``step`` (1-based, reference convention)."""
        cfg = self.cfg
        st = self.state
        self.maybe_stage_events(step)
        stage = cfg.stage_at(step)
        self.loss_w.set_step(step)
        self.update_sh_degree(step)
        if stage == 'sp':
            self.update_gs_knn(step)

        batched = self.batch_views > 1 or self.mesh is not None
        if batched:
            idxs = [self.sampler.sample(step)
                    for _ in range(self.batch_views)]
        else:
            idxs = [self.sampler.sample(step)]

        noise = sk_gs.smooth_scale(cfg, step) if not cfg.net.is_blender else 0.0
        # reference step gates on the loss weights (host-side, rides the
        # sched vector so no recompile): joint losses only from
        # joint_update_interval[1] (sk_gs.py:1554); canonical-net
        # consistency only until canonical_replace + 5 (sk_gs.py:1534-1536,
        # 1502-1503 via loss_canonical_net's step guard)
        lw_vals = []
        for name in LW_NAMES:
            w = self.loss_w.w(name)
            if name in ('joint', 'joint_all', 'jp_dist') \
                    and step < cfg.joint_update_interval[1]:
                w = 0.0
            if name == 'c_net' and cfg.canonical_replace_steps \
                    and step > max(cfg.canonical_replace_steps) + 5:
                w = 0.0
            lw_vals.append(w)
        # one small H2D per step: [s_rel, noise, *loss_weights, *sample idxs]
        sched = jnp.asarray(
            [float(self.stage_rel_step(step)), noise]
            + lw_vals
            + [float(i) for i in idxs], jnp.float32)
        fn = self._get_step_fn(stage)
        st.model, st.opt_state, metrics, st.key = fn(
            st.model, st.opt_state, self.scene, sched, st.key,
            self._bg, st.gs_knn_index, st.gs_knn_perm, st.gs_knn_sorted,
            stage=stage, batched=batched)

        # joint tree update on interval (update_joint, sk_gs.py:1554-1557)
        if stage == 'sp' and check_interval_v2(
                step, *cfg.joint_update_interval, close='[)'):
            parents, depth, root = skeleton.update_joint(
                st.model.joint_cost, st.model.params['sp_points'][..., :3],
                st.model.sp_alive, cfg.sk_knn_num)
            st.model = st.model._replace(joint_parents=parents,
                                         joint_depth=depth, joint_root=root)

        self.maybe_adaptive_control(step)
        self._last_metrics = metrics
        self.maybe_resize_capacity(step)
        st.step = step
        # metrics stay as device scalars — callers float() them only when
        # logging (each D2H fetch is a blocking tunnel round-trip)
        return metrics

    def evaluate(self, scene: Optional[Scene] = None,
                 stage: Optional[str] = None,
                 full_metrics: bool = False) -> Dict[str, float]:
        """Metrics over a split (test.py protocol). ``full_metrics`` adds
        MS-SSIM + LPIPS(alex/vgg) — the reference's 6-column results.json
        (/root/reference/test.py:85-91, my_ext/metrics/image_metric.py:14-60).
        The in-loop eval keeps the cheap PSNR/SSIM pair."""
        from ..models.losses import ssim as ssim_fn
        scene = scene or self.eval_scene or self.scene
        cfg = self.cfg
        stage = stage or cfg.stage_at(max(self.state.step, 1))
        if not full_metrics:
            # cheap in-loop eval: one device dispatch for the whole split
            ps, ss = self._eval_sums_fn(stage)(
                self.state.model, scene.view_tree(), scene.images,
                scene.times, self._bg)
            n = max(scene.num_views, 1)
            return {'PSNR': float(ps) / n, 'SSIM': float(ss) / n}
        # full metrics in ONE device dispatch: the per-view host loop paid
        # ~6 s/view through the TPU tunnel (per-metric syncs + per-LPIPS-call
        # image uploads); the jitted scan renders + reduces all five metrics
        # on device. LPIPS weights ride as ARGUMENTS — as closure constants
        # the vgg net (~56 MB) would blow the tunnel's remote-compile limit.
        from .lpips_jax import load_weights
        pa, _ = load_weights('alex')
        pv, _ = load_weights('vgg')
        sums = self._eval_full_fn(stage)(
            self.state.model, scene.view_tree(), scene.images, scene.times,
            self._bg, pa, pv)
        n = max(scene.num_views, 1)
        out = {k: float(v) / n for k, v in sums.items()}
        out = {k: v for k, v in out.items() if np.isfinite(v)}
        # self-defending artifact (results.json is consumed downstream):
        # - uncalibrated LPIPS moves to an explicitly-named key and the
        #   reference-protocol column is emitted as null — fallback values
        #   (~1e-6) are NOT comparable to published LPIPS numbers
        # - SSIM > 1 gets an in-artifact explanation (zero-padded conv
        #   borders, reference F.conv2d parity); the border-cropped
        #   column alongside is the provably-<=1 variant
        from .metrics import lpips_mode
        mode = lpips_mode('alex')
        out['LPIPS weights'] = mode
        if mode == 'untrained-fallback':
            for net in ('alex', 'vgg'):
                k = f'LPIPS ({net})'
                if k in out:
                    out[f'LPIPS ({net}) [uncalibrated]'] = out[k]
                    out[k] = None
        if out.get('SSIM', 0.0) > 1.0:
            out['SSIM note'] = (
                'SSIM > 1 comes from zero-padded conv borders on '
                'near-perfect frames (matches the reference F.conv2d '
                'padding); see SSIM (border-cropped) for the <=1 variant')
        return out

    def _eval_full_fn(self, stage: str):
        """One-dispatch full-metrics eval (PSNR/SSIM/MS-SSIM/LPIPS alex+vgg)."""
        key = ('full', stage)
        if key in self._eval_fns:
            return self._eval_fns[key]
        from ..models.losses import psnr as psnr_fn, ssim as ssim_fn
        from .lpips_jax import _lpips_nchw
        from .metrics import ms_ssim
        render_one = self._render_eval_fn(stage).__wrapped__

        @jax.jit
        def fn(model: SKGSModel, views: ViewParams, images, times, bg,
               params_alex, params_vgg):
            def body(carry, xs):
                view, gt, t = xs
                img = render_one(model, view, t, bg)
                if gt.shape[-1] == 4:
                    a = gt[..., 3:4]
                    gt = gt[..., :3] * a + bg * (1.0 - a)
                i3, g3 = img[..., :3], gt[..., :3]
                nchw = lambda x: jnp.transpose(x[None], (0, 3, 1, 2))
                # SSIM uses zero-padded convs (reference F.conv2d parity,
                # image_metric.py) which can read >1 on near-perfect frames;
                # the border-cropped column means only the fully-windowed
                # interior of the SSIM map, so the value is provably <= 1
                vals = {
                    'PSNR': psnr_fn(img, gt),
                    'SSIM': ssim_fn(i3, g3),
                    'SSIM (border-cropped)': ssim_fn(i3, g3,
                                                     crop_border=True),
                    'MS-SSIM': ms_ssim(i3, g3),
                    'LPIPS (alex)': jnp.mean(_lpips_nchw(
                        params_alex, nchw(i3), nchw(g3), 'alex')),
                    'LPIPS (vgg)': jnp.mean(_lpips_nchw(
                        params_vgg, nchw(i3), nchw(g3), 'vgg')),
                }
                return {k: carry[k] + v for k, v in vals.items()}, None

            zero = {k: jnp.zeros(()) for k in
                    ('PSNR', 'SSIM', 'SSIM (border-cropped)', 'MS-SSIM',
                     'LPIPS (alex)', 'LPIPS (vgg)')}
            sums, _ = jax.lax.scan(body, zero, (views, images, times))
            return sums

        self._eval_fns[key] = fn
        return fn

    def _eval_sums_fn(self, stage: str):
        """One-dispatch eval: a jitted lax.scan over ALL views that renders
        and accumulates PSNR/SSIM sums on device. The per-view host loop
        costs ~2-9 ms dispatch per view through the TPU tunnel — negligible
        at 20 views, a drag at WIM/ZJU scale (hundreds)."""
        key = ('sums', stage)
        if key in self._eval_fns:
            return self._eval_fns[key]
        from ..models.losses import psnr as psnr_fn, ssim as ssim_fn
        render_one = self._render_eval_fn(stage).__wrapped__  # un-jitted body

        @jax.jit
        def fn(model: SKGSModel, views: ViewParams, images, times, bg):
            def body(carry, xs):
                view, gt, t = xs
                img = render_one(model, view, t, bg)
                if gt.shape[-1] == 4:
                    a = gt[..., 3:4]
                    gt = gt[..., :3] * a + bg * (1.0 - a)
                p = psnr_fn(img, gt)
                s = ssim_fn(img[..., :3], gt[..., :3])
                return (carry[0] + p, carry[1] + s), None

            (ps, ss), _ = jax.lax.scan(body, (jnp.zeros(()), jnp.zeros(())),
                                       (views, images, times))
            return ps, ss

        self._eval_fns[key] = fn
        return fn

    def _render_eval_fn(self, stage: str):
        """Jitted eval renderer per stage (eager re-trace per view would be
        dispatch-bound through the TPU tunnel)."""
        if stage in self._eval_fns:
            return self._eval_fns[stage]
        cfg, rcfg = self.cfg, self.rcfg

        @partial(jax.jit, static_argnames=())
        def fn(model: SKGSModel, view: ViewParams, t, bg):
            # eval uses t directly; sk stages interpolate cached per-frame
            # root transforms (reference test-time path, sk_gs.py:1126-1130)
            # and, with cfg.test_time_interpolate, the cached skeleton-net
            # outputs instead of re-running the net (sk_gs.py:1080-1085)
            out_def = forward_deltas(cfg, model, t, stage, time_id=None,
                                     training=False)
            from ..models.gaussian_splatting import gaussian_inputs
            g = gaussian_inputs(model.gauss_view(), cfg.gauss,
                                d_xyz=out_def.d_xyz,
                                d_rotation=out_def.d_rotation,
                                d_scaling=out_def.d_scaling)
            out = render(g, view, rcfg,
                         active_sh_degree=model.active_sh_degree)
            return composite_background(out['images'], out['opacity'], bg)

        self._eval_fns[stage] = fn
        return fn

    def render_view(self, scene: Scene, i: int, stage: str) -> jnp.ndarray:
        fn = self._render_eval_fn(stage)
        return fn(self.state.model, scene.view(i), scene.times[i], self._bg)
