"""Static 3D Gaussian Splatting model: capacity-padded pytree + pure functions.

Functional re-design of ``GaussianSplatting``
(/root/reference/networks/gaussian_splatting.py:88). Parameters are raw
(pre-activation) capacity-padded arrays plus an ``alive`` mask; densify /
prune / reset run *inside jit* as masked row writes instead of tensor
re-allocation + optimizer-state rebuilds (the reference's
``change_optimizer`` / ``densify_and_split`` / ``prune`` family,
gaussian_splatting.py:515-703).

Activations (parity, gaussian_splatting.py:155-160):
    scales = exp(_scaling); opacity = sigmoid(_opacity);
    rotation = normalize(_rotation); colors from SH with degree schedule.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sh as sh_ops
from ..ops.knn import mean_knn_dist2
from ..render import GaussianInputs, RasterConfig, ViewParams, render
from . import optim


class GaussianConfig(NamedTuple):
    """Static model config."""
    capacity: int = 100_000
    sh_degree: int = 3
    # learning rates (multipliers on cfg.lr, parity with get_params
    # gaussian_splatting.py:443-461)
    lr: float = 1e-3
    lr_position_init: float = 0.16
    lr_position_final: float = 1.6e-3
    lr_position_delay_mult: float = 0.01
    lr_position_max_steps: int = 30_000
    lr_feature: float = 2.5
    lr_opacity: float = 50.0
    lr_scaling: float = 5.0
    lr_rotation: float = 1.0
    # adaptive control (defaults = exps/default.yaml adaptive_control_cfg)
    densify_interval: Tuple[int, int, int] = (100, 500, 25_000)
    densify_grad_threshold: float = 0.0002
    densify_percent_dense: float = 0.01
    prune_interval: Tuple[int, int, int] = (100, 500, 25_000)
    prune_opacity_threshold: float = 0.005
    prune_max_screen_size: float = 20.0
    prune_percent_dense: float = 0.1
    opacity_reset_interval: Tuple[int, int, int] = (3000, 3000, -1)
    # init-stage variants (adaptive_control_init_stage, sk_gs.py:1940-1966)
    init_densify_prune_interval: Tuple[int, int, int] = (100, 0, -1)
    init_opacity_reset_interval: Tuple[int, int, int] = (3000, 0, -1)
    background_type: str = 'white'


def num_rest(sh_degree: int) -> int:
    return (sh_degree + 1) ** 2 - 1


class GaussianModel(NamedTuple):
    """Learnable parameters, raw (pre-activation), capacity-padded.

    Kept as a NamedTuple-of-dict so optimizer surgery can address leaves by
    name; ``params`` is the dict passed to Adam."""
    params: Dict[str, jnp.ndarray]
    alive: jnp.ndarray             # [Ncap] bool
    active_sh_degree: jnp.ndarray  # [] int32
    max_radii2d: jnp.ndarray       # [Ncap] float32
    xyz_grad_accum: jnp.ndarray    # [Ncap] float32
    denom: jnp.ndarray             # [Ncap] float32

    @property
    def capacity(self) -> int:
        return self.params['xyz'].shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def init_from_pcd(points: np.ndarray, colors: np.ndarray, cfg: GaussianConfig
                  ) -> GaussianModel:
    """Initialize from a point cloud (create_from_pcd parity,
    gaussian_splatting.py:201-229): scales from mean 3-NN distance, opacity
    0.1, identity rotations, DC color from RGB."""
    n = points.shape[0]
    cap = cfg.capacity
    assert n <= cap, f"init points {n} > capacity {cap}"
    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(mean_knn_dist2(pts, k=3), 1e-7)
    scales0 = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((cap - n, *x.shape[1:]), fill, x.dtype)], axis=0)

    params = {
        'xyz': pad(pts),
        'f_dc': pad(sh_ops.rgb_to_sh(jnp.asarray(colors, jnp.float32))[:, None, :]),
        'f_rest': jnp.zeros((cap, num_rest(cfg.sh_degree), 3), jnp.float32),
        'scaling': pad(scales0, fill=-10.0),
        'rotation': pad(jnp.tile(jnp.asarray([[0.0, 0, 0, 1]]), (n, 1))).at[n:, 3].set(1.0),
        'opacity': pad(jnp.full((n, 1), inverse_sigmoid(0.1), jnp.float32)),
    }
    alive = jnp.arange(cap) < n
    return GaussianModel(
        params=params,
        alive=alive,
        active_sh_degree=jnp.zeros((), jnp.int32),
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        xyz_grad_accum=jnp.zeros((cap,), jnp.float32),
        denom=jnp.zeros((cap,), jnp.float32),
    )


def random_init(key, n: int, cfg: GaussianConfig, extent: float = 1.3
                ) -> GaussianModel:
    """Random point cloud init (the reference's train.py random init path,
    train.py:52-85: uniform in the scene box, random colors)."""
    k1, k2 = jax.random.split(key)
    pts = jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent)
    cols = jax.random.uniform(k2, (n, 3))
    return init_from_pcd(np.asarray(pts), np.asarray(cols), cfg)


# ---------------------------------------------------------------- activations

def gaussian_inputs(m: GaussianModel, cfg: GaussianConfig,
                    d_xyz=0.0, d_rotation=0.0, d_scaling=0.0,
                    scales_override: Optional[jnp.ndarray] = None
                    ) -> GaussianInputs:
    """Raw params + deformation deltas -> renderer inputs.

    Delta conventions (MUST match sk_gs.py:1202-1203): scale delta added
    *after* exp; rotation delta added to the raw quaternion *before*
    normalization."""
    p = m.params
    scaling = p['scaling'] if scales_override is None else scales_override
    scales = jnp.exp(scaling) + d_scaling
    rot = p['rotation'] + d_rotation
    # sqrt(sum+eps) normalization: finite gradient even at zero rows
    rot = rot * jax.lax.rsqrt(jnp.sum(jnp.square(rot), axis=-1, keepdims=True) + 1e-18)
    sh = jnp.concatenate([p['f_dc'], p['f_rest']], axis=1)
    return GaussianInputs(
        means3d=p['xyz'] + d_xyz,
        scales=scales,
        rotations=rot,
        opacities=jax.nn.sigmoid(p['opacity'][:, 0]),
        sh=sh,
        mask=m.alive,
    )


# ---------------------------------------------------------------- LR schedule

def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """get_expon_lr_func parity (gaussian_splatting.py:56-84), host-side."""
    if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
        return 0.0
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
            0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = np.clip(step / max_steps, 0, 1)
    return float(delay_rate * np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t))


def lr_tree(cfg: GaussianConfig, step: int, spatial_scale: float
            ) -> Dict[str, float]:
    """Per-leaf LR for the static-GS groups (host floats -> traced scalars)."""
    xyz_lr = expon_lr(
        step,
        cfg.lr * cfg.lr_position_init * spatial_scale,
        cfg.lr * cfg.lr_position_final * spatial_scale,
        lr_delay_mult=cfg.lr_position_delay_mult,
        max_steps=cfg.lr_position_max_steps)
    return {
        'xyz': xyz_lr,
        'f_dc': cfg.lr * cfg.lr_feature,
        'f_rest': cfg.lr * cfg.lr_feature / 20.0,
        'opacity': cfg.lr * cfg.lr_opacity,
        'scaling': cfg.lr * cfg.lr_scaling,
        'rotation': cfg.lr * cfg.lr_rotation,
    }


# ---------------------------------------------------------------- adaptive control

def ndc_grad_norm(means2d_grad: jnp.ndarray, image_size,
                  eps: float = 0.0) -> jnp.ndarray:
    """Per-Gaussian viewspace gradient norm in NDC units.

    ``means2d_grad`` is in PIXEL units here; ``image_size`` (W, H) rescales
    to the NDC units the reference thresholds against (its CUDA backward
    multiplies by ddelx_dx = 0.5*W before the norm,
    gaussian_render.cu:239,329 — without this, densify_grad_threshold is
    effectively (W/2)x too high and densification never fires)."""
    scale = jnp.asarray([image_size[0] * 0.5, image_size[1] * 0.5],
                        jnp.float32)
    g2 = means2d_grad[..., :2] * scale
    return jnp.sqrt(jnp.sum(jnp.square(g2), axis=-1) + eps)


def accumulate_stats(m: GaussianModel, radii: jnp.ndarray,
                     means2d_grad: jnp.ndarray,
                     image_size) -> GaussianModel:
    """add_densification_stats + max_radii2D tracking
    (gaussian_splatting.py:503-513, 669-674).

    ``image_size`` (W, H) is REQUIRED: accumulating raw pixel-unit grads
    reproduces the round-3 white-render collapse (densification never
    fires). See :func:`ndc_grad_norm`."""
    if image_size is None:
        raise ValueError(
            "accumulate_stats requires image_size=(W, H) to rescale pixel "
            "grads to the NDC units densify_grad_threshold is calibrated "
            "against")
    seen = radii > 0
    max_r = jnp.where(seen, jnp.maximum(m.max_radii2d, radii.astype(jnp.float32)),
                      m.max_radii2d)
    gnorm = ndc_grad_norm(means2d_grad, image_size)
    accum = jnp.where(seen, m.xyz_grad_accum + gnorm, m.xyz_grad_accum)
    denom = jnp.where(seen, m.denom + 1.0, m.denom)
    return m._replace(max_radii2d=max_r, xyz_grad_accum=accum, denom=denom)


def _assign_dead_slots(alive: jnp.ndarray, select: jnp.ndarray):
    """For each selected row (in order), pick a distinct dead slot.

    Returns (slot_for_rank [Ncap], n_assignable). Selected row with rank r
    goes to slot dead_slots[r]; ranks >= n_dead are dropped (capacity full).
    """
    cap = alive.shape[0]
    dead_order = jnp.argsort(alive, stable=True)  # False (dead) first
    n_dead = cap - jnp.sum(alive)
    return dead_order, n_dead


def densify_and_prune(m: GaussianModel, opt_state: optim.AdamState,
                      cfg: GaussianConfig, extent: float, key,
                      do_densify: jnp.ndarray, do_prune: jnp.ndarray,
                      size_threshold: jnp.ndarray
                      ) -> Tuple[GaussianModel, optim.AdamState, Dict[str, jnp.ndarray]]:
    """Jit-safe adaptive density control (densify/clone/split + prune,
    gaussian_splatting.py:589-651 semantics on masked capacity buffers).

    do_densify / do_prune: traced bools (interval logic runs host-side).
    size_threshold: traced float; <=0 disables the screen-size prune term.
    """
    p = m.params
    cap = m.capacity
    grads = jnp.where(m.denom > 0, m.xyz_grad_accum / jnp.maximum(m.denom, 1.0), 0.0)
    scales = jnp.exp(p['scaling'])
    max_scale = jnp.max(scales, axis=-1)
    opacity = jax.nn.sigmoid(p['opacity'][:, 0])

    # ---- clone (small gaussians with big grads): copy into dead slots
    clone_sel = (grads >= cfg.densify_grad_threshold) \
        & (max_scale <= cfg.densify_percent_dense * extent) & m.alive & do_densify
    # ---- split (large gaussians with big grads): sample 2, replace + add 1
    split_sel = (grads >= cfg.densify_grad_threshold) \
        & (max_scale > cfg.densify_percent_dense * extent) & m.alive & do_densify

    new_sel = clone_sel | split_sel   # each adds exactly one new gaussian
    rank = jnp.cumsum(new_sel) - 1    # rank among selected
    dead_order, n_dead = _assign_dead_slots(m.alive, new_sel)
    has_slot = new_sel & (rank < n_dead)
    slot = dead_order[jnp.clip(rank, 0, cap - 1)]
    # source row for each new gaussian
    src = jnp.arange(cap)

    # sample offsets for splits: x ~ N(0, scale) rotated
    from ..ops import quaternion as quat
    key, k1, k2 = jax.random.split(key, 3)
    noise1 = jax.random.normal(k1, (cap, 3)) * scales
    noise2 = jax.random.normal(k2, (cap, 3)) * scales
    rotn = p['rotation'] / jnp.maximum(
        jnp.linalg.norm(p['rotation'], axis=-1, keepdims=True), 1e-12)
    off1 = quat.apply(rotn, noise1)
    off2 = quat.apply(rotn, noise2)
    split_scale = jnp.log(jnp.maximum(scales / (0.8 * 2.0), 1e-10))

    # per-Gaussian row leaves to densify: the 6 core ones plus any extra
    # capacity-axis leaves the model added (hyper features, sp_W — the
    # reference extends param_names_map the same way, sk_gs.py:429,471)
    row_leaves = [k for k, v in p.items()
                  if hasattr(v, 'ndim') and v.ndim >= 1 and v.shape[0] == cap]
    # new-row values (for clone: copy; for split: sample 2 -> goes to slot)
    new_vals = {k: p[k] for k in row_leaves}
    new_vals['xyz'] = jnp.where(split_sel[:, None], p['xyz'] + off2, p['xyz'])
    new_vals['scaling'] = jnp.where(split_sel[:, None], split_scale,
                                    p['scaling'])

    def scatter_new(dst, vals):
        idx = jnp.where(has_slot, slot, cap)  # cap = out of range -> dropped
        return dst.at[idx].set(vals, mode='drop')

    params = dict(p)
    for k in row_leaves:
        params[k] = scatter_new(p[k], new_vals[k])
    # split: replace ORIGINAL row with sample 1
    params['xyz'] = jnp.where(split_sel[:, None], p['xyz'] + off1, params['xyz'])
    params['scaling'] = jnp.where(split_sel[:, None], split_scale, params['scaling'])

    alive = m.alive | (jnp.zeros_like(m.alive).at[jnp.where(has_slot, slot, cap)]
                       .set(True, mode='drop'))

    # ---- prune
    prune_mask = (opacity < cfg.prune_opacity_threshold)
    big_vs = (m.max_radii2d > size_threshold) & (size_threshold > 0)
    big_ws = (max_scale > cfg.prune_percent_dense * extent) & (size_threshold > 0)
    prune_mask = (prune_mask | big_vs | big_ws) & do_prune
    alive = alive & ~(prune_mask & m.alive)

    # ---- optimizer surgery: zero moments of touched rows (new slots and
    # split-replaced originals; the reference zeroes new rows' moments)
    touched = jnp.zeros_like(alive).at[jnp.where(has_slot, slot, cap)].set(
        True, mode='drop') | split_sel
    new_opt = opt_state
    for name in row_leaves:
        new_opt = optim.reset_rows(new_opt, name, touched)

    stats = {
        'n_cloned': jnp.sum(clone_sel & has_slot),
        'n_split': jnp.sum(split_sel & has_slot),
        'n_pruned': jnp.sum(prune_mask & m.alive),
        'n_dropped': jnp.sum(new_sel & ~has_slot),
    }
    new_m = m._replace(
        params=params, alive=alive,
        max_radii2d=jnp.where(do_densify | do_prune, jnp.zeros_like(m.max_radii2d), m.max_radii2d),
        xyz_grad_accum=jnp.where(do_densify | do_prune, jnp.zeros_like(m.xyz_grad_accum), m.xyz_grad_accum),
        denom=jnp.where(do_densify | do_prune, jnp.zeros_like(m.denom), m.denom),
    )
    return new_m, new_opt, stats


def reset_opacity(m: GaussianModel, opt_state: optim.AdamState
                  ) -> Tuple[GaussianModel, optim.AdamState]:
    """opacity <- inv_sigmoid(min(sigmoid(op), 0.01)) on alive rows
    (gaussian_splatting.py:654-657); moments of the leaf reset."""
    op = m.params['opacity']
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(op), 0.01))
    params = dict(m.params)
    params['opacity'] = jnp.where(m.alive[:, None], new_op, op)
    return m._replace(params=params), optim.reset_leaf(opt_state, 'opacity')


# ---------------------------------------------------------------- rendering

def render_gaussians(m: GaussianModel, view: ViewParams, rcfg: RasterConfig,
                     cfg: GaussianConfig,
                     means2d_offset: Optional[jnp.ndarray] = None,
                     **deform) -> Dict[str, jnp.ndarray]:
    g = gaussian_inputs(m, cfg, **deform)
    return render(g, view, rcfg, active_sh_degree=m.active_sh_degree,
                  means2d_offset=means2d_offset)
