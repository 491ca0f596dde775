"""Multi-chip training step: view-parallel rendering + replicated params.

The reference trains one scene per GPU with no gradient sync (SURVEY §2.2);
this module supplies the real multi-chip story: a batch of V views renders
in parallel (one or more views per chip along the mesh 'view' axis), the
loss is the mean over views, and XLA inserts the gradient all-reduce over
ICI during the backward. Gaussian-axis ('gs') sharding constraints are
applied to the preprocess-heavy intermediates so per-Gaussian work also
scales when n_gs > 1.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import optim
from ..models.losses import l1_loss, psnr, ssim_loss
from ..models.sk_gs import SKGSConfig, SKGSModel, forward_deltas
from ..render import RasterConfig, composite_background, render
from ..render.settings import GaussianInputs, ViewParams


class ViewBatch(NamedTuple):
    """A batch of V views (leading axis sharded over the mesh 'view' axis)."""
    Tw2v: jnp.ndarray      # [V, 4, 4]
    Tv2c: jnp.ndarray      # [V, 4, 4]
    campos: jnp.ndarray    # [V, 3]
    tan_fovx: jnp.ndarray  # [V]
    tan_fovy: jnp.ndarray  # [V]
    images: jnp.ndarray    # [V, H, W, 3]
    t: jnp.ndarray         # [V]
    time_id: jnp.ndarray   # [V] int32


def batch_sharding(mesh: Mesh) -> ViewBatch:
    s = lambda ndim: NamedSharding(mesh, P('view', *([None] * (ndim - 1))))
    return ViewBatch(Tw2v=s(3), Tv2c=s(3), campos=s(2), tan_fovx=s(1),
                     tan_fovy=s(1), images=s(4), t=s(1), time_id=s(1))


def make_parallel_train_step(cfg: SKGSConfig, rcfg: RasterConfig, mesh: Mesh,
                             stage: str = 'sp'):
    """Build a pjit-ed multi-view train step.

    Params/model replicated; ViewBatch sharded along 'view'. Per-view
    rendering vmapped; XLA partitions the vmap over the 'view' axis and
    all-reduces the summed gradients over ICI.
    """
    repl = NamedSharding(mesh, P())
    batch_shard = batch_sharding(mesh)

    def render_one_view(model: SKGSModel, vb_row, bg):
        view = ViewParams(Tw2v=vb_row.Tw2v, Tv2c=vb_row.Tv2c,
                          campos=vb_row.campos, tan_fovx=vb_row.tan_fovx,
                          tan_fovy=vb_row.tan_fovy)
        out_def = forward_deltas(cfg, model, vb_row.t, stage,
                                 time_id=vb_row.time_id)
        p = model.params
        scales = jnp.exp(p['scaling']) + out_def.d_scaling
        rot = p['rotation'] + out_def.d_rotation
        rot = rot * jax.lax.rsqrt(
            jnp.sum(jnp.square(rot), axis=-1, keepdims=True) + 1e-18)
        g = GaussianInputs(
            means3d=p['xyz'] + out_def.d_xyz, scales=scales, rotations=rot,
            opacities=jax.nn.sigmoid(p['opacity'][:, 0]),
            sh=jnp.concatenate([p['f_dc'], p['f_rest']], axis=1),
            mask=model.alive)
        out = render(g, view, rcfg, active_sh_degree=model.active_sh_degree)
        img = composite_background(out['images'], out['opacity'], bg)
        return 0.8 * l1_loss(img, vb_row.images) \
            + 0.2 * ssim_loss(img, vb_row.images), psnr(img, vb_row.images)

    @partial(jax.jit,
             in_shardings=(repl, repl, batch_shard, repl, repl),
             out_shardings=(repl, repl, repl))
    def train_step(model: SKGSModel, opt_state: optim.AdamState,
                   batch: ViewBatch, lrs, bg):
        def loss_fn(params):
            m = model._replace(params=params)
            losses, psnrs = jax.vmap(
                lambda row: render_one_view(m, row, bg))(batch)
            return jnp.mean(losses), jnp.mean(psnrs)

        (loss, psnr_v), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            model.params)
        new_params, new_opt = optim.adam_update(grads, opt_state,
                                                model.params, lrs)
        model = model._replace(params=new_params)
        return model, new_opt, {'loss': loss, 'psnr': psnr_v}

    return train_step
