#!/usr/bin/env python
"""Per-component device timing of the BUCKETED train step (VERDICT r4 #5).

Loads a checkpoint (at its stored bucketed capacity), rebuilds the sp/sk
stage inputs at that exact shape, and times each component inside one
jitted ``lax.scan`` (steady-state; the tunnel dispatch amortizes):

  render fwd+bwd | deform net fwd+bwd | dense-rows LBS fwd+bwd |
  binning | SSIM fwd+bwd | Adam update | full train_step wall

Usage: python tools/bucketed_step_profile.py <run_dir> [reps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np


def timed_scan(name, body, init_carry, reps):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(c):
        def step(c, _):
            return body(c), None
        c, _ = jax.lax.scan(step, c, None, length=reps)
        return c

    out = jax.block_until_ready(run(init_carry))   # compile + warm
    t0 = time.time()
    out = jax.block_until_ready(run(init_carry))
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:34s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    run_dir = Path(sys.argv[1] if len(sys.argv) > 1
                   else 'results/fullscale_bucketed_scratch')
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / '.jax_cache'))
    import logging
    logging.basicConfig(level=logging.WARNING)

    from sk_gs_tpu.framework.config import make_config
    from sk_gs_tpu.framework.checkpoint import load_into_pytree
    from sk_gs_tpu.framework.trainer import SKGSTrainer
    from sk_gs_tpu.models import optim, sk_gs, superpoints
    from sk_gs_tpu.models.gaussian_splatting import (gaussian_inputs,
                                                     init_from_pcd)
    from sk_gs_tpu.models.losses import LossWeights, l1_loss, ssim_loss
    from sk_gs_tpu.models.deform import deform_net_apply
    from sk_gs_tpu.render import composite_background, render
    from sk_gs_tpu.render.preprocess import preprocess
    from sk_gs_tpu.render.binning import build_tile_lists
    from train import build_model_cfg, build_scene

    ckpts = sorted(run_dir.glob('checkpoints/checkpoint_*.npz'))
    assert ckpts, f'no checkpoints under {run_dir}'
    ckpt = ckpts[-1]
    cfg = make_config(str(run_dir / 'config.yaml'), [])
    scene, meta, eval_scene, _ = build_scene(cfg)
    skcfg, rcfg = build_model_cfg(cfg, meta, scene.image_size)
    with np.load(ckpt, allow_pickle=False) as z:
        cap = next(int(z[k].shape[0]) for k in z.files
                   if k.endswith('model/params/xyz'))
    skcfg = skcfg._replace(gauss=skcfg.gauss._replace(capacity=cap))
    if len(sys.argv) > 3:
        rcfg = rcfg._replace(pair_capacity=int(sys.argv[3]))
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.3, 1.3, size=(min(2000, cap), 3)).astype(np.float32)
    cols = rng.uniform(size=(pts.shape[0], 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, skcfg.gauss)
    model0 = sk_gs.init_model(jax.random.PRNGKey(0), skcfg, base,
                              np.asarray(meta.train_times))
    trainer = SKGSTrainer(skcfg, rcfg, scene, meta, model0,
                          loss_weights=LossWeights(cfg.get('loss', {})),
                          eval_scene=eval_scene, pcd=(pts, cols),
                          capacity_buckets=True)
    loaded = load_into_pytree({'state': trainer.ckpt_state(),
                               'meta': {'step': 0}}, ckpt)
    step0 = int(np.asarray(loaded['meta']['step']))
    trainer.restore(loaded['state'], step0)
    m = trainer.state.model
    # pair capacity from the population (same bucket the trainer would pick)
    from sk_gs_tpu.models import capacity as cap_mod
    n_alive = int(jnp.sum(m.alive))
    print(f'checkpoint {ckpt.name}: step {step0}, capacity {cap}, '
          f'alive {n_alive}, pair_capacity {rcfg.pair_capacity}')

    stage = skcfg.stage_at(max(step0, 1))
    view = scene.view(0)
    image = scene.images[0]
    t = scene.times[0]
    bg = jnp.ones(3)

    # --- full train_step wall (what train.py pays, bounded pipeline)
    for s in range(step0 + 1, step0 + 6):
        mm = trainer.train_step(s)
    jax.block_until_ready(mm['loss'])
    t0 = time.time()
    pend = []
    for s in range(step0 + 6, step0 + 6 + reps):
        mm = trainer.train_step(s)
        pend.append(mm['loss'])
        if len(pend) > 8:
            jax.block_until_ready(pend.pop(0))
    jax.block_until_ready(mm['loss'])
    print(f"{'full train_step (wall, depth-8)':34s} "
          f"{(time.time()-t0)/reps*1e3:9.3f} ms", flush=True)
    m = trainer.state.model  # post-warm state

    params = m.params

    # --- deform / LBS / render pieces at the live shapes
    def deform_body(c):
        out = deform_net_apply(params['sp_deform'], skcfg.net,
                               params['xyz'] + c * 0, t)
        return c + jnp.mean(out['d_xyz'])

    timed_scan('deform net fwd', deform_body, jnp.zeros(()), reps)

    def deform_fb(c):
        def loss(p):
            out = deform_net_apply(p, skcfg.net, params['xyz'] + c * 0, t)
            return jnp.mean(jnp.square(out['d_xyz']))
        l, g = jax.value_and_grad(loss)(params['sp_deform'])
        return c + l + jnp.mean(g['warp']['w'])

    timed_scan('deform net fwd+bwd', deform_fb, jnp.zeros(()), reps)

    if stage in ('sp', 'sp_fix', 'sk', 'sk_fix'):
        anchors = params['joints'] if stage.startswith('sk') \
            else params['sp_points'][..., :3]
        alive_m = m.sp_alive

        def lbs_fb(c):
            def loss(px):
                w, idx = superpoints.calc_lbs_weight(
                    px, anchors, alive_m, skcfg.num_knn, skcfg.LBS_method,
                    sp_W=params.get('sp_W'))
                dw = superpoints.dense_lbs_rows(w, idx, anchors.shape[0])
                T = jnp.tile(jnp.asarray([0., 0, 0, 0, 0, 0, 1.]),
                             (anchors.shape[0], 1))
                e = jnp.zeros((anchors.shape[0], 0))
                d, _, _ = superpoints.warp_blend_dense(px, T, dw, e, e)
                return jnp.mean(jnp.square(d + px))
            l, g = jax.value_and_grad(loss)(params['xyz'] + c * 0)
            return c + l + jnp.mean(g)

        timed_scan('LBS weights+dense blend fwd+bwd', lbs_fb,
                   jnp.zeros(()), reps)

    g_in = gaussian_inputs(m.gauss_view(), skcfg.gauss)

    def pre_bin_body(c):
        pre = preprocess(g_in._replace(means3d=g_in.means3d + c * 0),
                         view, rcfg, active_sh_degree=m.active_sh_degree)
        binned = build_tile_lists(pre, rcfg)
        return c + jnp.sum(binned.tile_count) * 1e-9

    timed_scan('preprocess + binning fwd', pre_bin_body, jnp.zeros(()), reps)

    def render_fb(c):
        def loss(xyz):
            out = render(g_in._replace(means3d=xyz), view, rcfg,
                         active_sh_degree=m.active_sh_degree)
            img = composite_background(out['images'], out['opacity'], bg)
            return l1_loss(img, image[..., :3])
        l, g = jax.value_and_grad(loss)(g_in.means3d + c * 0)
        return c + l + jnp.mean(g)

    timed_scan('render fwd+bwd (L1)', render_fb, jnp.zeros(()), reps)

    def ssim_fb(c):
        def loss(img):
            return ssim_loss(img, image[..., :3])
        l, g = jax.value_and_grad(loss)(
            jnp.broadcast_to(c, image[..., :3].shape) + 0.5)
        return c + l * 0 + jnp.mean(g)

    timed_scan('SSIM fwd+bwd', ssim_fb, jnp.zeros(()), reps)

    opt = trainer.state.opt_state
    lrs = trainer.lr_trees(max(step0, 1))

    def adam_body(c):
        grads = jax.tree.map(lambda x: x * 0 + c * 1e-9, params)
        p2, _ = trainer.opt_update(grads, opt, params, lrs)
        return c + jnp.mean(p2['xyz'])

    timed_scan('optimizer update (all params)', adam_body, jnp.zeros(()),
               reps)


if __name__ == '__main__':
    main()
