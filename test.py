#!/usr/bin/env python
"""Evaluate a trained SK-GS model: test-split metrics + FPS benchmark.

Reference counterpart: /root/reference/test.py (render loop with device-event
timing -> results.json with PSNR/SSIM/FPS; optional 1000-frame FPS sweep).

    python test.py -c results/synthetic_smoke/config.yaml \
        --load results/synthetic_smoke/checkpoints/best.npz [--fps-sweep]
"""
import argparse
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', required=True)
    parser.add_argument('--load', required=True)
    parser.add_argument('--set', nargs='*', default=[], dest='overrides')
    parser.add_argument('--fps-sweep', action='store_true',
                        help='1000-render FPS benchmark at varying t')
    parser.add_argument('--out', default=None)
    parser.add_argument('--full-capacity', action='store_true',
                        help='evaluate at the config capacity instead of '
                             'the checkpoint-stored (bucketed) capacity')
    parser.add_argument('--pair-capacity', type=int, default=0,
                        help='override raster.pair_capacity (e.g. a bucket '
                             'matched to the checkpoint population)')
    parser.add_argument('--scene', default=None,
                        help='shortcut for --set dataset.scene=... '
                             '(reference train.py --scene parity)')
    args = parser.parse_args(argv)
    if getattr(args, 'scene', None):
        args.overrides = list(args.overrides) + [f'dataset.scene={args.scene}']

    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent / '.jax_cache'))
    from sk_gs_tpu.framework.config import make_config
    from sk_gs_tpu.framework.checkpoint import load_into_pytree
    from sk_gs_tpu.framework.trainer import SKGSTrainer
    from sk_gs_tpu.models import sk_gs
    from sk_gs_tpu.models.gaussian_splatting import init_from_pcd
    from train import build_model_cfg, build_scene

    cfg = make_config(args.config, args.overrides)
    scene, meta, eval_scene, _pcd = build_scene(cfg)
    skcfg, rcfg = build_model_cfg(cfg, meta, scene.image_size)

    # build the model at the CHECKPOINT's capacity (bucketed runs save
    # compacted arrays; evaluating at the padded config capacity would
    # re-pad them and benchmark the worst case instead of the capacity the
    # model actually needs — VERDICT r4 #7). --full-capacity restores the
    # old behavior.
    ckpt_cap = None
    if not args.full_capacity:
        with np.load(args.load, allow_pickle=False) as z:
            for k in z.files:
                if k.endswith('model/params/xyz'):
                    ckpt_cap = int(z[k].shape[0])
                    break
    if ckpt_cap is not None and ckpt_cap != skcfg.gauss.capacity:
        logging.info('model capacity from checkpoint: %d (config %d)',
                     ckpt_cap, skcfg.gauss.capacity)
        skcfg = skcfg._replace(gauss=skcfg.gauss._replace(capacity=ckpt_cap))
    if args.pair_capacity:
        rcfg = rcfg._replace(pair_capacity=int(args.pair_capacity))

    rng = np.random.default_rng(int(cfg['train'].get('seed', 0)))
    n0 = min(int(cfg['train'].get('num_init_points', 2000)),
             skcfg.gauss.capacity)
    pts = rng.uniform(-1.3, 1.3, size=(n0, 3)).astype(np.float32)
    cols = rng.uniform(size=(n0, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, skcfg.gauss)
    model = sk_gs.init_model(jax.random.PRNGKey(0), skcfg, base,
                             np.asarray(meta.train_times))
    trainer = SKGSTrainer(skcfg, rcfg, scene, meta, model,
                          eval_scene=eval_scene)
    # template from ckpt_state(): trainer flags round-trip with the model
    # (legacy checkpoints without flags fall back to stage inference)
    loaded = load_into_pytree({'state': trainer.ckpt_state(),
                               'meta': {'step': 0}}, args.load)
    step = int(np.asarray(loaded['meta']['step'])) or skcfg.total_steps
    trainer.restore(loaded['state'], step)
    model = trainer.state.model

    stage = skcfg.stage_at(trainer.state.step)
    # warmup pass first: the reference's CUDA-event protocol (test.py:56-81)
    # times renders on a built pipeline; including our one-time XLA compile
    # (minutes through the tunnel) in FPS would be meaningless
    trainer.evaluate(eval_scene, stage=stage, full_metrics=True)
    t0 = time.time()
    result = trainer.evaluate(eval_scene, stage=stage, full_metrics=True)
    n_views = eval_scene.num_views
    result['FPS'] = n_views / (time.time() - t0)
    result['stage'] = stage
    result['step'] = trainer.state.step
    result['capacity'] = skcfg.gauss.capacity
    result['pair_capacity'] = rcfg.pair_capacity
    result['n_alive'] = int(np.sum(np.asarray(model.alive)))

    if args.fps_sweep:
        # 1000-frame sweep at varying t (test.py:102-123 protocol)
        from sk_gs_tpu.models.gaussian_splatting import gaussian_inputs
        from sk_gs_tpu.models.sk_gs import forward_deltas
        from sk_gs_tpu.render import composite_background, render

        @jax.jit
        def render_t(m, t):
            out_def = forward_deltas(skcfg, m, t, stage, training=False)
            g = gaussian_inputs(m.gauss_view(), skcfg.gauss,
                                d_xyz=out_def.d_xyz,
                                d_rotation=out_def.d_rotation,
                                d_scaling=out_def.d_scaling)
            out = render(g, eval_scene.view(0), rcfg,
                         active_sh_degree=m.active_sh_degree)
            return composite_background(out['images'], out['opacity'],
                                        jnp.ones(3))

        # batch the sweep inside one jit: per-call dispatch through the
        # TPU tunnel (~2-9 ms) would otherwise dominate the measurement
        @jax.jit
        def sweep(m, ts):
            def body(c, t):
                return c + jnp.mean(render_t_inner(m, t)), None
            tot, _ = jax.lax.scan(body, jnp.zeros(()), ts)
            return tot

        render_t_inner = render_t.__wrapped__
        n = 1000
        chunksz = 100
        ts_all = jnp.linspace(0.0, 1.0, n).reshape(-1, chunksz)
        jax.block_until_ready(sweep(model, ts_all[0]))
        t0 = time.time()
        acc = 0.0
        for row in ts_all:
            acc = acc + sweep(model, row)
        jax.block_until_ready(acc)
        result['FPS_sweep'] = n / (time.time() - t0)

    out_path = Path(args.out) if args.out else Path(args.config).parent / 'results.json'
    with out_path.open('w') as f:
        json.dump(result, f, indent=2)
    logging.info('results: %s -> %s', result, out_path)
    return result


if __name__ == '__main__':
    main()
