#!/usr/bin/env python
"""Train SK-GS (CLI entry; reference counterpart: /root/reference/train.py).

    python train.py -c configs/synthetic_smoke.yaml
    python train.py -c configs/d_nerf.yaml --set dataset.scene=hook
"""
import argparse
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))


def build_scene(cfg):
    """Returns (scene, meta, eval_scene, pcd): pcd is the dataset's seed
    point cloud (colmap points3D) or None -> random/init_ply fallback."""
    kind = cfg['dataset'].get('kind', 'synthetic')
    if kind == 'synthetic':
        from sk_gs_tpu.data.synthetic import make_synthetic_scene
        d = cfg['dataset']
        hw = int(d.get('image_size', 64))
        # GT generation renders the chain gaussians only: a small pair
        # budget avoids compiling a second (huge) training-capacity binning
        # program just for data synthesis. Dense 'detail' scenes (tens of
        # thousands of GT splats) need more; gt_pair_capacity overrides.
        gt_pairs = int(d.get('gt_pair_capacity',
                             min(int(cfg['raster']['pair_capacity']),
                                 2 ** 17)))
        scene, meta, gt = make_synthetic_scene(
            seed=int(cfg['train'].get('seed', 0)),
            num_links=int(d.get('num_links', 3)),
            gauss_per_link=int(d.get('gauss_per_link', 120)),
            num_frames=int(d.get('num_frames', 24)),
            h=hw, w=hw, background=d.get('background', 'white'),
            detail=bool(d.get('detail', False)),
            pair_capacity=gt_pairs,
            chunk=int(cfg['raster']['chunk']),
            use_pallas=_use_pallas(cfg),
            cache_dir=d.get('root'))
        return scene, meta, scene, None  # eval on train split
    d = cfg['dataset']
    ds = float(d.get('downscale', 1))
    bg = d.get('background', 'white')
    if kind == 'dnerf':
        from sk_gs_tpu.data.dnerf import load_dnerf
        scene, meta = load_dnerf(d['root'], d['scene'], 'train',
                                 downscale=ds, background=bg)
        try:
            eval_scene, _ = load_dnerf(d['root'], d['scene'], 'val',
                                       downscale=ds, background=bg)
        except FileNotFoundError:
            eval_scene = scene
        return scene, meta, eval_scene, None
    if kind == 'wim':
        from sk_gs_tpu.data.wim import load_wim
        fr = tuple(d.get('frame_ranges', (0, 50)))
        scene, meta = load_wim(d['root'], d['scene'], 'train', downscale=ds,
                               background=bg, frame_ranges=fr)
        try:
            eval_scene, _ = load_wim(d['root'], d['scene'], 'test',
                                     downscale=ds, background=bg,
                                     frame_ranges=fr)
        except FileNotFoundError:
            eval_scene = scene
        return scene, meta, eval_scene, None
    if kind == 'zju_pickled':
        from sk_gs_tpu.data.zju import load_zju_pickled
        scene, meta = load_zju_pickled(
            d['root'], str(d['scene']),
            pickle_path=d.get('pickle_path', 'cache_train.pickle'),
            frame_ranges=tuple(d.get('frame_ranges', (-1, -1))),
            image_size=int(d.get('image_size', 512)),
            compression=bool(d.get('compression', True)),
            background=bg)
        try:
            eval_scene, _ = load_zju_pickled(
                d['root'], str(d['scene']),
                pickle_path=d.get('eval_pickle_path', 'cache_test.pickle'),
                frame_ranges=tuple(d.get('frame_ranges', (-1, -1))),
                image_size=int(d.get('image_size', 512)),
                compression=bool(d.get('compression', True)),
                background=bg)
        except FileNotFoundError:
            eval_scene = scene
        return scene, meta, eval_scene, None
    if kind == 'zju':
        from sk_gs_tpu.data.zju import load_zju
        scene, meta = load_zju(d['root'], str(d['scene']), 'train',
                               downscale=int(ds), background=bg)
        try:
            eval_scene, _ = load_zju(d['root'], str(d['scene']), 'test',
                                     downscale=int(ds), background=bg)
        except FileNotFoundError:
            eval_scene = scene
        return scene, meta, eval_scene, None
    if kind == 'colmap':
        from sk_gs_tpu.data.colmap import load_colmap
        scene, meta, pts, cols = load_colmap(
            d['root'], images_dir=d.get('images_dir', 'images'),
            downscale=ds, background=bg)
        return scene, meta, scene, (pts, cols)
    raise NotImplementedError(f"dataset kind {kind}")


def _use_pallas(cfg) -> bool:
    setting = cfg['raster'].get('use_pallas', 'auto')
    if setting == 'auto':
        import jax
        return jax.devices()[0].platform not in ('cpu',)
    return bool(setting)


def build_model_cfg(cfg, meta, image_size):
    from sk_gs_tpu.models.deform import DeformNetConfig, SkeletonNetConfig
    from sk_gs_tpu.models.gaussian_splatting import GaussianConfig
    from sk_gs_tpu.models.sk_gs import SKGSConfig
    from sk_gs_tpu.render import RasterConfig

    m = cfg['model']
    sched = tuple((k, int(v)) for k, v in cfg['train_schedule'].items())
    # adaptive_control_cfg parity (exps/default.yaml:65-79): YAML keys map
    # 1:1 onto GaussianConfig / SKGSConfig fields
    ac = dict(cfg.get('adaptive_control', {}))
    gauss_ac = {}
    for key in ('densify_interval', 'prune_interval',
                'opacity_reset_interval', 'init_densify_prune_interval',
                'init_opacity_reset_interval'):
        if key in ac:
            gauss_ac[key] = tuple(int(v) for v in ac.pop(key))
    for key in ('densify_grad_threshold', 'densify_percent_dense',
                'prune_opacity_threshold', 'prune_max_screen_size',
                'prune_percent_dense'):
        if key in ac:
            gauss_ac[key] = float(ac.pop(key))
    sk_ac = {}
    for key in ('sp_adjust_interval', 'sp_merge_interval'):
        if key in ac:
            sk_ac[key] = tuple(int(v) for v in ac.pop(key))
    if ac:
        raise KeyError(f'unknown adaptive_control keys: {sorted(ac)}')
    # train.precision: bf16 = mixed-precision net compute (master params
    # f32); the reference --fp16 AMP analogue (my_ext/framework.py:264-306)
    precision = str(cfg['train'].get('precision', 'f32'))
    cdt = 'bfloat16' if precision in ('bf16', 'bfloat16') else 'float32'
    net = DeformNetConfig(
        depth=int(m['net'].get('depth', 8)), width=int(m['net'].get('width', 256)),
        pos_degree=int(m['net'].get('pos_degree', 10)),
        t_degree=int(m['net'].get('t_degree', 6)),
        is_blender=bool(m.get('is_blender', True)),
        sep_rot=bool(m.get('sep_rot', False)),
        compute_dtype=cdt)
    sk_net_skips = (max(1, int(m['net'].get('depth', 8)) // 2),)
    # rotation-head dim + learned skeleton features (sk_gs.py:414-418,
    # 516-521): out_dims[0] and p_in_channels follow the two knobs
    which_rotation = str(m.get('which_rotation', 'quaternion'))
    r_dim = {'lie': 3, 'quaternion': 4}[which_rotation]
    sk_feature_dim = int(m.get('sk_feature_dim', 0))
    skcfg = SKGSConfig(
        gauss=GaussianConfig(capacity=int(m['capacity']),
                             sh_degree=int(m['sh_degree']),
                             lr=float(cfg['train'].get('lr', 1e-3)),
                             **gauss_ac),
        net=net,
        sk_net=SkeletonNetConfig(
            out_dims=(r_dim, 4, 3), width=int(m['net'].get('width', 256)),
            depth=int(m['net'].get('depth', 8)), skips=sk_net_skips,
            p_in_channels=3 + sk_feature_dim,
            compute_dtype=cdt),
        which_rotation=which_rotation,
        sk_feature_dim=sk_feature_dim,
        train_schedule=sched,
        num_superpoints=int(m['num_superpoints']),
        num_knn=int(m['num_knn']),
        hyper_dim=int(m['hyper_dim']),
        LBS_method=m.get('LBS_method', 'W'),
        warp_method=m.get('warp_method', 'LBS'),
        sep_rot=bool(m.get('sep_rot', False)),
        num_frames=int(meta.num_frames),
        canonical_time_id=int(m.get('canonical_time_id', 0)),
        use_canonical_net=bool(m.get('use_canonical_net', True)),
        canonical_replace_steps=tuple(m.get('canonical_replace_steps', ())),
        sk_knn_num=int(m.get('sk_knn_num', 6)),
        sk_momentum=float(m.get('sk_momentum', 0.9)),
        joint_update_interval=tuple(m.get('joint_update_interval', (1000, 20000, 40000))),
        joint_init_steps=int(m.get('joint_init_steps', 10000)),
        init_num_times=int(m.get('init_num_times', 16)),
        init_sampling_step=int(m.get('init_sampling_step', 7500)),
        sp_prune_threshold=float(m.get('sp_prune_threshold', 1e-3)),
        sp_split_threshold=float(m.get('sp_split_threshold', 2e-4)),
        sp_merge_threshold=float(m.get('sp_merge_threshold', 5e-4)),
        guided_step_start=int(m.get('guided_step_start', 40000)),
        test_time_interpolate=bool(m.get('test_time_interpolate', False)),
        # lr knobs (get_params parity, sk_gs.py:360-362,582-616)
        lr_deform_scale=float(m.get('lr_deform_scale', 1.0)),
        lr_feature_scale=float(m.get('lr_feature_scale', 2.5)),
        lr_deform_max_steps=int(m.get('lr_deform_max_steps', 40000)),
        lr_joints=float(m.get('lr_joints', 0.1)),
        **sk_ac,
    )
    w, h = image_size
    rcfg = RasterConfig(image_width=w, image_height=h,
                        sh_degree=int(m['sh_degree']),
                        pair_capacity=int(cfg['raster']['pair_capacity']),
                        chunk=int(cfg['raster']['chunk']),
                        tile_h=int(cfg['raster'].get('tile_h', 16)),
                        use_pallas=_use_pallas(cfg))
    return skcfg, rcfg



def device_memory_mb():
    """Peak device memory in MB (TPU equivalent of the reference's
    torch.cuda.max_memory_allocated hook, train.py:152-155). Returns 0
    when the backend doesn't report (CPU)."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return stats.get('peak_bytes_in_use',
                             stats.get('bytes_in_use', 0)) / 2 ** 20
    except Exception:
        pass
    return 0.0


def save_vis_triplet(trainer, vis_dir, step):
    """pred | gt | x5 diff strip for eval view 0 (reference train.py:214-222
    periodic vis images)."""
    from pathlib import Path
    try:
        from PIL import Image
    except ImportError:
        return
    scene = trainer.eval_scene or trainer.scene
    stage = trainer.cfg.stage_at(max(step, 1))
    img = np.asarray(trainer.render_view(scene, 0, stage))
    gt = np.asarray(scene.images[0])
    if gt.shape[-1] == 4:
        gt = gt[..., :3] * gt[..., 3:4] + np.asarray(trainer._bg) \
            * (1.0 - gt[..., 3:4])
    diff = np.clip(np.abs(img - gt) * 5.0, 0, 1)
    strip = np.concatenate([np.clip(img, 0, 1), gt, diff], axis=1)
    Path(vis_dir).mkdir(parents=True, exist_ok=True)
    Image.fromarray((strip * 255).astype(np.uint8)).save(
        Path(vis_dir) / f'step_{step:07d}.png')


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', required=True)
    parser.add_argument('--set', nargs='*', default=[], dest='overrides')
    parser.add_argument('--steps', type=int, default=None,
                        help='override total steps (truncate schedule)')
    parser.add_argument('--resume', type=str, default=None)
    parser.add_argument('--scene', default=None,
                        help='shortcut for --set dataset.scene=... '
                             '(reference train.py --scene parity)')
    parser.add_argument('--profile', type=int, default=0,
                        help='capture a jax.profiler trace for N steps '
                             '(starting after the first eval warmup)')
    args = parser.parse_args(argv)
    if getattr(args, 'scene', None):
        args.overrides = list(args.overrides) + [f'dataset.scene={args.scene}']

    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent / '.jax_cache'))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    # multi-host: one process per host, coordinator from env (RANK/WORLD_SIZE/
    # MASTER_ADDR or JAX_* equivalents) — env:// parity with the reference's
    # my_ext/distributed.py:50-76. No-op for single-process runs.
    from sk_gs_tpu.parallel import init_distributed
    dist = init_distributed()
    if dist['process_count'] > 1:
        logging.info('multi-host: process %d/%d, %d local / %d global devices',
                     dist['process_index'], dist['process_count'],
                     dist['local_device_count'], dist['device_count'])

    from sk_gs_tpu.framework.config import make_config, save_config
    from sk_gs_tpu.framework.checkpoint import CheckpointManager
    from sk_gs_tpu.framework.trainer import SKGSTrainer
    from sk_gs_tpu.models import sk_gs
    from sk_gs_tpu.models.gaussian_splatting import init_from_pcd
    from sk_gs_tpu.models.losses import LossWeights

    cfg = make_config(args.config, args.overrides)
    out_dir = Path(cfg.get('output_dir', 'results')) / cfg.get('exp_name', 'run')
    out_dir.mkdir(parents=True, exist_ok=True)
    save_config(cfg, out_dir / 'config.yaml')

    scene, meta, eval_scene, ds_pcd = build_scene(cfg)
    skcfg, rcfg = build_model_cfg(cfg, meta, scene.image_size)

    # point-cloud seeding priority (reference train.py:52-85): explicit
    # init_ply > dataset point cloud (colmap points3D) > random in bounds
    init_ply = cfg['train'].get('init_ply') or cfg['dataset'].get('init_ply')
    if init_ply:
        from sk_gs_tpu.utils.ply import load_point_ply
        pts, cols = load_point_ply(init_ply)
        logging.info('init point cloud from %s (%d points)', init_ply,
                     len(pts))
    elif ds_pcd is not None:
        pts, cols = ds_pcd
        logging.info('init point cloud from dataset (%d points)', len(pts))
    else:
        rng = np.random.default_rng(int(cfg['train'].get('seed', 0)))
        n0 = int(cfg['train'].get('num_init_points', 2000))
        pts = rng.uniform(-1.3, 1.3, size=(n0, 3)).astype(np.float32)
        cols = rng.uniform(size=(n0, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, skcfg.gauss)
    model = sk_gs.init_model(jax.random.PRNGKey(int(cfg['train'].get('seed', 0))),
                             skcfg, base, np.asarray(meta.train_times))

    # sampler from config (make_sampler registry; reference data_loader
    # batch-sampler selection, ti_batch_sampler.py:12)
    from sk_gs_tpu.data.sampler import make_sampler
    samp_cfg = cfg['train'].get('sampler', 'uniform')
    if isinstance(samp_cfg, str):
        samp_kind, samp_kw = samp_cfg, {}
    else:
        samp_kw = dict(samp_cfg)
        samp_kind = samp_kw.pop('kind', 'uniform')
    canonical_ids = np.flatnonzero(
        np.asarray(scene.time_ids) == skcfg.canonical_time_id)
    sampler = make_sampler(samp_kind, scene.num_views,
                           times=np.asarray(scene.times),
                           canonical_ids=canonical_ids,
                           total_steps=skcfg.total_steps,
                           seed=int(cfg['train'].get('seed', 0)), **samp_kw)

    # multi-chip: `parallel: {n_view: V, n_gs: G}` builds a (view, gs) mesh
    # over V*G devices; the trainer step shards views data-parallel and the
    # per-Gaussian work + rasterizer over 'gs' (framework/trainer.py _core)
    mesh = None
    par_cfg = cfg['train'].get('parallel') or {}
    n_view = int(par_cfg.get('n_view', 1))
    n_gs = int(par_cfg.get('n_gs', 1))
    if n_view * n_gs > 1:
        from sk_gs_tpu.parallel import make_mesh
        mesh = make_mesh(n_view=n_view, n_gs=n_gs)
        logging.info('multi-chip mesh: view=%d x gs=%d over %d devices',
                     n_view, n_gs, n_view * n_gs)

    trainer = SKGSTrainer(skcfg, rcfg, scene, meta, model,
                          loss_weights=LossWeights(cfg.get('loss', {})),
                          eval_scene=eval_scene, pcd=(pts, cols),
                          sampler=sampler,
                          seed=int(cfg['train'].get('seed', 0)),
                          clip_norm=float(cfg['train'].get('clip_norm', 0.0)),
                          batch_views=int(cfg['train'].get('batch_views', 1)),
                          optimizer=cfg['train'].get('optimizer', 'adam'),
                          mesh=mesh,
                          capacity_buckets=bool(
                              cfg['train'].get('capacity_buckets', False)),
                          capacity_check_interval=int(
                              cfg['train'].get('capacity_check_interval',
                                               500)))
    ckpt = CheckpointManager(out_dir / 'checkpoints',
                             interval=int(cfg['train'].get('checkpoint_interval', 5000)))
    trainer.snapshot_fn = lambda name: ckpt.save(
        trainer.ckpt_state(), trainer.state.step, force=True, name=name,
        manage=False)
    total = args.steps or skcfg.total_steps
    eval_interval = int(cfg['train'].get('eval_interval', 5000))
    log_interval = int(cfg['train'].get('log_interval', 100))

    start = 1
    best = -1.0
    if args.resume:
        loaded = ckpt.load(trainer.ckpt_state(), args.resume)
        start = int(loaded['meta']['step']) + 1
        trainer.restore(loaded['state'], start - 1)
        best = trainer.state.best_psnr
        logging.info('resumed from step %d (stage %s, sk_init=%s)',
                     start - 1, skcfg.stage_at(max(start - 1, 1)),
                     trainer.state.skeleton_initialized)

    t0 = time.time()
    metrics_log = (out_dir / 'metrics.jsonl').open('a')
    vis_interval = int(cfg['train'].get('vis_interval', 0))
    # dispatch-queue depth control: keep a BOUNDED pipeline by blocking on
    # the step `depth` dispatches behind (never draining). Measured on the
    # axon tunnel (tools/host_overhead.py): unbounded async sustains
    # 21.8 ms/step over short horizons but the round-4 production run
    # degraded to ~104 ms/step over thousands of queued steps; a full
    # per-step sync costs ~+30 ms. depth 0 = classic unbounded async.
    from collections import deque
    sync_depth = int(cfg['train'].get('dispatch_sync_depth', 8))
    _pending = deque()
    _win_t0, _win_step = time.time(), start - 1
    # jax.profiler window (TPU equivalent of the reference's manual
    # TimeWatcher phase timing, my_ext/utils/time_estimator.py:70)
    prof_start = start + 20 if args.profile else -1
    prof_end = prof_start + args.profile
    for step in range(start, total + 1):
        if step == prof_start:
            jax.profiler.start_trace(str(out_dir / 'profile'))
            logging.info('profiler trace started (%d steps)', args.profile)
        metrics = trainer.train_step(step)
        if sync_depth:
            _pending.append(metrics['loss'])
            if len(_pending) > sync_depth:
                jax.block_until_ready(_pending.popleft())
        if step == prof_end:
            jax.block_until_ready(trainer.state.model.params['xyz'])
            jax.profiler.stop_trace()
            logging.info('profiler trace written to %s', out_dir / 'profile')
        if step % log_interval == 0 or step == total:
            # WINDOWED step rate (time since the last log line): the
            # round-4 artifact logged a cumulative average, which buries
            # steady-state speed under compile/eval pauses from hours ago
            now = time.time()
            dt = (now - _win_t0) / max(step - _win_step, 1)
            _win_t0, _win_step = now, step
            loss_f, psnr_f = float(metrics['loss']), float(metrics['psnr'])
            eta = dt * (total - step)
            logging.info('step %d/%d stage=%s loss=%.4f psnr=%.2f '
                         '(%.0f ms/step, eta %dm%02ds)',
                         step, total, skcfg.stage_at(step), loss_f, psnr_f,
                         dt * 1e3, int(eta // 60), int(eta % 60))
            if not np.isfinite(loss_f):
                # NaN/Inf abort with a crash dump (reference
                # my_ext/framework.py:275-279 loss-check)
                ckpt.save(trainer.ckpt_state(), step,
                          force=True, name='crash.npz', manage=False)
                raise FloatingPointError(
                    f'non-finite loss {loss_f} at step {step} '
                    f'(stage {skcfg.stage_at(step)}); crash.npz saved')
            if float(metrics.get('overflow', 0.0)) > 0:
                logging.warning(
                    'pair capacity overflow at step %d — splats are being '
                    'dropped; raise raster.pair_capacity', step)
                # react at the next step's bucket check, not the next
                # capacity_check_interval boundary (up to 500 steps away)
                trainer._cap_dirty = True
            extra = {k: round(float(v), 6) for k, v in metrics.items()
                     if k in ('n_vis', 'dxyz_max', 'rgb', 'ssim', 'smooth',
                              'sparse', 'c_net', 'cmp_p', 'n_bad_grad')}
            if extra.get('n_bad_grad', 0) > 0:
                logging.warning(
                    'step %d: %d non-finite gradient entries dropped '
                    '(degenerate splat backward?)', step,
                    int(extra['n_bad_grad']))
            metrics_log.write(json.dumps(
                {'step': step, 'stage': skcfg.stage_at(step),
                 'loss': loss_f, 'psnr': psnr_f,
                 'ms_per_step': round(dt * 1e3, 1), **extra}) + '\n')
            metrics_log.flush()
        if vis_interval and (step % vis_interval == 0 or step == total):
            save_vis_triplet(trainer, out_dir / 'vis', step)
        if step % eval_interval == 0 or step == total:
            result = trainer.evaluate()
            mem = device_memory_mb()
            logging.info('eval @%d: PSNR=%.3f SSIM=%.4f%s', step,
                         result['PSNR'], result['SSIM'],
                         f' mem={mem:.0f}MB' if mem else '')
            if result['PSNR'] > best:
                best = result['PSNR']
                trainer.state.best_psnr = best
                ckpt.save(trainer.ckpt_state(), step,
                          force=True, name='best.npz', manage=False)
        ckpt.save(trainer.ckpt_state(), step)

    result = trainer.evaluate(full_metrics=True)
    result['best_PSNR'] = best
    result['train_time_s'] = time.time() - t0
    with (out_dir / 'results.json').open('w') as f:
        json.dump(result, f, indent=2)
    # 3DGS-standard PLY export of the canonical Gaussians
    # (save_ply parity, gaussian_splatting.py:363-380)
    from sk_gs_tpu.utils.ply import save_gaussian_ply
    m = trainer.state.model
    save_gaussian_ply(out_dir / 'last.ply',
                      {k: np.asarray(v) for k, v in m.params.items()
                       if k in ('xyz', 'f_dc', 'f_rest', 'opacity', 'scaling',
                                'rotation')},
                      np.asarray(m.alive))
    ckpt.save(trainer.ckpt_state(), total, force=True, name='last.npz',
              manage=False)
    logging.info('done: %s', result)
    return result


if __name__ == '__main__':
    main()
