#!/usr/bin/env python
"""Offline repose renderer — the headless equivalent of the reference's
interactive GUI (gui.py: camera orbit, time animation, per-joint pose
editing via ``sk_r_delta``, sk_gs.py:1087-1088).

    python render_repose.py -c <config.yaml> --load <ckpt.npz> \
        --out frames/ --num-frames 60 [--orbit] [--time-sweep] \
        [--pose-json poses.json]

pose-json: {"joint_deltas": [[wx,wy,wz], ...]}  (so3 log per joint) or a
list of such keyframes, interpolated over the output frames.
"""
import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', required=True)
    parser.add_argument('--load', required=True)
    parser.add_argument('--out', default='repose_frames')
    parser.add_argument('--num-frames', type=int, default=60)
    parser.add_argument('--orbit', action='store_true',
                        help='orbit the camera around the scene')
    parser.add_argument('--time-sweep', action='store_true',
                        help='animate t over [0, 1]')
    parser.add_argument('--pose-json', default=None)
    parser.add_argument('--set', nargs='*', default=[], dest='overrides')
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from sk_gs_tpu.framework.config import make_config
    from sk_gs_tpu.framework.checkpoint import load_into_pytree
    from sk_gs_tpu.models import sk_gs
    from sk_gs_tpu.models.gaussian_splatting import (gaussian_inputs,
                                                     init_from_pcd)
    from sk_gs_tpu.models.sk_gs import forward_deltas
    from sk_gs_tpu.ops import transforms as tf
    from sk_gs_tpu.render import (ViewParams, composite_background, render)
    from train import build_model_cfg, build_scene

    cfg = make_config(args.config, args.overrides)
    scene, meta, _, _pcd = build_scene(cfg)
    skcfg, rcfg = build_model_cfg(cfg, meta, scene.image_size)

    rng = np.random.default_rng(int(cfg['train'].get('seed', 0)))
    n0 = int(cfg['train'].get('num_init_points', 2000))
    pts = rng.uniform(-1.3, 1.3, size=(n0, 3)).astype(np.float32)
    cols = rng.uniform(size=(n0, 3)).astype(np.float32)
    base = init_from_pcd(pts, cols, skcfg.gauss)
    model = sk_gs.init_model(jax.random.PRNGKey(0), skcfg, base,
                             np.asarray(meta.train_times))
    loaded = load_into_pytree({'state': {'model': model, 'opt': None},
                               'meta': {'step': 0}}, args.load)
    model = loaded['state']['model']

    poses = None
    if args.pose_json:
        with open(args.pose_json) as f:
            pj = json.load(f)
        key = pj['joint_deltas'] if isinstance(pj, dict) else [
            k['joint_deltas'] if isinstance(k, dict) else k for k in pj]
        poses = np.asarray(key, np.float32)
        if poses.ndim == 2:
            poses = poses[None]  # single keyframe

    m = skcfg.num_superpoints

    @jax.jit
    def render_frame(model, view: ViewParams, t, sk_r_delta):
        out_def = forward_deltas(skcfg, model, t, 'sk', sk_r_delta=sk_r_delta,
                                 training=False)
        g = gaussian_inputs(model.gauss_view(), skcfg.gauss,
                            d_xyz=out_def.d_xyz,
                            d_rotation=out_def.d_rotation,
                            d_scaling=out_def.d_scaling)
        out = render(g, view, rcfg, active_sh_degree=model.active_sh_degree)
        return composite_background(out['images'], out['opacity'],
                                    jnp.ones(3))

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    base_view = scene.view(0)
    campos0 = np.asarray(scene.campos[0])
    radius = float(np.linalg.norm(campos0))

    for i in range(args.num_frames):
        frac = i / max(args.num_frames - 1, 1)
        t = jnp.asarray(frac if args.time_sweep else 0.0)
        if args.orbit:
            ang = 2 * np.pi * frac
            eye = jnp.asarray([radius * np.sin(ang), campos0[1],
                               -radius * np.cos(ang)], jnp.float32)
            Tw2v = tf.look_at(eye, jnp.zeros(3), jnp.asarray([0.0, -1.0, 0.0]),
                              coord='opencv')
            view = base_view._replace(Tw2v=Tw2v, campos=eye)
        else:
            view = base_view
        if poses is not None:
            kf = frac * (len(poses) - 1)
            k0 = int(np.floor(kf))
            k1 = min(k0 + 1, len(poses) - 1)
            w = kf - k0
            delta = (1 - w) * poses[k0] + w * poses[k1]
            delta = jnp.asarray(np.resize(delta, (m, 3)))
        else:
            delta = jnp.zeros((m, 3))
        img = np.asarray(render_frame(model, view, t, delta))
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            out_dir / f'frame_{i:04d}.png')
    logging.info('wrote %d frames to %s', args.num_frames, out_dir)


if __name__ == '__main__':
    main()
