"""Watch-It-Move (WIM) dataset loader.

Parity target: ``WatchItMoveDataset`` (/root/reference/datasets/WIM.py:30):
- 20 cameras, per-camera ``cam_{idx:03d}.json`` with ``cam2world``
  (stored transposed), shared pinhole intrinsics (fx == fy), 800x800;
- test cameras {0, 10}; train cameras = the rest;
- frames ``frame_{fid:05d}_cam_{cid:03d}.png`` over ``frame_ranges``;
- times normalized into [0, 1) by the frame range; multi-camera time_ids /
  camera_ids; white background composited from RGBA.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence, Tuple

import numpy as np

from ..ops import transforms as tf
from .base import Scene, SceneMeta, build_scene
from .dnerf import load_image


def load_wim(root: str, scene: str, split: str = 'train',
             downscale: int = 1, background: str = 'white',
             test_cameras: Sequence[int] = (0, 10),
             frame_ranges: Tuple[int, int] = (0, 50),
             coord_src: str = 'opengl', coord_dst: str = 'colmap',
             near: float = 0.01, far: float = 100.0) -> Tuple[Scene, SceneMeta]:
    import jax.numpy as jnp

    scene_root = Path(root) / scene
    camera_indices = [i for i in range(20)
                      if (i not in test_cameras) == (split == 'train')]

    Tv2w_list, intr = [], None
    size = None
    for cam_idx in camera_indices:
        with (scene_root / f'cam_{cam_idx:03d}.json').open() as f:
            info = json.load(f)['camera_data']
        Tv2w_list.append(np.asarray(info['cam2world'], np.float32).T)
        size = (info['width'], info['height'])
        k = info['intrinsics']
        intr = (k['cx'], k['cy'], k['fx'], k['fy'])
    focal = intr[2]
    fovx = float(tf.focal_to_fov(focal, size[0]))
    Tv2w_cams = np.stack(Tv2w_list)
    Tv2w_cams = np.asarray(tf.convert_coord_system(
        jnp.asarray(Tv2w_cams), coord_src, coord_dst, inverse=True))

    frames = list(range(*frame_ranges))
    n_frames = len(frames)
    images, Tv2w, times, time_ids, camera_ids = [], [], [], [], []
    for i, fid in enumerate(frames):
        for k, cid in enumerate(camera_indices):
            img = load_image(scene_root / f'frame_{fid:05d}_cam_{cid:03d}.png',
                             downscale)
            images.append(img)
            Tv2w.append(Tv2w_cams[k])
            times.append((fid - frame_ranges[0])
                         / (frame_ranges[1] - frame_ranges[0]))
            time_ids.append(i)
            camera_ids.append(k)

    meta = SceneMeta(background_type=background, near=near, far=far,
                     scene=scene)
    return build_scene(np.stack(images), np.stack(Tv2w), fovx,
                       np.asarray(times, np.float32), meta,
                       camera_ids=np.asarray(camera_ids, np.int32),
                       time_ids=np.asarray(time_ids, np.int32))
