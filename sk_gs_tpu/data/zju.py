"""ZJU-MoCap dataset loader (annots.npy multi-camera real capture).

Parity target: ``ZJUMoCapDataset`` (/root/reference/datasets/ZJU_MoCAP.py:38):
- ``CoreView_{scene}/annots.npy``: per-camera K/R/T (translation scaled by
  1e-3 into meters) + per-frame image lists;
- train cameras {0, 6, 12, 19}, remaining cameras for test;
- masked images (mask dir) composited onto the background;
- shared fovy from mean focal; per-camera extrinsics, single intrinsic
  perspective (n=0.01) as the reference builds.
"""
from __future__ import annotations

from pathlib import Path
from typing import Sequence, Tuple

import numpy as np

from ..ops import transforms as tf
from .base import Scene, SceneMeta, build_scene
from .dnerf import load_image


def load_zju(root: str, scene: str = '377', split: str = 'train',
             num_max_frames: int = 300, downscale: int = 1,
             background: str = 'white',
             train_camera_ids: Sequence[int] = (0, 6, 12, 19),
             mask_dir: str = 'mask',
             coord_src: str = 'opengl', coord_dst: str = 'colmap',
             near: float = 0.01, far: float = 100.0
             ) -> Tuple[Scene, SceneMeta]:
    import jax.numpy as jnp

    scene_root = Path(root) / f'CoreView_{scene}'
    annots = np.load(scene_root / 'annots.npy', allow_pickle=True).item()
    cams = annots['cams']
    K = np.asarray(cams['K'], np.float32)
    R = np.asarray(cams['R'], np.float32)
    T = np.asarray(cams['T'], np.float32)
    num_cameras = len(K)
    coord_scale = 1e-3
    Tw2v = np.zeros((num_cameras, 4, 4), np.float32)
    Tw2v[:, :3, :3] = R
    Tw2v[:, :3, 3:] = T * coord_scale
    Tw2v[:, 3, 3] = 1

    image_infos = annots['ims']
    n_frames = len(image_infos) if num_max_frames < 0 else \
        min(len(image_infos), num_max_frames)

    paths, time_ids, camera_ids = [], [], []
    for fid in range(n_frames):
        for cid, ip in enumerate(image_infos[fid]['ims']):
            if (split == 'train') == (cid in train_camera_ids):
                paths.append(ip)
                time_ids.append(fid)
                camera_ids.append(cid)

    images = []
    for p, cid in zip(paths, camera_ids):
        img = load_image(scene_root / p, downscale)[..., :3]
        mask_path = scene_root / mask_dir / (Path(p).with_suffix('.png').name)
        if mask_path.exists():
            m = load_image(mask_path, downscale)
            if m.ndim == 3:
                m = m[..., 0]
            img = np.concatenate([img, m[..., None]], axis=-1)
        images.append(img)
    images = np.stack(images)

    focal = float(K[:, 0, 0].mean()) / downscale
    h, w = images.shape[1:3]
    fovx = float(tf.focal_to_fov(focal, w))
    Tw2v_sel = np.asarray(tf.convert_coord_system(
        jnp.asarray(Tw2v), coord_src, coord_dst))
    Tv2w_per_image = np.linalg.inv(Tw2v_sel)[np.asarray(camera_ids)]

    times = np.asarray(time_ids, np.float32) / n_frames
    meta = SceneMeta(background_type=background, near=near, far=far,
                     scene=scene)
    return build_scene(images, Tv2w_per_image, fovx, times, meta,
                       camera_ids=np.asarray(camera_ids, np.int32),
                       time_ids=np.asarray(time_ids, np.int32))
