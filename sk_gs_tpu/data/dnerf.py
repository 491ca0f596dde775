"""D-NeRF dataset loader (transforms_{split}.json + PNGs).

Parity target: ``DNeRFDataset`` (/root/reference/datasets/DNerfDataset.py:31):
- camera file transforms_{split}.json with per-frame ``transform_matrix``
  (Tv2w, opengl convention) and ``time`` (default linspace);
- global ``camera_angle_x`` -> fovx; fovy from aspect;
- poses converted opengl -> colmap at load (:109);
- white background composited from RGBA (:134-135);
- near 2.0 / far 6.0 (datasets/base registry entry).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple

import numpy as np

from ..ops import transforms as tf
from .base import Scene, SceneMeta, build_scene


def load_image(path: Path, downscale: float = 1) -> np.ndarray:
    from PIL import Image
    img = Image.open(path)
    if downscale and downscale > 1:
        img = img.resize((round(img.width / downscale),
                          round(img.height / downscale)), Image.BILINEAR)
    arr = np.asarray(img).astype(np.float32) / 255.0
    return arr


def load_dnerf(root: str, scene: str, split: str = 'train',
               downscale: int = 1, background: str = 'white',
               coord_src: str = 'opengl', coord_dst: str = 'colmap',
               near: float = 2.0, far: float = 6.0,
               num_frames_max: int = -1) -> Tuple[Scene, SceneMeta]:
    scene_root = Path(root) / scene
    with (scene_root / f'transforms_{split}.json').open() as f:
        meta_json = json.load(f)

    cams, paths, times = [], [], []
    frames = meta_json['frames']
    for i, frame in enumerate(frames):
        cams.append(np.asarray(frame['transform_matrix'], np.float32))
        paths.append(scene_root / (frame['file_path'] + '.png'))
        times.append(frame.get('time', i / max(len(frames) - 1, 1)))
    if num_frames_max > 0:
        cams, paths, times = (cams[:num_frames_max], paths[:num_frames_max],
                              times[:num_frames_max])
    fovx = float(meta_json['camera_angle_x'])
    Tv2w = np.stack(cams)
    # convert_coord_system(..., inverse=True) applies to Tv2w (DNerfDataset:109)
    import jax.numpy as jnp
    Tv2w = np.asarray(tf.convert_coord_system(
        jnp.asarray(Tv2w), coord_src, coord_dst, inverse=True))

    images = np.stack([load_image(p, downscale) for p in paths])
    meta = SceneMeta(background_type=background, near=near, far=far,
                     scene=scene)
    return build_scene(images, Tv2w, fovx, np.asarray(times, np.float32), meta)
