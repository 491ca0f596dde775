"""Scene container + shared dataset logic.

TPU-native re-design of the reference data layer (/root/reference/datasets/
base.py + data_loader/): instead of per-item torch Datasets with worker
processes, a whole split is one device-resident pytree of arrays (D-NeRF /
WIM scenes fit comfortably in HBM: 100-400 frames x 800^2 x 4 x 4B <= 1.5 GB)
and samplers are jit-safe index streams. Backgrounds follow
NERF_Base_Dataset.get_background semantics (base.py:125-170).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import transforms as tf
from ..render.settings import ViewParams


class Scene(NamedTuple):
    """One split, device-resident."""
    images: jnp.ndarray        # [F, H, W, 3|4] float32 in [0,1] (RGBA kept
                               # for DYNAMIC_BG types, composited in-step)
    Tw2v: jnp.ndarray          # [F, 4, 4]
    Tv2c: jnp.ndarray          # [F, 4, 4]
    campos: jnp.ndarray        # [F, 3]
    tan_fovx: jnp.ndarray      # [F]
    tan_fovy: jnp.ndarray      # [F]
    times: jnp.ndarray         # [F] in [0, 1]
    time_ids: jnp.ndarray      # [F] int32 (frame index within camera 0 set)
    camera_ids: jnp.ndarray    # [F] int32

    @property
    def num_views(self) -> int:
        return self.images.shape[0]

    @property
    def image_size(self) -> Tuple[int, int]:
        return self.images.shape[2], self.images.shape[1]  # (W, H)

    def view(self, i) -> ViewParams:
        return ViewParams(Tw2v=self.Tw2v[i], Tv2c=self.Tv2c[i],
                          campos=self.campos[i], tan_fovx=self.tan_fovx[i],
                          tan_fovy=self.tan_fovy[i])

    def view_tree(self) -> ViewParams:
        """All views as one [F, ...] ViewParams (for in-graph gathers)."""
        return ViewParams(Tw2v=self.Tw2v, Tv2c=self.Tv2c, campos=self.campos,
                          tan_fovx=self.tan_fovx, tan_fovy=self.tan_fovy)


@dataclass
class SceneMeta:
    """Host-side split metadata."""
    background_type: str = 'white'
    background: Optional[np.ndarray] = None   # [3] for solid
    cameras_extent: float = 1.0
    near: float = 0.01
    far: float = 100.0
    num_frames: int = 0          # temporal frames (unique time ids)
    scene: str = ''
    train_times: Optional[np.ndarray] = None  # [num_frames]


# background types composited per-step in-graph (reference resamples them
# per get_image call, base.py:125-170); RGBA is kept in the Scene for these
DYNAMIC_BG = ('random', 'random2', 'reference', 'checker')


def solid_background(background_type: str) -> Optional[np.ndarray]:
    if background_type == 'white':
        return np.ones(3, np.float32)
    if background_type == 'black':
        return np.zeros(3, np.float32)
    if background_type == 'none':
        return None
    if background_type in DYNAMIC_BG:
        return None
    raise NotImplementedError(f"background {background_type}")


def image_checkerboard(h: int, w: int, size: int = 8) -> np.ndarray:
    """[H, W, 3] gray/white checkerboard (utils.image_checkerboard used by
    the 'checker' background, reference base.py:165-166)."""
    yy, xx = np.mgrid[0:h, 0:w]
    cells = ((yy // size + xx // size) % 2).astype(np.float32)
    return np.repeat((0.5 + 0.5 * cells)[..., None], 3, axis=-1)


def sample_background(background_type: str, key, h: int, w: int,
                      checker=None, reference_rgb=None) -> jnp.ndarray:
    """jit-safe per-step background (get_background semantics,
    reference base.py:125-144): 'random' = per-pixel uniform RGB,
    'random2' = one uniform color, 'reference' = the GT RGB itself,
    'checker' = the static checkerboard array."""
    if background_type == 'random':
        return jax.random.uniform(key, (h, w, 3))
    if background_type == 'random2':
        return jnp.broadcast_to(jax.random.uniform(key, (1, 1, 3)), (h, w, 3))
    if background_type == 'reference':
        return reference_rgb
    if background_type == 'checker':
        return checker
    raise NotImplementedError(f"dynamic background {background_type}")


def build_scene(images: np.ndarray, Tv2w: np.ndarray, fovx: float,
                times: np.ndarray, meta: SceneMeta,
                camera_ids: Optional[np.ndarray] = None,
                time_ids: Optional[np.ndarray] = None,
                Tv2c: Optional[np.ndarray] = None,
                tan_fovx: Optional[np.ndarray] = None,
                tan_fovy: Optional[np.ndarray] = None) -> Tuple[Scene, SceneMeta]:
    """Assemble a Scene from camera-to-world matrices + shared fovx.

    images: [F, H, W, 3|4] float32; RGBA gets background-composited here
    (the reference lerps at load, DNerfDataset.py:134-135).
    """
    f, h, w = images.shape[:3]
    aspect = w / h
    fovy = tf.fovx_to_fovy(fovx, aspect)
    Tw2v = np.linalg.inv(Tv2w).astype(np.float32)
    if Tv2c is None:
        Tv2c = np.asarray(tf.perspective_opencv(
            jnp.asarray(fovy, jnp.float32), size=(w, h), n=meta.near, f=meta.far))
        Tv2c = np.tile(Tv2c[None], (f, 1, 1))
    campos = Tv2w[:, :3, 3].astype(np.float32)

    bg = solid_background(meta.background_type)
    dynamic = meta.background_type in DYNAMIC_BG
    if images.shape[-1] == 4 and not dynamic:
        alpha = images[..., 3:4]
        rgb = images[..., :3]
        if bg is not None:
            rgb = rgb * alpha + bg * (1.0 - alpha)
        images = rgb
    if meta.background_type == 'checker':
        meta.background = image_checkerboard(h, w)
    elif not dynamic:
        meta.background = bg

    _, diag = tf.get_center_and_diag(campos)
    meta.cameras_extent = diag * 1.1
    meta.num_frames = int(len(np.unique(times)))
    if camera_ids is None:
        camera_ids = np.zeros(f, np.int32)
    if time_ids is None:
        time_ids = np.arange(f, dtype=np.int32)
    meta.train_times = np.asarray(
        times[camera_ids == camera_ids[0]], np.float32)

    scene = Scene(
        images=jnp.asarray(images, jnp.float32),
        Tw2v=jnp.asarray(Tw2v),
        Tv2c=jnp.asarray(Tv2c, jnp.float32),
        campos=jnp.asarray(campos),
        tan_fovx=(jnp.asarray(tan_fovx, jnp.float32) if tan_fovx is not None
                  else jnp.full((f,), np.tan(fovx * 0.5), jnp.float32)),
        tan_fovy=(jnp.asarray(tan_fovy, jnp.float32) if tan_fovy is not None
                  else jnp.full((f,), np.tan(fovy * 0.5), jnp.float32)),
        times=jnp.asarray(times, jnp.float32),
        time_ids=jnp.asarray(time_ids, jnp.int32),
        camera_ids=jnp.asarray(camera_ids, jnp.int32),
    )
    return scene, meta
