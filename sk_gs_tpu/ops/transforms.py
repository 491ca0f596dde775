"""Camera / coordinate-system transforms.

Parity targets: /root/reference/my_ext/ops_3d/coord_trans.py (conversion
matrices, :64-99; convert_coord_system :112-134), coord_trans_opencv.py
(perspective :203-240, perspective2 :242-300) and coord_trans_opengl.py.

Unlike the reference there is NO global mutable coordinate-system state; the
convention is plumbed explicitly (datasets convert at load time, the renderer
takes an ``is_opengl`` flag).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

# canonical names: 'colmap' is an alias for 'opencv'
# (/root/reference/my_ext/ops_3d/coord_trans.py:56-63)
COORDINATE_ALIASES = {
    'opengl': 'opengl', 'blender': 'blender', 'colmap': 'opencv',
    'opencv': 'opencv', 'llff': 'llff', 'pytorch3d': 'pytorch3d',
}

_CONVERT_MATRIX = {
    'opengl': {
        'blender': [[1., 0, 0, 0], [0, 0, -1., 0], [0, 1., 0, 0], [0, 0, 0, 1.]],
        'opencv': [[1., 0, 0, 0], [0, -1., 0, 0], [0, 0, -1., 0], [0, 0, 0, 1.]],
        'llff': [[0, -1., 0, 0], [1., 0, 0, 0], [0, 0, 1., 0], [0, 0, 0, 1.]],
        'pytorch3d': [[0, 0, -1., 0], [0, 1., 0, 0], [1., 0, 0, 0], [0, 0, 0, 1.]],
    },
    'blender': {
        'opengl': [[1., 0, 0, 0], [0, 0, 1., 0], [0, -1., 0, 0], [0, 0, 0, 1.]],
        'opencv': [[1., 0, 0, 0], [0, 0, -1., 0], [0, 1., 0, 0], [0, 0, 0, 1.]],
    },
    'opencv': {
        'opengl': [[1., 0, 0, 0], [0, -1., 0, 0], [0, 0, -1., 0], [0, 0, 0, 1.]],
        'blender': [[1., 0, 0, 0], [0, 0, 1., 0], [0, -1., 0, 0], [0, 0, 0, 1.]],
    },
}


def _canon(name: str) -> str:
    return COORDINATE_ALIASES[name.lower()]


def convert_coord_system(T, src: str = 'opengl', dst: str = 'opengl', inverse: bool = False):
    """Convert a camera matrix (Tw2v, or Tv2w with inverse=True) between
    coordinate conventions. Matches reference semantics including the
    left/right-hand special case for opencv
    (/root/reference/my_ext/ops_3d/coord_trans.py:112-134)."""
    src, dst = _canon(src), _canon(dst)
    if src == dst:
        return T
    M = jnp.asarray(_CONVERT_MATRIX[src][dst] if inverse else _CONVERT_MATRIX[dst][src],
                    dtype=T.dtype)
    if dst == 'opencv' or src == 'opencv':
        return T @ M if inverse else M @ T
    return M @ T if inverse else T @ M


def fov_to_focal(fov, size):
    return size / (2.0 * np.tan(fov * 0.5)) if not isinstance(fov, jnp.ndarray) \
        else size / (2.0 * jnp.tan(fov * 0.5))


def focal_to_fov(focal, size):
    return 2.0 * np.arctan2(size, 2.0 * focal) if not isinstance(focal, jnp.ndarray) \
        else 2.0 * jnp.arctan2(size, 2.0 * focal)


def fovx_to_fovy(fovx, aspect):
    """aspect = W / H (reference ops_3d.fovx_to_fovy)."""
    return 2.0 * math.atan(math.tan(fovx * 0.5) / aspect)


def camera_intrinsics(focal, size: Tuple[int, int], cx_cy=None, inv: bool = False,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-space intrinsics K (Tv2s) or its inverse.

    focal: scalar or (fx, fy). size: (W, H).
    """
    W, H = size
    focal = jnp.asarray(focal, dtype=dtype)
    fx = focal[..., 0] if focal.ndim > 0 and focal.shape[-1] == 2 else focal
    fy = focal[..., 1] if focal.ndim > 0 and focal.shape[-1] == 2 else focal
    if cx_cy is None:
        cx, cy = W / 2.0, H / 2.0
    else:
        cx, cy = cx_cy
    K = jnp.zeros((*jnp.shape(fx), 3, 3), dtype=dtype)
    if inv:
        K = K.at[..., 0, 0].set(1.0 / fx)
        K = K.at[..., 1, 1].set(1.0 / fy)
        K = K.at[..., 0, 2].set(-cx / fx)
        K = K.at[..., 1, 2].set(-cy / fy)
    else:
        K = K.at[..., 0, 0].set(fx)
        K = K.at[..., 1, 1].set(fy)
        K = K.at[..., 0, 2].set(cx)
        K = K.at[..., 1, 2].set(cy)
    K = K.at[..., 2, 2].set(1.0)
    return K


def perspective_opencv(fovy, aspect: float = 1.0, n: float = 0.1, f: float = 1000.0,
                       size: Optional[Tuple[int, int]] = None, dtype=jnp.float32) -> jnp.ndarray:
    """OpenCV-convention clip-space projection Tv2c (z forward, y down).

    Parity: /root/reference/my_ext/ops_3d/coord_trans_opencv.py:203-240.
    """
    if size is not None:
        aspect = size[0] / size[1]
    fovy = jnp.asarray(fovy, dtype=dtype)
    y = jnp.tan(fovy * 0.5)
    x = y * aspect
    P = jnp.zeros((*fovy.shape, 4, 4), dtype=dtype)
    P = P.at[..., 0, 0].set(1.0 / x)
    P = P.at[..., 1, 1].set(1.0 / y)
    P = P.at[..., 2, 2].set((f + n) / (f - n))
    P = P.at[..., 2, 3].set(-(2.0 * f * n) / (f - n))
    P = P.at[..., 3, 2].set(1.0)
    return P


def perspective_pp(size: Tuple[int, int], fx, fy, cx=None, cy=None,
                   n: float = 0.1, f: float = 1000.0,
                   dtype=jnp.float32) -> jnp.ndarray:
    """OpenCV-convention projection from raw intrinsics (per-camera focals
    and a possibly off-center principal point).

    Parity: ``ops_3d.perspective2``
    (/root/reference/my_ext/ops_3d/coord_trans_opencv.py:242-296) — the
    projection the pickled ZJU dataset builds per camera
    (/root/reference/datasets/ZJU_MoCAP.py:361-362).
    """
    W, H = size
    fx = jnp.asarray(fx, dtype=dtype)
    fy = jnp.asarray(fy, dtype=dtype)
    cx = jnp.asarray(W / 2 if cx is None else cx, dtype=dtype)
    cy = jnp.asarray(H / 2 if cy is None else cy, dtype=dtype)
    shape = jnp.broadcast_shapes(fx.shape, fy.shape, cx.shape, cy.shape)
    P = jnp.zeros((*shape, 4, 4), dtype=dtype)
    P = P.at[..., 0, 0].set(2.0 * fx / W)
    P = P.at[..., 1, 1].set(2.0 * fy / H)
    P = P.at[..., 0, 2].set((2.0 * cx - W) / W)
    P = P.at[..., 1, 2].set((2.0 * cy - H) / H)
    P = P.at[..., 2, 2].set((f + n) / (f - n))
    P = P.at[..., 2, 3].set(-(2.0 * f * n) / (f - n))
    P = P.at[..., 3, 2].set(1.0)
    return P


def perspective_opengl(fovy, aspect: float = 1.0, n: float = 0.1, f: float = 1000.0,
                       size: Optional[Tuple[int, int]] = None, dtype=jnp.float32) -> jnp.ndarray:
    """OpenGL-convention projection Tv2c (camera looks down -z)."""
    if size is not None:
        aspect = size[0] / size[1]
    fovy = jnp.asarray(fovy, dtype=dtype)
    y = jnp.tan(fovy * 0.5)
    x = y * aspect
    P = jnp.zeros((*fovy.shape, 4, 4), dtype=dtype)
    P = P.at[..., 0, 0].set(1.0 / x)
    P = P.at[..., 1, 1].set(1.0 / y)
    P = P.at[..., 2, 2].set(-(f + n) / (f - n))
    P = P.at[..., 2, 3].set(-(2.0 * f * n) / (f - n))
    P = P.at[..., 3, 2].set(-1.0)
    return P


def perspective(fovy, aspect: float = 1.0, n: float = 0.1, f: float = 1000.0,
                size: Optional[Tuple[int, int]] = None, coord: str = 'opencv',
                dtype=jnp.float32) -> jnp.ndarray:
    if _canon(coord) == 'opencv':
        return perspective_opencv(fovy, aspect, n, f, size, dtype)
    return perspective_opengl(fovy, aspect, n, f, size, dtype)


def look_at(eye: jnp.ndarray, at: jnp.ndarray, up: jnp.ndarray,
            coord: str = 'opengl', inv: bool = False) -> jnp.ndarray:
    """Build Tw2v (or Tv2w with inv=True). opengl: camera looks down -z."""
    eye, at, up = (jnp.asarray(x, dtype=jnp.float32) for x in (eye, at, up))
    fwd = at - eye
    fwd = fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True)
    if _canon(coord) == 'opencv':
        z = fwd
        x = jnp.cross(fwd, up) * -1.0  # right-handed with y down
        x = -jnp.cross(z, up / jnp.linalg.norm(up, axis=-1, keepdims=True))
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        y = jnp.cross(z, x)
    else:
        z = -fwd
        x = jnp.cross(up, z)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        y = jnp.cross(z, x)
    R = jnp.stack([x, y, z], axis=-2)  # rows = camera axes in world coords
    t = -jnp.einsum('...ij,...j->...i', R, eye)
    Tw2v = jnp.zeros((*eye.shape[:-1], 4, 4), dtype=jnp.float32)
    Tw2v = Tw2v.at[..., :3, :3].set(R).at[..., :3, 3].set(t).at[..., 3, 3].set(1.0)
    if inv:
        return jnp.linalg.inv(Tw2v)
    return Tw2v


def get_center_and_diag(cam_centers: Union[jnp.ndarray, np.ndarray]):
    """Scene center + diagonal from camera centers (Inria convention used to
    set ``cameras_extent``, /root/reference/networks/gaussian_splatting.py:197)."""
    cam_centers = np.asarray(cam_centers)
    center = cam_centers.mean(axis=0, keepdims=True)
    dist = np.linalg.norm(cam_centers - center, axis=-1)
    diagonal = float(dist.max())
    return center.reshape(3), diagonal


def transform_points(M: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply homogeneous 4x4 to points [..., 3] (column-vector convention)."""
    return jnp.einsum('...ij,...nj->...ni', M[..., :3, :3], points) + M[..., None, :3, 3]
