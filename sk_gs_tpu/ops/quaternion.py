"""Quaternion math in the (x, y, z, w) layout.

The whole framework uses the (x, y, z, w) quaternion convention with identity
``[0, 0, 0, 1]`` (parity with the reference repo, which follows lietorch:
see /root/reference/my_ext/ops_3d/quaternion.py:163-174 and the identity bias
at /root/reference/networks/sk_gs.py:835,847).

All functions are pure-JAX, broadcast over leading dims, and fully
differentiable (XLA autodiff replaces the reference's hand-written CUDA
backward at /root/reference/my_ext/_C/src/ops_3d/quaternion.cu).
"""
from __future__ import annotations

import jax.numpy as jnp


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """Identity quaternion(s) [0, 0, 0, 1] with given leading shape."""
    q = jnp.zeros((*shape, 4), dtype=dtype)
    return q.at[..., 3].set(1.0)


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Safe-normalize quaternions to unit length.

    GRADIENT-safe at q == 0 too: ``jnp.linalg.norm`` backward divides by the
    norm (NaN at exactly 0). An exact zero never occurs at f64/f32 CPU
    precision but DOES on TPU (flush-to-zero denormals + bf16-rounded
    upstream matmuls) — one such row NaN-poisoned an entire sk-distill run."""
    n = jnp.sqrt(jnp.sum(jnp.square(q), axis=-1, keepdims=True) + eps * eps)
    return q / n


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """(x,y,z,w) -> (-x,-y,-z,w)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a unit quaternion (== conjugate)."""
    return conjugate(normalize(q))


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2 in (x,y,z,w) layout.

    Rotating by ``multiply(q1, q2)`` equals rotating first by q2 then by q1,
    i.e. ``to_matrix(multiply(q1,q2)) == to_matrix(q1) @ to_matrix(q2)``.
    """
    x1, y1, z1, w1 = jnp.split(q1, 4, axis=-1)
    x2, y2, z2, w2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def to_matrix(q: jnp.ndarray, pre_normalize: bool = True) -> jnp.ndarray:
    """Quaternion (x,y,z,w) -> rotation matrix [..., 3, 3], v' = R @ v.

    Matches the reference ``ops_3d.quaternion.toR``
    (/root/reference/my_ext/ops_3d/quaternion.py:163-174) and the rasterizer's
    ``computeCov3D`` rotation
    (/root/reference/my_ext/_C/src/nerf/gaussian_preprocess_colmap.cu:136-138).
    """
    if pre_normalize:
        q = normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    R = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return R.reshape(*q.shape[:-1], 3, 3)


def from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> quaternion (x,y,z,w).

    Branch-free Shepperd's method via jnp.where over the four candidate
    pivots (stable for all rotations; differentiable a.e.).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # candidate 0: trace pivot
    s0 = _safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, 0.25 * s0], -1)
    # candidate 1: m00 pivot
    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], -1)
    # candidate 2: m11 pivot
    s2 = _safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2, (m02 - m20) / s2], -1)
    # candidate 3: m22 pivot
    s3 = _safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3, (m10 - m01) / s3], -1)

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return normalize(q)


def apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4] without
    materializing the rotation matrix: v' = v + 2*w*(u x v) + 2*(u x (u x v))."""
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis [..., 3] + angle [...] -> quaternion (x,y,z,w)."""
    half = 0.5 * jnp.asarray(angle)[..., None]
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def to_axis_angle(q: jnp.ndarray, eps: float = 1e-9):
    """Quaternion -> (unit axis [...,3], angle [...])."""
    q = normalize(q)
    # grad-safe at the identity (see normalize): plain norm NaNs backward
    sin_half = jnp.sqrt(jnp.sum(jnp.square(q[..., :3]), axis=-1) + eps * eps)
    angle = 2.0 * jnp.arctan2(sin_half, q[..., 3])
    axis = q[..., :3] / jnp.maximum(sin_half, eps)[..., None]
    return axis, angle


def standardize(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the scalar (w) part is non-negative."""
    return jnp.where(q[..., 3:4] < 0, -q, q)


def slerp(q1: jnp.ndarray, q2: jnp.ndarray, t, eps: float = 1e-7) -> jnp.ndarray:
    """Spherical interpolation between unit quaternions, t in [0, 1]."""
    t = jnp.asarray(t)[..., None]
    q1 = normalize(q1)
    q2 = normalize(q2)
    dot = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q2 = jnp.where(dot < 0, -q2, q2)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < eps
    w1 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, eps))
    w2 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, eps))
    return normalize(w1 * q1 + w2 * q2)
