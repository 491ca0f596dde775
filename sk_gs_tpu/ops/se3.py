"""Pure-JAX SO3 / SE3 Lie-group ops (the lietorch equivalent).

The reference model leans on the external CUDA ``lietorch`` package
(/root/reference/networks/sk_gs.py:12 and ~60 call sites) for SE3/SO3 algebra
with hand-written backwards (/root/reference/my_ext/_C/src/ops_3d/lie_torch.cpp).
Here everything is quaternion-based pure JAX; autodiff supplies gradients.

Layouts (parity with lietorch):
    SO3 "vec": quaternion (x, y, z, w), shape [..., 4].
    SE3 "vec": (tx, ty, tz, qx, qy, qz, qw), shape [..., 7].
    SO3 tangent: rotation vector phi, shape [..., 3].
    SE3 tangent: (tau, phi) translation-first, shape [..., 6].
"""
from __future__ import annotations

import jax.numpy as jnp

from . import quaternion as quat

_EPS = 1e-8


# ---------------------------------------------------------------- SO3

def so3_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    return quat.identity(shape, dtype)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector [..., 3] -> unit quaternion (x,y,z,w).

    Taylor-guarded at theta ~ 0 so it is differentiable everywhere.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    half = 0.5 * theta
    small = theta_sq < _EPS
    # sin(theta/2)/theta: series 1/2 - theta^2/48 near 0
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([phi * k, w], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation vector [..., 3]."""
    q = quat.standardize(quat.normalize(q))
    u = q[..., :3]
    w = q[..., 3:4]
    # sqrt(sumsq + eps^2): finite BACKWARD at u == 0 (identity rotation) —
    # plain norm's grad there is 0/0. Exact-identity inputs occur on TPU
    # (flush-to-zero + bf16 matmul rounding upstream) where CPU f32 doesn't.
    norm_u = jnp.sqrt(jnp.sum(jnp.square(u), axis=-1, keepdims=True)
                      + _EPS * _EPS)
    theta = 2.0 * jnp.arctan2(norm_u, w)
    # No Taylor branch needed: norm_u >= _EPS by construction, and the eps
    # inflation cancels in theta/norm_u (theta -> 2*atan2(eps, 1) ~ 2*eps at
    # the identity, so theta/norm_u -> 2 exactly where the series would).
    return u * (theta / norm_u)


def so3_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    return quat.multiply(q1, q2)


def so3_inv(q: jnp.ndarray) -> jnp.ndarray:
    return quat.conjugate(q)


def so3_act(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat.apply(q, v)


def so3_matrix(q: jnp.ndarray) -> jnp.ndarray:
    return quat.to_matrix(q)


# ---------------------------------------------------------------- SE3

def se3_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    t = jnp.zeros((*shape, 3), dtype=dtype)
    return jnp.concatenate([t, quat.identity(shape, dtype)], axis=-1)


def se3_from_t_q(t: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([t, q], axis=-1)


def se3_t(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3]


def se3_q(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., 3:7]


def se3_mul(T1: jnp.ndarray, T2: jnp.ndarray) -> jnp.ndarray:
    """Compose: (T1 * T2)(x) = T1(T2(x))."""
    t1, q1 = T1[..., :3], T1[..., 3:7]
    t2, q2 = T2[..., :3], T2[..., 3:7]
    return jnp.concatenate([t1 + quat.apply(q1, t2), quat.multiply(q1, q2)], axis=-1)


def se3_inv(T: jnp.ndarray) -> jnp.ndarray:
    t, q = T[..., :3], T[..., 3:7]
    q_inv = quat.conjugate(q)
    return jnp.concatenate([-quat.apply(q_inv, t), q_inv], axis=-1)


def se3_act(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply SE3 transform(s) to point(s) [..., 3]."""
    return quat.apply(T[..., 3:7], p) + T[..., :3]


def _so3_left_jacobian_terms(phi: jnp.ndarray):
    """Coefficients (A, B) with V = I + A [phi]x + B [phi]x^2."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < _EPS
    A = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta_sq, _EPS))
    B = jnp.where(
        small, 1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta_sq * theta, _EPS),
    )
    return A, B


def _cross_mat_apply(phi: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(phi, v)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Tangent (tau, phi) [..., 6] -> SE3 vec [..., 7].

    t = V(phi) tau with V the SO3 left Jacobian (lietorch convention:
    translation components first).
    """
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    A, B = _so3_left_jacobian_terms(phi)
    c1 = _cross_mat_apply(phi, tau)
    c2 = _cross_mat_apply(phi, c1)
    t = tau + A * c1 + B * c2
    return jnp.concatenate([t, q], axis=-1)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """SE3 vec [..., 7] -> tangent (tau, phi) [..., 6] with tau = V^-1 t."""
    t, q = T[..., :3], T[..., 3:7]
    phi = so3_log(q)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < _EPS
    half = 0.5 * theta
    # V^-1 = I - 1/2 [phi]x + C [phi]x^2,  C = (1 - theta/2 * cot(theta/2)) / theta^2
    cot_term = half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)
    C = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0, (1.0 - cot_term) / jnp.maximum(theta_sq, _EPS))
    c1 = _cross_mat_apply(phi, t)
    c2 = _cross_mat_apply(phi, c1)
    tau = t - 0.5 * c1 + C * c2
    return jnp.concatenate([tau, phi], axis=-1)


def se3_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """SE3 vec -> homogeneous matrix [..., 4, 4]."""
    t, q = T[..., :3], T[..., 3:7]
    R = quat.to_matrix(q)
    M = jnp.zeros((*T.shape[:-1], 4, 4), dtype=T.dtype)
    M = M.at[..., :3, :3].set(R)
    M = M.at[..., :3, 3].set(t)
    M = M.at[..., 3, 3].set(1.0)
    return M


def se3_from_matrix(M: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous matrix [..., 4, 4] -> SE3 vec [..., 7].

    Parity with the reference's ``ops_3d.rigid.Rt_to_quaternion``
    (/root/reference/my_ext/ops_3d/rigid.py:196).
    """
    q = quat.from_matrix(M[..., :3, :3])
    t = M[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)


def se3_interpolate(T1: jnp.ndarray, T2: jnp.ndarray, alpha) -> jnp.ndarray:
    """Linear translation + slerp rotation blend (test-time frame interp,
    parity with /root/reference/networks/sk_gs.py:1080-1085)."""
    alpha = jnp.asarray(alpha)
    t = (1.0 - alpha[..., None]) * T1[..., :3] + alpha[..., None] * T2[..., :3]
    q = quat.slerp(T1[..., 3:7], T2[..., 3:7], alpha)
    return jnp.concatenate([t, q], axis=-1)
