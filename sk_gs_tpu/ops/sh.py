"""Real spherical harmonics for view-dependent Gaussian color.

Parity targets: the reference SH eval used inside the rasterizer
(``computeColorFromSH``, /root/reference/my_ext/_C/src/nerf/gaussian_preprocess.cu)
and the python version ``eval_sh``
(/root/reference/networks/encoders/sphere_harmonics.py:130) with
``RGB2SH``/``SH2RGB`` (:188-193).

SH coefficient ordering: [(l=0,m=0), (1,-1), (1,0), (1,1), (2,-2) ...].
"""
from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB in [0,1] -> DC SH coefficient (reference RGB2SH)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """DC SH coefficient -> RGB (reference SH2RGB)."""
    return sh * C0 + 0.5


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH up to degree ``deg`` (static int, 0..3).

    Args:
        sh: coefficients [..., (deg+1)^2, C]
        dirs: unit view directions [..., 3]
    Returns:
        [..., C] color without the +0.5 offset / clamping (those are the
        caller's job, mirroring the rasterizer contract).
    """
    result = C0 * sh[..., 0, :]
    if deg >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1, :] + C1 * z * sh[..., 2, :] - C1 * x * sh[..., 3, :]
        if deg >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + C2[0] * xy * sh[..., 4, :]
                      + C2[1] * yz * sh[..., 5, :]
                      + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                      + C2[3] * xz * sh[..., 7, :]
                      + C2[4] * (xx - yy) * sh[..., 8, :])
            if deg >= 3:
                result = (result
                          + C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                          + C3[1] * xy * z * sh[..., 10, :]
                          + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                          + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                          + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                          + C3[5] * z * (xx - yy) * sh[..., 14, :]
                          + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :])
    return result


def sh_to_color(deg: int, sh: jnp.ndarray, points: jnp.ndarray,
                campos: jnp.ndarray, clamp: bool = True) -> jnp.ndarray:
    """Rasterizer-contract SH -> RGB: normalize view dir, +0.5 offset,
    clamp at 0 (the clamp mask feeds the backward automatically via autodiff;
    the reference saves it explicitly,
    /root/reference/my_ext/_C/src/nerf/gaussian_rasterizer_forward.cu:131-136).

    Degree masking: coefficients above ``deg`` must be zeroed by the caller or
    simply not contribute because eval_sh is truncated statically.
    """
    d = points - campos
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    color = eval_sh(deg, sh, d) + 0.5
    if clamp:
        color = jnp.maximum(color, 0.0)
    return color


def num_sh_bases(deg: int) -> int:
    return (deg + 1) ** 2


def sh_degree_mask(max_deg: int, active_deg: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[ (max_deg+1)^2 ] multiplicative mask enabling bands <= active_deg.

    Lets a single jitted program serve the SH-degree warmup schedule
    (reference bumps active degree every 1000 steps,
    /root/reference/networks/gaussian_splatting.py:324-330) without recompiles.
    """
    n = num_sh_bases(max_deg)
    idx = jnp.arange(n)
    band = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return (band <= active_deg).astype(dtype)
