"""Per-Gaussian preprocessing: project, EWA cov2D, conic, tile rects, SH color.

Vectorized pure JAX — the TPU equivalent of ``preprocessCUDA_colmap``
(/root/reference/my_ext/_C/src/nerf/gaussian_preprocess_colmap.cu:156-224).
The analytic CUDA backward (computeCov2DCUDA_colmap / preprocess backward)
is replaced by XLA autodiff; everything here is elementwise/small-matmul work
that XLA fuses into a handful of kernels.

Math parity notes (all verified against the CUDA source):
- cov3D: Sigma = R S^2 R^T from the (x,y,z,w) quaternion (cu:121-152).
- cov2D: J W Sigma W^T J^T with view-space xy clamped to 1.3*tanfov,
  followed by the +0.3 low-pass on the diagonal (cu:85-116).
- radius: ceil(3 sqrt(max eigenvalue)), eigen discriminant clamped at 0.1
  (cu:200-203); conic = inverse covariance (cu:192-195).
- pixel coords: ndc2Pix(v, S) = ((v+1)*S - 1)/2 (cu:26).
- frustum cull: view z <= 0.2 (cu:73); w-divide guard +1e-7 (cu:176).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..ops import quaternion as quat
from ..ops import sh as sh_ops
from .settings import TILE, GaussianInputs, RasterConfig, ViewParams


class PreprocessOut(NamedTuple):
    means2d: jnp.ndarray       # [N, 2] pixel coordinates
    depths: jnp.ndarray        # [N] view-space z (+inf for culled)
    conic: jnp.ndarray         # [N, 3] inverse 2D covariance (a, b, c)
    colors: jnp.ndarray        # [N, C] RGB (+ extras appended by caller)
    radius: jnp.ndarray        # [N] int32 pixel radius (0 for culled;
    #                            always the reference 3-sigma stat so
    #                            adaptive density control sees CUDA-parity
    #                            radii regardless of tight_culling)
    tiles_touched: jnp.ndarray  # [N] int32
    rect_min: jnp.ndarray      # [N, 2] int32 tile coords (x, y)
    rect_max: jnp.ndarray      # [N, 2] int32 tile coords, exclusive
    visible: jnp.ndarray       # [N] bool
    tau: jnp.ndarray           # [N] alpha>=1/255 quadform threshold
    #                            2*max(ln(255*opacity), 0) (tight_culling)


def compute_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """[N,3] scales + [N,4] quats -> [N, 6] world covariance R S^2 R^T packed
    as (xx, xy, xz, yy, yz, zz).

    Unrolled elementwise (VPU) instead of batched 3x3 einsums: XLA lowers
    tiny batched matmuls to MXU with costly layout shuffles, and default
    MXU precision is bf16. Mirrors the CUDA computeCov3D accumulation
    (gaussian_preprocess_colmap.cu:121-152).
    """
    R = quat.to_matrix(rotations, pre_normalize=True)
    s2 = jnp.square(scales * scale_modifier)  # [N, 3]
    # cov[i, k] = sum_j R[i, j] * s2[j] * R[k, j]
    out = []
    for i in range(3):
        for k in range(i, 3):
            out.append(sum(R[:, i, j] * s2[:, j] * R[:, k, j]
                           for j in range(3)))
    return jnp.stack(out, axis=-1)  # (xx, xy, xz, yy, yz, zz)


def project_points(means3d: jnp.ndarray, view: ViewParams):
    """Returns (p_view [N,3], p_pix [N,2] pixel coords, p_ndc_z [N])."""
    R, t = view.Tw2v[:3, :3], view.Tw2v[:3, 3]
    p_view = means3d @ R.T + t
    P = view.full_proj
    p_hom = means3d @ P[:3, :3].T + P[:3, 3]
    w = means3d @ P[3, :3].T + P[3, 3]
    inv_w = 1.0 / (w + 1e-7)
    p_ndc = p_hom * inv_w[:, None]
    return p_view, p_ndc


def ndc_to_pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    return ((v + 1.0) * size - 1.0) * 0.5


def compute_cov2d(p_view: jnp.ndarray, cov3d: jnp.ndarray, view: ViewParams,
                  cfg: RasterConfig) -> jnp.ndarray:
    """EWA screen-space covariance [N, 3] = (cxx, cxy, cyy), low-passed."""
    fx = cfg.image_width / (2.0 * view.tan_fovx)
    fy = cfg.image_height / (2.0 * view.tan_fovy)
    tz = p_view[:, 2]
    lim_x = 1.3 * view.tan_fovx
    lim_y = 1.3 * view.tan_fovy
    tx = jnp.clip(p_view[:, 0] / tz, -lim_x, lim_x) * tz
    ty = jnp.clip(p_view[:, 1] / tz, -lim_y, lim_y) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows: [fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]; unrolled
    # elementwise (see compute_cov3d note)
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2
    W = view.Tw2v[:3, :3]  # world->view rotation
    # A = J @ W: A[0,k] = j00 W[0,k] + j02 W[2,k]; A[1,k] = j11 W[1,k] + j12 W[2,k]
    a0 = [j00 * W[0, k] + j02 * W[2, k] for k in range(3)]
    a1 = [j11 * W[1, k] + j12 * W[2, k] for k in range(3)]
    # S = cov3d (packed xx,xy,xz,yy,yz,zz); B = A @ Sigma
    sxx, sxy, sxz, syy, syz, szz = (cov3d[:, i] for i in range(6))

    def sig_row(a):
        return (a[0] * sxx + a[1] * sxy + a[2] * sxz,
                a[0] * sxy + a[1] * syy + a[2] * syz,
                a[0] * sxz + a[1] * syz + a[2] * szz)

    b0 = sig_row(a0)
    b1 = sig_row(a1)
    cxx = b0[0] * a0[0] + b0[1] * a0[1] + b0[2] * a0[2] + 0.3
    cyy = b1[0] * a1[0] + b1[1] * a1[1] + b1[2] * a1[2] + 0.3
    cxy = b0[0] * a1[0] + b0[1] * a1[1] + b0[2] * a1[2]
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def preprocess(g: GaussianInputs, view: ViewParams, cfg: RasterConfig,
               active_sh_degree: Optional[jnp.ndarray] = None) -> PreprocessOut:
    """Full per-Gaussian preprocess. Culled / dead Gaussians end with
    radius 0, tiles_touched 0 and depth +inf, so they never produce pairs."""
    n = g.means3d.shape[0]
    p_view, p_ndc = project_points(g.means3d, view)
    in_front = p_view[:, 2] > cfg.near

    cov3d = compute_cov3d(g.scales, g.rotations, cfg.scale_modifier)
    cov2d = compute_cov2d(p_view, cov3d, view, cfg)
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    det_valid = det != 0.0
    inv_det = 1.0 / jnp.where(det_valid, det, 1.0)
    conic = jnp.stack([cov2d[:, 2] * inv_det, -cov2d[:, 1] * inv_det,
                       cov2d[:, 0] * inv_det], axis=-1)

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam_max = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    px = ndc_to_pix(p_ndc[:, 0], cfg.image_width)
    py = ndc_to_pix(p_ndc[:, 1], cfg.image_height)
    means2d = jnp.stack([px, py], axis=-1)

    # alpha >= 1/255 quadform threshold: o*exp(-q/2) >= 1/255 <=> q <= tau
    tau = 2.0 * jnp.maximum(jnp.log(255.0 * g.opacities.reshape(-1)), 0.0)
    if cfg.tight_culling:
        # per-axis radii: |dx| <= sqrt(tau * cov_xx) is necessary for
        # alpha >= 1/255 (Schur marginal bound q >= dx^2/cov_xx), so the
        # tighter rect drops only pixels BOTH kernels mask anyway; the
        # intersection with the reference circle keeps it a subset of the
        # reference rect (pixel-exact output)
        rx_f = jnp.minimum(jnp.ceil(jnp.sqrt(tau * cov2d[:, 0])), radius_f)
        ry_f = jnp.minimum(jnp.ceil(jnp.sqrt(tau * cov2d[:, 2])), radius_f)
    else:
        rx_f = ry_f = radius_f

    # tile rect (getRect, /root/reference/my_ext/_C/src/include/util.cuh)
    th = cfg.tile_h
    rect_min_x = jnp.clip(((px - rx_f) / TILE).astype(jnp.int32), 0, cfg.grid_w)
    rect_min_y = jnp.clip(((py - ry_f) / th).astype(jnp.int32), 0, cfg.grid_h)
    rect_max_x = jnp.clip(((px + rx_f + TILE - 1) / TILE).astype(jnp.int32), 0, cfg.grid_w)
    rect_max_y = jnp.clip(((py + ry_f + th - 1) / th).astype(jnp.int32), 0, cfg.grid_h)
    area = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)

    visible = in_front & det_valid & (area > 0)
    if g.mask is not None:
        visible = visible & g.mask

    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(visible, area, 0).astype(jnp.int32)
    depths = jnp.where(visible, p_view[:, 2], jnp.inf)

    if g.colors is not None:
        colors = g.colors
    else:
        sh = g.sh
        if active_sh_degree is not None:
            band_mask = sh_ops.sh_degree_mask(cfg.sh_degree, active_sh_degree)
            sh = sh * band_mask[None, :, None]
        colors = sh_ops.sh_to_color(cfg.sh_degree, sh, g.means3d, view.campos)

    rect_min = jnp.stack([rect_min_x, rect_min_y], axis=-1)
    rect_max = jnp.stack([rect_max_x, rect_max_y], axis=-1)
    return PreprocessOut(means2d, depths, conic, colors, radius,
                         tiles_touched, rect_min, rect_max, visible, tau)
