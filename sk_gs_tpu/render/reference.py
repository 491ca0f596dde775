"""Oracle renderer: per-pixel alpha compositing over ALL Gaussians, O(N*H*W).

Pure jax.numpy, differentiable, CPU-runnable on small scenes. Implements the
blend semantics of ``renderCUDA_forward``
(/root/reference/my_ext/_C/src/nerf/gaussian_render.cu:17-112) exactly:

- front-to-back order = ascending (tile, depth, emission order); here the
  per-pixel list is the depth-sorted visible set restricted to Gaussians
  whose tile rect covers the pixel's tile (the CUDA binning semantics);
- power = -0.5(a dx^2 + c dy^2) - b dx dy, skip if power > 0;
- alpha = min(0.99, opacity * exp(power)), skip if alpha < 1/255;
- terminate when transmittance would drop below 1e-4 *without* applying
  that contribution;
- out_opacity = 1 - final T; background composited by the caller
  (/root/reference/networks/sk_gs.py:1230-1231 contract).

The sequential walk is re-expressed as a masked cumulative product, which is
mathematically identical (monotone T; first cut entry and everything after it
are masked out) and gives the same gradients as the CUDA backward's
re-walk (the CUDA code also treats the skip/done decisions as constants).

This is the allclose target for the Pallas production kernel (BASELINE.json
correctness gate), mirroring the reference's own dual-path oracle strategy
(``check_C_runtime``, /root/reference/my_ext/_C/__init__.py:51-99).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .preprocess import PreprocessOut
from .settings import TILE, RasterConfig

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def blend_pixels(pix_xy: jnp.ndarray, pix_tile: jnp.ndarray, order: jnp.ndarray,
                 means2d: jnp.ndarray, conic: jnp.ndarray, opacities: jnp.ndarray,
                 colors: jnp.ndarray, rect_min: jnp.ndarray, rect_max: jnp.ndarray,
                 visible: jnp.ndarray):
    """Composite ordered Gaussians into a set of pixels.

    Args:
        pix_xy: [P, 2] float pixel centers.
        pix_tile: [P, 2] int tile coords of each pixel.
        order: [N] depth-ascending Gaussian ordering.
        others: preprocess outputs, unordered.
    Returns:
        colors [P, C], alpha [P] (= 1 - T_final).
    """
    xy = means2d[order]
    co = conic[order]
    op = opacities[order]
    col = colors[order]
    rmin = rect_min[order]
    rmax = rect_max[order]
    vis = visible[order]

    d = pix_xy[:, None, :] - xy[None, :, :]            # [P, N, 2]
    dx, dy = d[..., 0], d[..., 1]
    power = -0.5 * (co[None, :, 0] * dx * dx + co[None, :, 2] * dy * dy) \
        - co[None, :, 1] * dx * dy
    # straight-through 0.99 clamp: the CUDA backward treats min() as identity
    # (gaussian_render.cu:245-333); exp is guarded since power>0 is masked
    alpha_raw = op[None, :] * jnp.exp(jnp.minimum(power, 0.0))
    alpha = alpha_raw + jax.lax.stop_gradient(
        jnp.minimum(ALPHA_MAX, alpha_raw) - alpha_raw)

    covers = ((pix_tile[:, None, 0] >= rmin[None, :, 0])
              & (pix_tile[:, None, 0] < rmax[None, :, 0])
              & (pix_tile[:, None, 1] >= rmin[None, :, 1])
              & (pix_tile[:, None, 1] < rmax[None, :, 1])
              & vis[None, :])
    pass_mask = covers & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(pass_mask, alpha, 0.0)

    # inclusive transmittance product; cut everything from the first entry
    # whose inclusive product dips below T_EPS
    one_minus = 1.0 - alpha
    P_incl = jnp.cumprod(one_minus, axis=1)
    contrib = pass_mask & (P_incl >= T_EPS)
    alpha_eff = jnp.where(contrib, alpha, 0.0)
    T_excl = jnp.cumprod(1.0 - alpha_eff, axis=1) / (1.0 - alpha_eff)
    w = alpha_eff * T_excl                              # [P, N]
    out_color = jnp.einsum('pn,nc->pc', w, col)
    t_final = jnp.prod(1.0 - alpha_eff, axis=1)
    return out_color, 1.0 - t_final


def render_reference(pre: PreprocessOut, opacities: jnp.ndarray,
                     cfg: RasterConfig) -> Dict[str, jnp.ndarray]:
    """Render the full image with the oracle path.

    Returns dict(images [H, W, C] pre-background, opacity [H, W]).
    """
    H, W = cfg.image_height, cfg.image_width
    order = jnp.argsort(pre.depths, stable=True)

    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing='ij')
    pix_xy = jnp.stack([xs, ys], axis=-1).reshape(-1, 2).astype(jnp.float32)
    pix_tile = jnp.stack([xs // TILE, ys // cfg.tile_h], axis=-1).reshape(-1, 2)

    color, alpha = blend_pixels(pix_xy, pix_tile, order, pre.means2d, pre.conic,
                                opacities, pre.colors, pre.rect_min,
                                pre.rect_max, pre.visible)
    C = pre.colors.shape[-1]
    return {
        'images': color.reshape(H, W, C),
        'opacity': alpha.reshape(H, W),
    }
