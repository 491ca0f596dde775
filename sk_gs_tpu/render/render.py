"""Public differentiable render API: preprocess -> binning -> tile blend.

The TPU-native counterpart of ``render``
(/root/reference/networks/renderer/gaussian_render.py:285) +
``_RasterizeGaussians`` (:51-188). Contract parity with the in-repo fork:

- returns pre-background ``images`` [H, W, C] and ``opacity`` [H, W]; the
  caller composites ``images + (1 - opacity[..., None]) * bg``
  (/root/reference/networks/sk_gs.py:1229-1231);
- ``radii``/``visible`` feed adaptive density control;
- ``means2d_offset``: pass zeros [N, 2] and take grads w.r.t. it to get the
  screen-space position gradients used for densification stats (functional
  equivalent of the reference's grad-retaining ``viewspace_points`` zeros
  tensor, gaussian_render.py:291-300);
- extra per-Gaussian channels are appended to colors and rendered in the
  same pass (reference renders them in separate buffer-reusing passes,
  gaussian_rasterizer_extra.cu).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from . import blend_xla
from .binning import build_tile_lists
from .preprocess import preprocess
from .settings import GaussianInputs, RasterConfig, ViewParams


def blend_tiles(binned, xys_p, conic_p, opa_p, col_p, cfg: RasterConfig):
    """Blend the binned splats into per-tile color/alpha blocks with the
    configured backend (Pallas kernel or the XLA scan twin). Inputs are the
    (N+1)-row padded per-splat arrays; used by both the single-chip path and
    the band-local phase of the sharded renderers (the kernel is band-local,
    so it runs unchanged inside ``shard_map``)."""
    if cfg.use_pallas:
        from .tile_kernel import blend_chunks_pallas
        return blend_chunks_pallas(binned, xys_p, conic_p, opa_p, col_p, cfg)
    return blend_xla.blend_chunks_scan(binned, xys_p, conic_p, opa_p, col_p,
                                       cfg)


def render(g: GaussianInputs, view: ViewParams, cfg: RasterConfig,
           active_sh_degree: Optional[jnp.ndarray] = None,
           means2d_offset: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    pre = preprocess(g, view, cfg, active_sh_degree)
    means2d = pre.means2d if means2d_offset is None else pre.means2d + means2d_offset

    colors = pre.colors
    if g.extras is not None:
        colors = jnp.concatenate([colors, g.extras], axis=-1)

    binned = build_tile_lists(pre, cfg)

    # (N+1)-row padding: dummy row with opacity 0 -> alpha 0, no gradient
    pad1 = lambda x: jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
    tile_color, tile_alpha = blend_tiles(
        binned, pad1(means2d), pad1(pre.conic),
        pad1(g.opacities.reshape(-1)), pad1(colors), cfg)

    out = blend_xla.assemble_image(tile_color, tile_alpha, cfg)
    images = out['images']
    result = {
        'images': images[..., :3] if g.extras is not None else images,
        'opacity': out['opacity'],
        'radii': pre.radius,
        'visible': pre.visible,
        'num_pairs': binned.num_pairs,
        'overflow': binned.overflow,
    }
    if g.extras is not None:
        result['extras'] = images[..., 3:]
    return result


def render_topk(g: GaussianInputs, view: ViewParams, cfg: RasterConfig,
                k: int = 8, active_sh_degree: Optional[jnp.ndarray] = None):
    """Per-pixel top-k contributing Gaussian ids + blend weights — the GUI
    picking path (parity: ``GaussianRasterizer.topk_weights``,
    /root/reference/networks/renderer/gaussian_render.py:343-347, consumed
    by click-picking in gui.py:333). Returns (indices [H, W, k] int32 into
    the input Gaussians, -1 when fewer than k contribute; weights [H, W, k]).
    """
    pre = preprocess(g, view, cfg, active_sh_degree)
    binned = build_tile_lists(pre, cfg)
    pad1 = lambda x: jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
    return blend_xla.topk_weights(binned, pad1(pre.means2d), pad1(pre.conic),
                                  pad1(g.opacities.reshape(-1)), cfg, k=k)


def composite_background(images: jnp.ndarray, opacity: jnp.ndarray,
                         background: Optional[jnp.ndarray]) -> jnp.ndarray:
    """images + (1 - opacity) * bg — the reference's python-side composite
    (/root/reference/networks/sk_gs.py:1230-1231)."""
    if background is None:
        return images
    bg = jnp.asarray(background, images.dtype)
    return images + (1.0 - opacity)[..., None] * jnp.broadcast_to(
        bg, images.shape)


def mark_visible(means3d: jnp.ndarray, view: ViewParams,
                 near: float = 0.2) -> jnp.ndarray:
    """Frustum-culling mask for points — the reference's
    ``GaussianRasterizer.markVisible`` (/root/reference/networks/renderer/
    gaussian_render.py:227-233, CUDA markVisible in
    gaussian_rasterizer_imp.cu). Matches the rasterizer's own cull: a point
    is visible when its view-space depth exceeds ``near``.
    """
    ones = jnp.ones((*means3d.shape[:-1], 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=-1)
    p_view = hom @ view.Tw2v.T
    return p_view[..., 2] > near
