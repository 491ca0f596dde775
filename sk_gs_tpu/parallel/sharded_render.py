"""Multi-chip sharded rasterization (SURVEY §7.7).

Two-phase design under ``shard_map``:

- phase A (Gaussian-sharded): each chip preprocesses its N/D slice of the
  capacity axis (projection, EWA covariance, SH color — the per-Gaussian
  FLOPs scale 1/D), then all-gathers the compact per-splat outputs
  (~40 B/Gaussian) over ICI;
- phase B (tile-sharded): each chip bins and blends only its horizontal
  band of tile rows (grid_h/D rows), producing its image band; bands
  concatenate along the sharded row axis.

The backward runs through shard_map autodiff: the all-gather transposes to
a reduce-scatter of per-Gaussian gradients over ICI — exactly the
"per-Gaussian gradient all-reduce overlapped with backward" story from
BASELINE.json, inserted by XLA rather than hand-written.

The reference has no multi-GPU rasterizer at all (SURVEY §2.2: one scene
per GPU); this module is the new scale story.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..render import blend_xla
from ..render.binning import build_tile_lists
from ..render.preprocess import PreprocessOut, preprocess
from ..render.settings import TILE, GaussianInputs, RasterConfig, ViewParams


def band_config(cfg: RasterConfig, n_bands: int) -> RasterConfig:
    """Raster config for one horizontal band of tile rows."""
    assert cfg.grid_h % n_bands == 0, \
        f"grid_h {cfg.grid_h} not divisible by {n_bands} bands " \
        f"(pad image_height to a multiple of {n_bands * TILE})"
    band_rows = cfg.grid_h // n_bands
    return cfg._replace(image_height=band_rows * TILE,
                        pair_capacity=cfg.pair_capacity // n_bands)


def _restrict_to_band(pre: PreprocessOut, band: jnp.ndarray,
                      band_rows: int, cfg: RasterConfig) -> PreprocessOut:
    """Clip tile rects to this chip's tile-row band and shift to band-local
    coordinates (pixel y too)."""
    y0_tile = band * band_rows
    y1_tile = y0_tile + band_rows
    rmin_y = jnp.clip(pre.rect_min[:, 1], y0_tile, y1_tile) - y0_tile
    rmax_y = jnp.clip(pre.rect_max[:, 1], y0_tile, y1_tile) - y0_tile
    area = (pre.rect_max[:, 0] - pre.rect_min[:, 0]) * (rmax_y - rmin_y)
    visible = pre.visible & (area > 0)
    means2d = pre.means2d - jnp.asarray([0.0, 1.0]) * (y0_tile * TILE)
    return pre._replace(
        means2d=means2d,
        rect_min=jnp.stack([pre.rect_min[:, 0], rmin_y], -1),
        rect_max=jnp.stack([pre.rect_max[:, 0], rmax_y], -1),
        tiles_touched=jnp.where(visible, area, 0).astype(jnp.int32),
        depths=jnp.where(visible, pre.depths, jnp.inf),
        visible=visible,
        radius=jnp.where(visible, pre.radius, 0),
    )


def make_sharded_render(mesh: Mesh, cfg: RasterConfig, axis: str = 'gs'):
    """Build a jitted multi-chip render: Gaussians sharded along ``axis``,
    image rows sharded along the same axis on output."""
    n_bands = mesh.shape[axis]
    bcfg = band_config(cfg, n_bands)
    band_rows = cfg.grid_h // n_bands

    def render_local(g: GaussianInputs, view: ViewParams):
        pre_local = preprocess(g, view, cfg)
        # phase A -> B: gather compact splat data from all chips
        pre = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis, tiled=True), pre_local)
        band = jax.lax.axis_index(axis)
        pre_b = _restrict_to_band(pre, band, band_rows, cfg)
        binned = build_tile_lists(pre_b, bcfg)
        opac_all = jax.lax.all_gather(g.opacities.reshape(-1), axis,
                                      tiled=True)
        pad1 = lambda x: jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
        tile_color, tile_alpha = blend_xla.blend_chunks_scan(
            binned, pad1(pre_b.means2d), pad1(pre_b.conic), pad1(opac_all),
            pad1(pre_b.colors), bcfg)
        out = blend_xla.assemble_image(tile_color, tile_alpha, bcfg)
        return out['images'], out['opacity'], pre_local.radius, \
            pre_local.visible, binned.overflow

    gspec = GaussianInputs(
        means3d=P(axis), scales=P(axis), rotations=P(axis), opacities=P(axis),
        sh=P(axis), colors=None, extras=None, mask=P(axis))

    sharded = shard_map(
        render_local, mesh=mesh,
        in_specs=(gspec, P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        check_rep=False)

    @jax.jit
    def render_fn(g: GaussianInputs, view: ViewParams) -> Dict[str, jnp.ndarray]:
        images, opacity, radii, visible, overflow = sharded(g, view)
        return {'images': images, 'opacity': opacity, 'radii': radii,
                'visible': visible, 'overflow': jnp.any(overflow)}

    return render_fn
