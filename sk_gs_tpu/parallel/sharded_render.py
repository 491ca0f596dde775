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

from .mesh import shard_map_compat
from ..render import blend_xla
from ..render.binning import build_tile_lists
from ..render.preprocess import PreprocessOut, preprocess
from ..render.render import blend_tiles
from ..render.settings import TILE, GaussianInputs, RasterConfig, ViewParams


def band_config(cfg: RasterConfig, n_bands: int) -> RasterConfig:
    """Raster config for one horizontal band of tile rows."""
    assert cfg.grid_h % n_bands == 0, \
        f"grid_h {cfg.grid_h} not divisible by {n_bands} bands " \
        f"(pad image_height to a multiple of {n_bands * cfg.tile_h})"
    band_rows = cfg.grid_h // n_bands
    return cfg._replace(image_height=band_rows * cfg.tile_h,
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
    means2d = pre.means2d - jnp.asarray([0.0, 1.0]) * (y0_tile * cfg.tile_h)
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
        tile_color, tile_alpha = blend_tiles(
            binned, pad1(pre_b.means2d), pad1(pre_b.conic), pad1(opac_all),
            pad1(pre_b.colors), bcfg)
        out = blend_xla.assemble_image(tile_color, tile_alpha, bcfg)
        return out['images'], out['opacity'], pre_local.radius, \
            pre_local.visible, binned.overflow

    gspec = GaussianInputs(
        means3d=P(axis), scales=P(axis), rotations=P(axis), opacities=P(axis),
        sh=P(axis), colors=None, extras=None, mask=P(axis))

    sharded = shard_map_compat(
        render_local, mesh,
        in_specs=(gspec, P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P()))

    @jax.jit
    def render_fn(g: GaussianInputs, view: ViewParams) -> Dict[str, jnp.ndarray]:
        images, opacity, radii, visible, overflow = sharded(g, view)
        return {'images': images, 'opacity': opacity, 'radii': radii,
                'visible': visible, 'overflow': jnp.any(overflow)}

    return render_fn


# ---------------------------------------------------------------- all-to-all

def _compact_for_band(pre: PreprocessOut, opac: jnp.ndarray, sel: jnp.ndarray,
                      cap: int):
    """Stable-compact the selected splats to the front, truncate/pad to
    ``cap`` rows (attributes stacked as one [cap, 14] feature block:
    xy(2) conic(3) opacity(1) color(3) depth(1) rect_min(2) rect_max(2))."""
    order = jnp.argsort(jnp.logical_not(sel), stable=True)
    n = sel.shape[0]
    take = order[:cap] if cap <= n else jnp.pad(order, (0, cap - n))
    ok = sel[take] & (jnp.arange(cap) < jnp.sum(sel))
    feats = jnp.concatenate([
        pre.means2d, pre.conic, opac[:, None], pre.colors,
        pre.depths[:, None],
        pre.rect_min.astype(jnp.float32),   # 10: x, 11: y (global tiles)
        pre.rect_max.astype(jnp.float32),   # 12: x, 13: y (exclusive)
    ], axis=-1)
    out = feats[take]
    out = jnp.where(ok[:, None], out, 0.0)
    out = out.at[:, 9].set(jnp.where(ok, out[:, 9], jnp.inf))  # depth pad
    return out, jnp.sum(sel)


def exchange_render_band(pre: PreprocessOut, opac: jnp.ndarray,
                         cfg: RasterConfig, axis: str, n_bands: int,
                         cap: int):
    """Band-local phase of the all-to-all exchange rasterizer, callable from
    inside ANY ``shard_map`` whose mesh has ``axis`` (the production train
    step embeds this directly). ``pre``/``opac`` are the LOCAL Gaussian
    shard's preprocess outputs in GLOBAL image coordinates. Each splat is
    routed only to the chips whose tile-row bands its rect overlaps; the
    receiver re-sorts by depth and blends its band with the configured
    (Pallas) blend. Returns (band_images, band_opacity, overflow)."""
    bcfg = band_config(cfg, n_bands)
    band_rows = cfg.grid_h // n_bands

    # route: band range this splat's rect overlaps
    b0 = pre.rect_min[:, 1] // band_rows
    b1 = (pre.rect_max[:, 1] - 1) // band_rows
    sends = []
    counts = []
    for d in range(n_bands):
        sel = pre.visible & (b0 <= d) & (d <= b1)
        block, cnt = _compact_for_band(pre, opac, sel, cap)
        sends.append(block)
        counts.append(cnt)
    send = jnp.stack(sends)                       # [D, cap, 14]
    overflow = jnp.any(jnp.stack(counts) > cap)

    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                              tiled=True)         # [D, cap, 14]
    recv = recv.reshape(-1, send.shape[-1])       # [D*cap, 14]

    # rebuild a band-local PreprocessOut from received features
    band = jax.lax.axis_index(axis)
    y0_tile = band * band_rows
    depths = recv[:, 9]
    visible = jnp.isfinite(depths)
    rx0 = recv[:, 10].astype(jnp.int32)
    ry0 = recv[:, 11].astype(jnp.int32)
    rx1 = recv[:, 12].astype(jnp.int32)
    ry1 = recv[:, 13].astype(jnp.int32)
    # clip the TRUE global rect rows to this band (band-local coords) —
    # widening to the whole band would leak sub-3-sigma contributions
    # the single-chip renderer's rect test excludes
    ly0 = jnp.clip(ry0 - y0_tile, 0, band_rows)
    ly1 = jnp.clip(ry1 - y0_tile, 0, band_rows)
    area = (rx1 - rx0) * (ly1 - ly0)
    visible = visible & (area > 0)
    y0_px = band.astype(jnp.float32) * (band_rows * bcfg.tile_h)
    means2d = recv[:, 0:2] - jnp.stack([jnp.zeros_like(y0_px), y0_px])
    pre_b = PreprocessOut(
        means2d=means2d,
        depths=jnp.where(visible, depths, jnp.inf),
        conic=recv[:, 2:5],
        colors=recv[:, 6:9],
        radius=jnp.where(visible, 1, 0).astype(jnp.int32),
        tiles_touched=jnp.where(visible, area, 0).astype(jnp.int32),
        rect_min=jnp.stack([rx0, ly0], -1),
        rect_max=jnp.stack([rx1, ly1], -1),
        visible=visible,
        # alpha>=1/255 threshold rebuilt from the exchanged opacity
        tau=2.0 * jnp.maximum(jnp.log(255.0 * jnp.maximum(
            recv[:, 5], 1e-12)), 0.0),
    )

    binned = build_tile_lists(pre_b, bcfg)
    pad1 = lambda x: jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
    tile_color, tile_alpha = blend_tiles(
        binned, pad1(pre_b.means2d), pad1(pre_b.conic),
        pad1(recv[:, 5]), pad1(pre_b.colors), bcfg)
    out = blend_xla.assemble_image(tile_color, tile_alpha, bcfg)
    return out['images'], out['opacity'], overflow | binned.overflow


def make_exchange_render(mesh: Mesh, cfg: RasterConfig, axis: str = 'gs',
                         send_capacity: int = 0):
    """Two-phase sharded rasterizer with an all-to-all splat exchange
    (BASELINE north-star): phase A preprocesses the local Gaussian shard;
    each splat is routed ONLY to the chips whose tile-row bands its rect
    overlaps (vs ``make_sharded_render``'s all-gather of everything);
    phase B re-sorts the received set by depth and blends the local band.
    ``radii``/``visible`` come from the local phase-A preprocess (sharded
    along ``axis``), so adaptive density control works from this renderer.

    send_capacity: max splats sent per (src chip, dst chip) pair; default
    pair_capacity // n_bands.
    """
    n_bands = mesh.shape[axis]
    cap = send_capacity or max(cfg.pair_capacity // n_bands, 1024)

    def render_local(g: GaussianInputs, view: ViewParams):
        pre = preprocess(g, view, cfg)
        opac = g.opacities.reshape(-1)
        images, opacity, overflow = exchange_render_band(
            pre, opac, cfg, axis, n_bands, cap)
        return images, opacity, pre.radius, pre.visible, overflow

    gspec = GaussianInputs(
        means3d=P(axis), scales=P(axis), rotations=P(axis), opacities=P(axis),
        sh=P(axis), colors=None, extras=None, mask=P(axis))

    sharded = shard_map_compat(
        render_local, mesh,
        in_specs=(gspec, P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P()))

    @jax.jit
    def render_fn(g: GaussianInputs, view: ViewParams):
        images, opacity, radii, visible, overflow = sharded(g, view)
        return {'images': images, 'opacity': opacity, 'radii': radii,
                'visible': visible, 'overflow': jnp.any(overflow)}

    return render_fn
