"""Tile binning: expand Gaussians into depth-ordered per-tile splat lists.

TPU-native replacement for the CUDA binning pipeline
(/root/reference/my_ext/_C/src/nerf/gaussian_rasterizer_forward.cu:
InclusiveSum over tiles_touched -> duplicateWithKeys(:45-73) ->
radix SortPairs(:227-229) -> identifyTileRanges(:77-94)).

Differences by design (XLA-friendly, static shapes):
- pair expansion is a *gather*: slot k finds its Gaussian via searchsorted
  over the cumulative tiles_touched (no dynamic allocation; fixed
  ``pair_capacity`` with overflow accounting);
- Gaussians are depth-sorted first (N log N), then pairs are stable-sorted
  by tile id only (K log K on one int key) — same (tile, depth, emission)
  order as the CUDA 64-bit radix key;
- every tile's segment is padded to a whole number of kernel chunks with
  dummy entries (index N -> zero-padded attribute rows), so each Pallas grid
  step maps to exactly one tile; empty tiles get one all-dummy chunk so
  their output block is still initialized.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import PreprocessOut
from .settings import RasterConfig


class BinnedSplats(NamedTuple):
    gauss_index: jnp.ndarray    # [K_pad] int32 index into (N+1)-padded arrays
    chunk_tile: jnp.ndarray     # [num_chunks] int32 tile id per kernel chunk
    chunk_start_flag: jnp.ndarray  # [num_chunks] int32 1 where a tile's first chunk
    tile_nonempty: jnp.ndarray  # [T] bool: tile has >= 1 splat (kernel output
    #                             blocks of empty tiles are garbage -> masked)
    num_pairs: jnp.ndarray      # [] int32 pairs emitted (pre-clip)
    overflow: jnp.ndarray       # [] bool: pair_capacity exceeded (pairs dropped)

    @property
    def capacity(self) -> int:
        return self.gauss_index.shape[0]


def padded_capacity(cfg: RasterConfig) -> int:
    cap = ((cfg.pair_capacity + cfg.chunk - 1) // cfg.chunk) * cfg.chunk
    return cap + cfg.num_tiles * cfg.chunk


def num_chunks(cfg: RasterConfig) -> int:
    return padded_capacity(cfg) // cfg.chunk


def build_tile_lists(pre: PreprocessOut, cfg: RasterConfig) -> BinnedSplats:
    n = pre.depths.shape[0]
    K = cfg.pair_capacity
    C = cfg.chunk
    T = cfg.num_tiles

    # 1. depth-sort the Gaussians (stable: emission-order tie-break, parity
    #    with the stable radix sort in the reference).
    order = jnp.argsort(pre.depths, stable=True)
    touched_s = pre.tiles_touched[order]
    rect_min_s = pre.rect_min[order]
    rect_w_s = (pre.rect_max[order, 0] - rect_min_s[:, 0]).astype(jnp.int32)

    incl = jnp.cumsum(touched_s)
    total = incl[-1]
    excl = incl - touched_s

    # 2. expand: slot k -> (sorted-gaussian gs, local tile offset)
    slots = jnp.arange(K, dtype=jnp.int32)
    gs = jnp.searchsorted(incl, slots, side='right').astype(jnp.int32)
    gs = jnp.minimum(gs, n - 1)
    local = slots - excl[gs]
    valid = slots < total

    rw = jnp.maximum(rect_w_s[gs], 1)
    tx = rect_min_s[gs, 0] + local % rw
    ty = rect_min_s[gs, 1] + local // rw
    tile_id = jnp.where(valid, ty * cfg.grid_w + tx, T).astype(jnp.int32)

    # 3. stable sort by tile id (depth order preserved within tile)
    tile_sorted, gs_sorted, valid_sorted = jax.lax.sort(
        (tile_id, gs, valid.astype(jnp.int32)), num_keys=1, is_stable=True)

    # 4. per-tile counts and chunk-padded layout
    counts = jnp.bincount(tile_sorted, length=T + 1)[:T]
    # empty tiles get NO chunks (their never-visited output blocks are
    # masked by tile_nonempty downstream) — saves one grid step per empty tile
    padded_counts = ((counts + C - 1) // C) * C
    padded_offsets = jnp.concatenate(
        [jnp.zeros((1,), padded_counts.dtype), jnp.cumsum(padded_counts)])  # [T+1]
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)])  # [T+1]

    K_pad = padded_capacity(cfg)
    j = jnp.arange(K, dtype=jnp.int32)
    rank = j - starts[tile_sorted].astype(jnp.int32)
    pos = padded_offsets[jnp.minimum(tile_sorted, T - 1)].astype(jnp.int32) + rank
    pos = jnp.where(valid_sorted.astype(bool), pos, K_pad)  # dropped

    gauss_index = jnp.full((K_pad,), n, dtype=jnp.int32)  # n == dummy row
    # map back to ORIGINAL gaussian ids for attribute gathers
    orig_idx = order.astype(jnp.int32)[gs_sorted]
    gauss_index = gauss_index.at[pos].set(orig_idx, mode='drop')

    # 5. chunk -> tile map (non-decreasing; trailing chunks land on last tile)
    c_starts = jnp.arange(num_chunks(cfg), dtype=padded_offsets.dtype) * C
    chunk_tile = jnp.searchsorted(padded_offsets[1:], c_starts, side='right')
    chunk_tile = jnp.minimum(chunk_tile, T - 1).astype(jnp.int32)
    first_chunk_of_tile = padded_offsets[chunk_tile] // C
    chunk_start_flag = (jnp.arange(num_chunks(cfg)) == first_chunk_of_tile).astype(jnp.int32)

    return BinnedSplats(
        gauss_index=gauss_index,
        chunk_tile=chunk_tile,
        chunk_start_flag=chunk_start_flag,
        tile_nonempty=counts > 0,
        num_pairs=total,
        overflow=total > K,
    )
