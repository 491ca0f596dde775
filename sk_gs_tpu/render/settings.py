"""Rasterizer settings & view parameters.

Split into a *static* config (hashable; participates in jit specialization:
image size, tile size, SH degree, capacities) and *dynamic* per-view arrays
(camera matrices / fov tangents) so that camera motion never recompiles.

Reference counterpart: ``GaussianRasterizationSettings``
(/root/reference/networks/renderer/gaussian_render.py:34) — there the view
matrices, fovs and sizes are all one NamedTuple; on TPU the static/dynamic
split is what keeps one compiled program serving every frame.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

TILE = 16  # pixels per tile in x (parity with BLOCK_X = 16,
#            /root/reference/my_ext/_C/src/include/gaussian_render.h:28-31).
#            The y side is configurable (``RasterConfig.tile_h``): the CUDA
#            16x16 block maps threads to pixels, but on the TPU the whole
#            tile's pixel vector rides the lanes — a shorter tile (16x8,
#            P = 128 = one lane-tile) trades ~+33% pair count for ~-50%
#            pair-pixel blend volume, a net win once the walk is VPU-bound.


class RasterConfig(NamedTuple):
    """Static rasterizer configuration (hashable -> jit-static)."""
    image_width: int
    image_height: int
    sh_degree: int = 3           # max SH degree baked into the program
    pair_capacity: int = 2 ** 20  # max (tile, splat) pairs before padding
    chunk: int = 256             # splats processed per kernel grid step
    scale_modifier: float = 1.0
    near: float = 0.2            # frustum cull threshold on view-space z
    #                              (colmap variant, gaussian_preprocess_colmap.cu:73)
    use_pallas: bool = True      # False -> pure-XLA blend (oracle-adjacent path)
    tight_culling: bool = True   # opacity-aware per-axis rects + per-pair
    #                              tile-ellipse cull. OUTPUT-IDENTICAL to the
    #                              reference rects: every pair removed has
    #                              max alpha < 1/255 over its tile (marginal
    #                              bound q >= dx^2/cov_xx), and both kernels
    #                              mask alpha < 1/255 anyway
    #                              (gaussian_render.cu:87: skip alpha<1/255)
    tile_h: int = 16             # pixels per tile in y (16 = CUDA parity;
    #                              8 -> P=128, one lane-tile per pixel vector)

    @property
    def grid_w(self) -> int:
        return (self.image_width + TILE - 1) // TILE

    @property
    def grid_h(self) -> int:
        return (self.image_height + self.tile_h - 1) // self.tile_h

    @property
    def pix_per_tile(self) -> int:
        return TILE * self.tile_h

    @property
    def num_tiles(self) -> int:
        return self.grid_w * self.grid_h


class ViewParams(NamedTuple):
    """Dynamic per-view camera arrays (opencv/colmap convention; datasets
    convert at load; the reference's opengl fork path is subsumed by
    converting matrices, SURVEY §2.4)."""
    Tw2v: jnp.ndarray      # [4, 4] world->view
    Tv2c: jnp.ndarray      # [4, 4] view->clip
    campos: jnp.ndarray    # [3]
    tan_fovx: jnp.ndarray  # scalar
    tan_fovy: jnp.ndarray  # scalar

    @property
    def full_proj(self) -> jnp.ndarray:
        return self.Tv2c @ self.Tw2v


class GaussianInputs(NamedTuple):
    """Per-Gaussian inputs to the renderer (capacity-padded; ``mask`` marks
    live slots). ``colors`` (precomputed RGB) may replace ``sh``."""
    means3d: jnp.ndarray              # [N, 3]
    scales: jnp.ndarray               # [N, 3] (post-activation)
    rotations: jnp.ndarray            # [N, 4] quaternion (x,y,z,w), normalized
    opacities: jnp.ndarray            # [N] (post-sigmoid)
    sh: Optional[jnp.ndarray] = None  # [N, (deg+1)^2, 3]
    colors: Optional[jnp.ndarray] = None  # [N, 3]
    extras: Optional[jnp.ndarray] = None  # [N, E] extra feature channels
    mask: Optional[jnp.ndarray] = None    # [N] bool, live Gaussians
