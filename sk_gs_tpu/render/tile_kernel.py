"""Pallas TPU tile-blend kernels (forward + analytic backward, custom VJP).

The production equivalent of ``renderCUDA_forward`` / ``renderCUDA_backward``
(/root/reference/my_ext/_C/src/nerf/gaussian_render.cu:17-112, :183-341),
re-designed for the TPU execution model:

- grid = one program per 256-splat chunk of the padded, tile-sorted splat
  list (binning.py); consecutive chunks of a tile hit the same output block,
  which stays resident in VMEM (flash-attention-style revisiting);
- within a chunk the front-to-back walk is a Hillis-Steele cumulative
  product over sublanes; transmittance carries across chunks in scratch;
- layout: splat entries on sublanes (C=chunk), tile pixels on lanes (P=256);
  per-entry feature broadcasts are (C,1) x (C,P), per-pixel ones (1,P);
- the backward re-walks front-to-back (no atomics): per-entry gradients are
  lane-reductions written per-chunk, then segment-summed back to Gaussians
  outside the kernel (the CUDA kernel's atomicAdd equivalent);
- instead of the CUDA n_contrib residual, the backward recomputes the
  transmittance and uses suffix color S_i = C_final - C_incl_i.

Gradient conventions match the CUDA backward: the 0.99 alpha clamp is
treated as identity (gaussian_render.cu:245-333), skip/termination decisions
are constants.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import BinnedSplats, num_chunks
from .settings import TILE, RasterConfig

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
NUM_FEAT = 16  # x, y, conic a/b/c, opacity, colors... (zero padded)
P = TILE * TILE  # pixels per tile

# set True to run kernels in the Pallas interpreter (CPU testing)
INTERPRET = False


def _tri_ones(c: int, dtype=jnp.float32) -> jnp.ndarray:
    """Lower-triangular (inclusive) ones matrix [C, C]: L[i, j] = j <= i."""
    r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (col <= r).astype(dtype)


def _cumsum_sublanes(x):
    """Inclusive prefix sum along axis 0 as a triangular matmul (MXU).

    Sublane-axis scans via shifted selects are VPU-hostile on TPU; one
    [C,C]x[C,P] matmul on the MXU is ~free at C=256."""
    return jnp.dot(_tri_ones(x.shape[0], x.dtype), x,
                   preferred_element_type=jnp.float32)


def _cumprod_sublanes(x):
    """Inclusive prefix product along axis 0 in log space (x > 0 required;
    here x = 1 - alpha >= 0.01 by the 0.99 alpha clamp)."""
    return jnp.exp(_cumsum_sublanes(jnp.log(x)))


def _pixel_coords(tile, grid_w):
    """Pixel centers (1, P) for a tile id (row-major within tile)."""
    tx = (tile % grid_w).astype(jnp.float32)
    ty = (tile // grid_w).astype(jnp.float32)
    lp = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1).astype(jnp.float32)
    lx = lp % TILE
    ly = lp // TILE
    return tx * TILE + lx, ty * TILE + ly


def _chunk_alpha(feat, px, py):
    """Per-chunk alpha matrix (C, P) + intermediates for backward."""
    x = feat[:, 0:1]
    y = feat[:, 1:2]
    a = feat[:, 2:3]
    b = feat[:, 3:4]
    c = feat[:, 4:5]
    o = feat[:, 5:6]
    dx = px - x
    dy = py - y
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = o * g
    alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, alpha_raw, g, dx, dy, keep


def _fwd_kernel(ct_ref, cs_ref, feat_ref, color_ref, alpha_ref, t_run,
                *, grid_w: int, ch: int):
    i = pl.program_id(0)
    start = cs_ref[i] == 1
    tile = ct_ref[i]

    @pl.when(start)
    def _():
        t_run[:] = jnp.ones_like(t_run)
        color_ref[:] = jnp.zeros_like(color_ref)
        alpha_ref[:] = jnp.zeros_like(alpha_ref)

    @pl.when(start | (jnp.max(t_run[:]) >= T_EPS))
    def _():
        feat = feat_ref[:]
        px, py = _pixel_coords(tile, grid_w)
        alpha, _, _, _, _, _ = _chunk_alpha(feat, px, py)
        om = 1.0 - alpha
        p_incl = t_run[:] * _cumprod_sublanes(om)
        contrib = p_incl >= T_EPS
        w = jnp.where(contrib, alpha * p_incl / om, 0.0)          # (C, P)
        for k in range(ch):
            col_k = feat[:, 6 + k:7 + k]
            color_ref[0, k, :] += jnp.sum(w * col_k, axis=0)
        # T after chunk = p_incl at the last contributing row (monotone);
        # jnp.prod is not lowerable on TPU Pallas, min over masked rows is
        t_new = jnp.min(jnp.where(contrib, p_incl, t_run[:]), axis=0,
                        keepdims=True)
        t_run[:] = t_new
        alpha_ref[0, 0, :] = (1.0 - t_new)[0]


def _bwd_kernel(ct_ref, cs_ref, feat_ref, gcolor_ref, galpha_ref, cf_ref,
                af_ref, gfeat_ref, t_run, c_run, *, grid_w: int, ch: int):
    i = pl.program_id(0)
    start = cs_ref[i] == 1
    tile = ct_ref[i]

    @pl.when(start)
    def _():
        t_run[:] = jnp.ones_like(t_run)
        c_run[:] = jnp.zeros_like(c_run)

    feat = feat_ref[:]
    px, py = _pixel_coords(tile, grid_w)
    alpha, alpha_raw, g, dx, dy, keep = _chunk_alpha(feat, px, py)
    om = 1.0 - alpha
    p_incl = t_run[:] * _cumprod_sublanes(om)
    contrib = p_incl >= T_EPS
    w = jnp.where(contrib, alpha * p_incl / om, 0.0)
    t_excl = p_incl / om

    tf = 1.0 - af_ref[0, 0:1, :]                                   # (1, P)
    g_alpha_out = galpha_ref[0, 0:1, :]                            # (1, P)
    g_alpha_e = g_alpha_out * tf / om                              # (C, P)
    gcols = []
    for k in range(ch):
        col_k = feat[:, 6 + k:7 + k]
        wc = w * col_k
        c_incl = c_run[k:k + 1, :] + _cumsum_sublanes(wc)
        s_k = cf_ref[0, k:k + 1, :] - c_incl                       # suffix sum
        gcol_out_k = gcolor_ref[0, k:k + 1, :]                     # (1, P)
        g_alpha_e += gcol_out_k * (col_k * t_excl - s_k / om)
        gcols.append(jnp.sum(gcol_out_k * w, axis=1, keepdims=True))
        c_run[k:k + 1, :] += jnp.sum(wc, axis=0, keepdims=True)
    # gradient flows only through splats that actually contributed: the
    # alpha/power thresholds AND the transmittance cut (oracle/CUDA parity)
    g_alpha_e = jnp.where(contrib & keep, g_alpha_e, 0.0)

    g_power = alpha_raw * g_alpha_e
    a = feat[:, 2:3]
    b = feat[:, 3:4]
    c = feat[:, 4:5]
    gx = jnp.sum((a * dx + b * dy) * g_power, axis=1, keepdims=True)
    gy = jnp.sum((c * dy + b * dx) * g_power, axis=1, keepdims=True)
    ga = jnp.sum(-0.5 * dx * dx * g_power, axis=1, keepdims=True)
    gb = jnp.sum(-dx * dy * g_power, axis=1, keepdims=True)
    gc = jnp.sum(-0.5 * dy * dy * g_power, axis=1, keepdims=True)
    go = jnp.sum(g * g_alpha_e, axis=1, keepdims=True)

    cchunk = feat.shape[0]
    pad = jnp.zeros((cchunk, NUM_FEAT - 6 - ch), feat.dtype)
    gfeat_ref[:] = jnp.concatenate([gx, gy, ga, gb, gc, go] + gcols + [pad],
                                   axis=1)

    t_run[:] = jnp.min(jnp.where(contrib, p_incl, t_run[:]), axis=0,
                       keepdims=True)


def _pallas_forward(feat_g, chunk_tile, chunk_start, cfg: RasterConfig, ch: int):
    nc = num_chunks(cfg)
    T = cfg.num_tiles
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((cfg.chunk, NUM_FEAT), lambda i, ct, cs: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ch, P), lambda i, ct, cs: (ct[i], 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, ct, cs: (ct[i], 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((1, P), jnp.float32)],
    )
    color, alpha = pl.pallas_call(
        functools.partial(_fwd_kernel, grid_w=cfg.grid_w, ch=ch),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, ch, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ],
        interpret=INTERPRET,
    )(chunk_tile, chunk_start, feat_g)
    return color, alpha


def _pallas_backward(feat_g, chunk_tile, chunk_start, color, alpha,
                     g_color, g_alpha, cfg: RasterConfig, ch: int):
    nc = num_chunks(cfg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((cfg.chunk, NUM_FEAT), lambda i, ct, cs: (i, 0)),
            pl.BlockSpec((1, ch, P), lambda i, ct, cs: (ct[i], 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, ct, cs: (ct[i], 0, 0)),
            pl.BlockSpec((1, ch, P), lambda i, ct, cs: (ct[i], 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, ct, cs: (ct[i], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((cfg.chunk, NUM_FEAT), lambda i, ct, cs: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((ch, P), jnp.float32),
        ],
    )
    (gfeat,) = pl.pallas_call(
        functools.partial(_bwd_kernel, grid_w=cfg.grid_w, ch=ch),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(feat_g.shape, jnp.float32)],
        interpret=INTERPRET,
    )(chunk_tile, chunk_start, feat_g, g_color, g_alpha, color, alpha)
    return gfeat


def blend_chunks_pallas(binned: BinnedSplats, xys, conic, opa, col,
                        cfg: RasterConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tile_color [T, P, ch], tile_alpha [T, P]) like blend_xla."""
    return _blend_custom(binned.gauss_index, binned.chunk_tile,
                         binned.chunk_start_flag, binned.tile_nonempty,
                         xys, conic, opa, col, cfg)


def _build_feat(gauss_index, xys, conic, opa, col):
    ch = col.shape[-1]
    feat = jnp.concatenate([
        xys, conic, opa[:, None], col,
        jnp.zeros((xys.shape[0], NUM_FEAT - 6 - ch), xys.dtype)
    ], axis=-1)
    return feat[gauss_index]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _blend_custom(gauss_index, chunk_tile, chunk_start, tile_nonempty, xys,
                  conic, opa, col, cfg: RasterConfig):
    out, _ = _blend_fwd(gauss_index, chunk_tile, chunk_start, tile_nonempty,
                        xys, conic, opa, col, cfg)
    return out


def _blend_fwd(gauss_index, chunk_tile, chunk_start, tile_nonempty, xys,
               conic, opa, col, cfg: RasterConfig):
    ch = col.shape[-1]
    assert ch <= NUM_FEAT - 6, f"too many color channels: {ch}"
    feat_g = _build_feat(gauss_index, xys, conic, opa, col)
    color, alpha = _pallas_forward(feat_g, chunk_tile, chunk_start, cfg, ch)
    # empty tiles were never visited -> mask their garbage blocks
    ne = tile_nonempty[:, None, None]
    color = jnp.where(ne, color, 0.0)
    alpha = jnp.where(ne, alpha, 0.0)
    # public layout: (T, P, ch) to match blend_xla
    out = (color.transpose(0, 2, 1), alpha[:, 0, :])
    residuals = (gauss_index, chunk_tile, chunk_start, feat_g, color, alpha,
                 xys.shape[0])
    return out, residuals


def _blend_bwd(cfg, residuals, cotangents):
    gauss_index, chunk_tile, chunk_start, feat_g, color, alpha, n_rows = residuals
    g_tile_color, g_tile_alpha = cotangents
    ch = color.shape[1]
    g_color = g_tile_color.transpose(0, 2, 1)  # (T, ch, P)
    g_alpha = g_tile_alpha[:, None, :]         # (T, 1, P)
    gfeat = _pallas_backward(feat_g, chunk_tile, chunk_start,
                             color, alpha, g_color, g_alpha, cfg, ch)
    # scatter-add per-entry grads back to (N+1)-padded rows (the CUDA
    # atomicAdd equivalent, conflict-free by construction)
    gsum = jax.ops.segment_sum(gfeat, gauss_index, num_segments=n_rows)
    g_xys = gsum[:, 0:2]
    g_conic = gsum[:, 2:5]
    g_opa = gsum[:, 5]
    g_col = gsum[:, 6:6 + ch]
    zero_int = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    zero_ne = np.zeros((color.shape[0],), dtype=jax.dtypes.float0)
    return (zero_int(gauss_index), zero_int(chunk_tile), zero_int(chunk_start),
            zero_ne, g_xys, g_conic, g_opa, g_col)


_blend_custom.defvjp(_blend_fwd, _blend_bwd)
