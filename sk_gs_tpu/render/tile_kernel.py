"""Pallas TPU tile-blend kernels (forward + analytic backward, custom VJP).

The production equivalent of ``renderCUDA_forward`` / ``renderCUDA_backward``
(/root/reference/my_ext/_C/src/nerf/gaussian_render.cu:17-112, :183-341),
re-designed for the TPU execution model:

- default 'tile' schedule: grid = one program per tile; a dynamic
  fori_loop walks the tile's C-splat chunks (segment start/count from
  scalar prefetch), so padding produces NO grid steps and the
  transmittance early-out gates both the math and the gradient stores.
  (The round-1 'chunk' schedule — a static grid over padded chunks with
  VMEM-resident output-block revisiting — is kept as a knob.)
- the splat features live UNPADDED in HBM in tile-sorted order; each
  chunk's entries are CONTIGUOUS there, so the kernel streams them with
  manually double-buffered DMA. This avoids materializing a padded
  gather — XLA random gathers cost ~10 ns/element on TPU, contiguous DMA
  is ~free;
- entries past the chunk's valid count are masked (alpha 0); the backward
  streams per-chunk gradient tiles back to HBM through a two-slot store
  pipeline whose cross-tile drains order the overlapping tail rows;
- within a chunk the front-to-back walk uses exact Hillis-Steele prefix
  products (TPU exp/log error makes log-space matmuls drift; A/B'd knob
  'logmxu' kept). The walk keeps the EXCLUSIVE product p_excl so the
  weights w = alpha * p_excl need no per-element divide. The backward
  collapses all per-channel suffix passes by linearity into ONE combined
  cumsum of w * (cols @ g_color) plus a single carried row — the measured
  winner over both the per-channel form and full-MXU moment matmuls — and
  DMAs per-entry grads out per chunk (segment-summed back to Gaussians
  outside, the atomicAdd equivalent).

Layout: splat entries on sublanes (C), tile pixels on lanes
(P = TILE * cfg.tile_h; 256 at CUDA-parity 16x16 tiles, 128 at 16x8).
Gradient conventions match the CUDA backward: the 0.99 alpha clamp is
treated as identity (gaussian_render.cu:245-333), skip/termination
decisions are constants.
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
# feature row width: x, y, conic a/b/c, opacity, colors..., zero padded to a
# full 128-lane tile — Mosaic requires dynamic-offset DMA slices to be
# lane-aligned, and the 8x bandwidth overhead is ~0.2 us per chunk
NUM_FEAT = 128

# set True to run kernels in the Pallas interpreter (CPU testing)
INTERPRET = False

# implementation knobs (A/B-tested on hardware via tools/kernel_lab.py);
# all variants are numerically equivalent up to ~1 ulp re-association
# Production defaults — A/B-measured on v5e (tools/kernel_lab.py, round 2):
# cumprod 'roll' ~= 'concat' (+-0.1 ms); bwd cumsum 'mxu_default' (one bf16
# MXU pass, grads within ~0.3% of exact — see test_tile_kernel grad-noise
# bound) beats HIGHEST by ~1.2 ms and exact HS adds by ~0.26 ms; DMA gating
# removes the dead-tail DMA traffic.
IMPL = {
    'cumprod': 'roll',     # 'concat' (shift via static slice) | 'roll'
    'cumsum': 'mxu_default',  # 'mxu' (triangular matmul, HIGHEST) |
    #                        'mxu_default' (bf16 passes) | 'concat' (HS adds)
    'gate_dma': True,      # skip DMA for the dead tail chunks (chunk sched)
    'schedule': 'tile',    # 'tile': one grid step per tile, dynamic inner
    #                        fori_loop over its chunks (no static padded
    #                        chunk grid, no dead grid steps, transmittance
    #                        early-out gates the math) | 'chunk': round-1
    #                        static grid of padded chunks
    # MXU offload knobs (tile schedule only). A/B on v5e (round 2): every
    # MXU variant LOST to plain VPU math at these shapes — the [C,8]/[8,P]
    # matmuls are latency-bound in Mosaic, not throughput-bound (all-mxu
    # bf16: fwd 1.73 vs vpu 1.33 ms; logmxu cumprod HIGHEST: fwd 1.56).
    # Knobs kept for future hardware; defaults = measured best. The one MXU
    # structure that DID win is the linearity-collapsed backward (one
    # combined suffix cumsum instead of per-channel, bwd 2.72 -> 2.22 ms).
    'qform': 'vpu',        # power = G[C,8] @ X[8,P] (quadratic form as a
    #                        polynomial in tile-centered pixel coords)
    'colsum': 'vpu',       # fwd color accumulation cols^T[ch,C] @ w[C,P]
    'moments': 'vpu',      # bwd per-pair grad sums via pixel moments
    #                        g_power[C,P] @ X^T[P,8] + [C,1] recombination
    'matprec': 'highest',  # precision for the new matmuls ('highest' = f32
    #                        6-pass; 'default' = one bf16 pass)
    'diag': 'none',        # diagnostics (kernel_lab only): 'nomath' keeps
    #                        the DMA pipeline but trivializes the chunk math;
    #                        'nodma' keeps the math on stale buffer contents
    'stage_bf16': False,   # stage the DMA'd feature rows in bf16 (half the
    #                        gather + DMA bytes; math converts back to f32
    #                        in-kernel). REFUTED on hardware (round 5): the
    #                        expected ceiling was small (DMA is ~5% of the
    #                        kernel per the round-1 bandwidth estimate) and
    #                        Mosaic cannot dynamically slice packed-bf16
    #                        HBM memrefs at chunk offsets (tpu.memref_slice
    #                        verification failure) — works in interpret
    #                        mode only (tests); raises loudly on TPU.
    'grad_reduce': 'auto',  # per-pair grad -> per-gaussian reduction:
    #                        'scatter' = XLA scatter-add segment_sum;
    #                        'sorted' = payload-sort by rank id + sorted
    #                        segment_sum; 'auto' = sorted at pair caps
    #                        >= 2^19, scatter below (hardware A/B, round 3:
    #                        scatter wins 3.97 vs 4.47 ms at cap 2^17/n=20k,
    #                        sorted wins 25.2 vs 25.8 ms at cap 2^20/n=100k)
}

# power <= 0 in exact arithmetic for any PSD conic (power = -q, q >= 0); the
# reference's `power > 0 -> skip` (gaussian_render.cu:79) is defensive. A
# small positive slack keeps the test robust to matmul re-association noise
# near the Gaussian center, where dropping the entry would cost O(opacity).
POWER_SKIP_EPS = 1e-4


def _feat_dtype():
    return jnp.bfloat16 if IMPL['stage_bf16'] else jnp.float32


def _mat_precision():
    return (jax.lax.Precision.HIGHEST if IMPL['matprec'] == 'highest'
            else jax.lax.Precision.DEFAULT)


def _tri_ones(c: int, dtype=jnp.float32) -> jnp.ndarray:
    """Lower-triangular (inclusive) ones matrix [C, C]: L[i, j] = j <= i."""
    r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (col <= r).astype(dtype)


def _cumsum_sublanes(x):
    """Inclusive prefix sum along axis 0 (sublanes).

    'mxu': one [C,C]x[C,P] matmul — MXU work but HIGHEST precision costs
    multiple bf16 passes; 'concat': log2(C) Hillis-Steele passes of exact
    f32 adds with static-slice shifts (no select needed: shifted-in rows are
    the identity 0)."""
    impl = IMPL['cumsum']
    if impl == 'concat':
        c = x.shape[0]
        shift = 1
        while shift < c:
            top = jnp.zeros((shift,) + x.shape[1:], x.dtype)
            x = x + jnp.concatenate([top, x[:-shift]], axis=0)
            shift *= 2
        return x
    precision = (jax.lax.Precision.HIGHEST if impl == 'mxu'
                 else jax.lax.Precision.DEFAULT)
    return jnp.dot(_tri_ones(x.shape[0], x.dtype), x,
                   preferred_element_type=jnp.float32, precision=precision)


def _cumprod_sublanes(x):
    """Inclusive prefix product along axis 0 via Hillis-Steele doubling.

    NOT the log-space matmul: TPU exp/log carry ~1e-4 relative error that
    compounds to ~5% over 256-term products (measured), while shifted
    multiplies are exact. 'concat' shifts by static slice+concat (the
    shifted-in rows are the identity 1.0, so no row-mask select is needed);
    'roll' uses pltpu.roll + iota select."""
    c = x.shape[0]
    if IMPL['cumprod'] == 'concat':
        shift = 1
        while shift < c:
            top = jnp.ones((shift,) + x.shape[1:], x.dtype)
            x = x * jnp.concatenate([top, x[:-shift]], axis=0)
            shift *= 2
        return x
    if IMPL['cumprod'] == 'logmxu':
        # per-CHUNK log-space prefix via one triangular MXU matmul: the
        # carry across chunks stays an exact multiply, so the roundtrip
        # error is one exp+log pair (~1e-4 relative) bounded by
        # |log T| <= |log T_EPS| ~ 9.2 within a chunk — NOT the 5% drift of
        # a full-sequence log-space product. Trades ~1e-4 blend accuracy
        # for removing the log2(C) Hillis-Steele passes (the largest VPU
        # cost in the forward walk). x > 0 always: alpha <= ALPHA_MAX.
        # HIGHEST (f32; Mosaic supports only DEFAULT/HIGHEST): one-bf16-pass
        # rounding of ~9-magnitude logs would give ~3% transmittance error
        lg = jnp.log(x)
        return jnp.exp(jnp.dot(_tri_ones(c, x.dtype), lg,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST))
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < c:
        rolled = pltpu.roll(x, shift, axis=0)
        x = x * jnp.where(rows >= shift, rolled, 1.0)
        shift *= 2
    return x


def _shift_down_one(x, fill: float):
    """[C, P] -> rows shifted down by 1, row 0 = fill."""
    top = jnp.full((1,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([top, x[:-1]], axis=0)


def _pixel_coords(tile, grid_w, th):
    """Pixel centers (1, P) for a tile id (row-major within a TILE x th
    tile; P = TILE * th)."""
    tx = (tile % grid_w).astype(jnp.float32)
    ty = (tile // grid_w).astype(jnp.float32)
    lp = jax.lax.broadcasted_iota(jnp.int32, (1, TILE * th), 1
                                  ).astype(jnp.float32)
    lx = lp % TILE
    ly = lp // TILE
    return tx * TILE + lx, ty * th + ly


def _chunk_alpha(feat, px, py, n_valid):
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
    row = jax.lax.broadcasted_iota(jnp.int32, power.shape, 0)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & (row < n_valid)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, alpha_raw, g, dx, dy, keep


def _blend_math(feat, px, py, t_run, n_valid):
    """Shared fwd/bwd chunk math (exclusive-product form: no divides)."""
    alpha, alpha_raw, g, dx, dy, keep = _chunk_alpha(feat, px, py, n_valid)
    om = 1.0 - alpha
    p_excl = t_run * _shift_down_one(_cumprod_sublanes(om), 1.0)
    p_incl = p_excl * om
    contrib = p_incl >= T_EPS
    w = jnp.where(contrib, alpha * p_excl, 0.0)
    # T after chunk = p_incl at the last contributing row (monotone)
    t_new = jnp.min(jnp.where(contrib, p_incl, t_run), axis=0, keepdims=True)
    return alpha, alpha_raw, g, dx, dy, keep, om, p_excl, contrib, w, t_new


def _make_basis(tile, grid_w, th):
    """Per-tile pixel basis for the MXU blend core.

    Returns (cx, cy, u, v, X): tile-center pixel coords (scalars), centered
    per-pixel offsets u, v (1, P) in [-(TILE-1)/2, (TILE-1)/2] x
    [-(th-1)/2, (th-1)/2], and the polynomial basis
    X = [u^2, v^2, u*v, u, v, 1, 0, 0] (8, P). Centering keeps the matmul
    operands small (|u| <= 8) so even one bf16 MXU pass stays accurate;
    absolute pixel coords (up to image size) would not."""
    tx = (tile % grid_w).astype(jnp.float32)
    ty = (tile // grid_w).astype(jnp.float32)
    half_x = (TILE - 1) / 2.0
    half_y = (th - 1) / 2.0
    cx = tx * TILE + half_x
    cy = ty * th + half_y
    lp = jax.lax.broadcasted_iota(jnp.int32, (1, TILE * th), 1
                                  ).astype(jnp.float32)
    u = lp % TILE - half_x
    v = lp // TILE - half_y
    X = None
    if IMPL['qform'] == 'mxu' or IMPL['moments'] == 'mxu':
        zr = jnp.zeros_like(u)
        X = jnp.concatenate([u * u, v * v, u * v, u, v,
                             jnp.ones_like(u), zr, zr], axis=0)     # (8, P)
    return cx, cy, u, v, X


def _blend_core(feat, basis, t_run, n_valid):
    """Tile-schedule chunk math. Same contract as ``_blend_math`` but the
    quadratic form runs on the MXU: power(dx, dy) is a degree-2 polynomial
    in the tile-centered pixel coords (u, v), so power = G @ X with
    per-entry coefficients G [C, 8] (cheap [C, 1] column math) and the
    shared per-tile basis X [8, P]. Returns the per-entry coefficient
    columns the backward's moment recombination needs."""
    cx, cy, u, v, X = basis
    x = feat[:, 0:1]
    y = feat[:, 1:2]
    a = feat[:, 2:3]
    b = feat[:, 3:4]
    c = feat[:, 4:5]
    o = feat[:, 5:6]
    xl = x - cx
    yl = y - cy
    if IMPL['qform'] == 'mxu':
        # -0.5*a*(u-xl)^2 - 0.5*c*(v-yl)^2 - b*(u-xl)*(v-yl) expanded in u, v
        zc = jnp.zeros_like(a)
        G = jnp.concatenate(
            [-0.5 * a, -0.5 * c, -b, a * xl + b * yl, c * yl + b * xl,
             -(0.5 * a * xl * xl + 0.5 * c * yl * yl + b * xl * yl),
             zc, zc], axis=1)                                       # (C, 8)
        power = jax.lax.dot_general(
            G, X, (((1,), (0,)), ((), ())), precision=_mat_precision(),
            preferred_element_type=jnp.float32)                     # (C, P)
    else:
        dx = (cx + u) - x
        dy = (cy + v) - y
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = o * g
    alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
    row = jax.lax.broadcasted_iota(jnp.int32, power.shape, 0)
    keep = (power <= POWER_SKIP_EPS) & (alpha >= ALPHA_MIN) & (row < n_valid)
    alpha = jnp.where(keep, alpha, 0.0)
    om = 1.0 - alpha
    p_excl = t_run * _shift_down_one(_cumprod_sublanes(om), 1.0)
    p_incl = p_excl * om
    contrib = p_incl >= T_EPS
    w = jnp.where(contrib, alpha * p_excl, 0.0)
    t_new = jnp.min(jnp.where(contrib, p_incl, t_run), axis=0, keepdims=True)
    return (alpha, alpha_raw, keep, om, p_excl, contrib, w, t_new,
            (a, b, c, o, xl, yl))


def _feat_dma(feat_hbm, buf, sem, slot, src):
    return pltpu.make_async_copy(
        feat_hbm.at[pl.ds(src, buf.shape[1]), :], buf.at[slot], sem.at[slot])


def _fwd_kernel(ct_ref, cs_ref, sv_ref, sc_ref, feat_hbm, color_ref,
                alpha_ref, t_run, feat_buf, sems, *, grid_w: int, ch: int,
                th: int):
    i = pl.program_id(0)
    nc = pl.num_programs(0)
    start = cs_ref[i] == 1
    tile = ct_ref[i]
    gate = IMPL['gate_dma']

    if IMPL['diag'] != 'nodma':
        @pl.when((i == 0) & (sv_ref[0] > 0) if gate else (i == 0))
        def _():
            _feat_dma(feat_hbm, feat_buf, sems, 0, sc_ref[0]).start()

        @pl.when((i + 1 < nc) & (sv_ref[jnp.minimum(i + 1, nc - 1)] > 0)
                 if gate else (i + 1 < nc))
        def _():
            _feat_dma(feat_hbm, feat_buf, sems, (i + 1) % 2,
                      sc_ref[i + 1]).start()

        @pl.when(sv_ref[i] > 0 if gate else i >= 0)
        def _():
            _feat_dma(feat_hbm, feat_buf, sems, i % 2, sc_ref[i]).wait()

    if IMPL['diag'] == 'nomath':
        @pl.when(sv_ref[i] > 0)
        def _():
            feat = feat_buf[i % 2].astype(jnp.float32)
            for k in range(ch):
                color_ref[0, k, :] += jnp.broadcast_to(
                    jnp.sum(feat[:, 6 + k:7 + k], axis=0), (TILE * th,))
        return

    @pl.when(start)
    def _():
        t_run[:] = jnp.ones_like(t_run)
        color_ref[:] = jnp.zeros_like(color_ref)
        alpha_ref[:] = jnp.zeros_like(alpha_ref)

    # skip the math for saturated tiles AND for pure-padding chunks
    # (chunk_valid == 0): the grid is statically sized to the padded
    # capacity, so the tail past the real pair count is all padding
    @pl.when((sv_ref[i] > 0) & (start | (jnp.max(t_run[:]) >= T_EPS)))
    def _():
        feat = feat_buf[i % 2].astype(jnp.float32)
        px, py = _pixel_coords(tile, grid_w, th)
        (alpha, _, _, _, _, _, om, p_excl, contrib, w,
         t_new) = _blend_math(feat, px, py, t_run[:], sv_ref[i])
        for k in range(ch):
            col_k = feat[:, 6 + k:7 + k]
            color_ref[0, k, :] += jnp.sum(w * col_k, axis=0)
        t_run[:] = t_new
        alpha_ref[0, 0, :] = (1.0 - t_new)[0]


def _bwd_kernel(ct_ref, cs_ref, sv_ref, sc_ref, feat_hbm, gcolor_ref,
                galpha_ref, cf_ref, af_ref, gfeat_hbm, t_run, c_run,
                feat_buf, gfeat_buf, sems, osems, *, grid_w: int, ch: int,
                th: int):
    i = pl.program_id(0)
    nc = pl.num_programs(0)
    start = cs_ref[i] == 1
    tile = ct_ref[i]
    C = feat_buf.shape[1]
    gate = IMPL['gate_dma']

    @pl.when((i == 0) & (sv_ref[0] > 0) if gate else (i == 0))
    def _():
        _feat_dma(feat_hbm, feat_buf, sems, 0, sc_ref[0]).start()

    @pl.when((i + 1 < nc) & (sv_ref[jnp.minimum(i + 1, nc - 1)] > 0)
             if gate else (i + 1 < nc))
    def _():
        _feat_dma(feat_hbm, feat_buf, sems, (i + 1) % 2, sc_ref[i + 1]).start()

    @pl.when(sv_ref[i] > 0 if gate else i >= 0)
    def _():
        _feat_dma(feat_hbm, feat_buf, sems, i % 2, sc_ref[i]).wait()

    # the store issued two steps ago into this slot must have drained
    @pl.when((i >= 2) & (sv_ref[jnp.maximum(i - 2, 0)] > 0) if gate
             else (i >= 2))
    def _():
        pltpu.make_async_copy(
            gfeat_buf.at[i % 2],
            gfeat_hbm.at[pl.ds(sc_ref[jnp.maximum(i - 2, 0)], C), :],
            osems.at[i % 2]).wait()

    @pl.when(start)
    def _():
        t_run[:] = jnp.ones_like(t_run)
        c_run[:] = jnp.zeros_like(c_run)

    # saturated fast path: once every pixel's transmittance is cut, all
    # remaining entries of this tile have zero gradient — just emit zeros.
    # Padding (tail) chunks skip everything including the store: their
    # gfeat rows are never read into a real Gaussian (their segment id is
    # the dummy row n, whose gradient is sliced away).
    dma_on = sv_ref[i] > 0
    live = dma_on & (start | (jnp.max(t_run[:]) >= T_EPS))
    if IMPL['diag'] == 'nomath':
        live = dma_on & (i < 0)  # always take the zero-store path

    @pl.when(live)
    def _():
        feat = feat_buf[i % 2].astype(jnp.float32)
        px, py = _pixel_coords(tile, grid_w, th)
        P = TILE * th
        (alpha, alpha_raw, g, dx, dy, keep, om, p_excl, contrib, w,
         t_new) = _blend_math(feat, px, py, t_run[:], sv_ref[i])
        inv_om = 1.0 / om                                          # (C, P)

        tf = 1.0 - af_ref[0, 0:1, :]                               # (1, P)
        g_alpha_out = galpha_ref[0, 0:1, :]                        # (1, P)
        g_alpha_e = g_alpha_out * tf * inv_om                      # (C, P)
        # all channels' inclusive sums in ONE prefix pass over (C, ch*P)
        wc_all = jnp.concatenate(
            [w * feat[:, 6 + k:7 + k] for k in range(ch)], axis=1)  # (C,ch*P)
        incl_all = _cumsum_sublanes(wc_all)
        gcols = []
        for k in range(ch):
            col_k = feat[:, 6 + k:7 + k]
            wc = wc_all[:, k * P:(k + 1) * P]
            c_incl = c_run[k:k + 1, :] + incl_all[:, k * P:(k + 1) * P]
            s_k = cf_ref[0, k:k + 1, :] - c_incl                   # suffix sum
            gcol_out_k = gcolor_ref[0, k:k + 1, :]                 # (1, P)
            g_alpha_e += gcol_out_k * (col_k * p_excl - s_k * inv_om)
            gcols.append(jnp.sum(gcol_out_k * w, axis=1, keepdims=True))
            c_run[k:k + 1, :] += jnp.sum(wc, axis=0, keepdims=True)
        # gradient flows only through splats that actually contributed: the
        # alpha/power thresholds AND the transmittance cut (CUDA parity)
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

        pad = jnp.zeros((C, NUM_FEAT - 6 - ch), feat.dtype)
        grads = jnp.concatenate([gx, gy, ga, gb, gc, go] + gcols + [pad],
                                axis=1)
        # zero the overlap tail: rows past n_valid belong to the NEXT tile's
        # segment; its own later chunks re-write them with correct values
        row = jax.lax.broadcasted_iota(jnp.int32, grads.shape, 0)
        gfeat_buf[i % 2] = jnp.where(row < sv_ref[i], grads, 0.0)
        t_run[:] = t_new

    @pl.when(dma_on & jnp.logical_not(live))
    def _():
        gfeat_buf[i % 2] = jnp.zeros_like(gfeat_buf[i % 2])

    @pl.when(dma_on if IMPL['gate_dma'] else i >= 0)
    def _():
        pltpu.make_async_copy(
            gfeat_buf.at[i % 2],
            gfeat_hbm.at[pl.ds(sc_ref[i], C), :],
            osems.at[i % 2]).start()

    # drain outstanding stores at the end of the grid. With gating, the
    # last two LIVE chunks may sit anywhere; stores from chunks <= nc-3 are
    # waited by the i-2 rule above (dead steps still execute their waits),
    # so only stores issued at nc-1 / nc-2 themselves need explicit drains.
    @pl.when((i == nc - 1) & (sv_ref[i] > 0 if gate else i >= 0))
    def _():
        pltpu.make_async_copy(gfeat_buf.at[i % 2],
                              gfeat_hbm.at[pl.ds(sc_ref[i], C), :],
                              osems.at[i % 2]).wait()

    @pl.when((i == nc - 1) & (nc >= 2)
             & (sv_ref[jnp.maximum(i - 1, 0)] > 0 if gate else i >= 0))
    def _():
        pltpu.make_async_copy(
            gfeat_buf.at[(i - 1) % 2],
            gfeat_hbm.at[pl.ds(sc_ref[jnp.maximum(i - 1, 0)], C), :],
            osems.at[(i - 1) % 2]).wait()


# --------------------------------------------------------------- tile sched
# One grid step per tile; a dynamic fori_loop walks the tile's chunks
# (count from scalar prefetch). Mirrors the CUDA per-tile thread-block
# structure (gaussian_render.cu:17-112) far more closely than the static
# chunk grid: no grid steps for padding, per-chunk fixed cost collapses to
# a loop iteration, and the transmittance early-out gates the math of the
# remaining chunks. Total inner iterations = live chunks only.


def _fwd_kernel_tile(ts_ref, tc_ref, feat_hbm, color_ref, alpha_ref,
                     t_run, feat_buf, sems, *, grid_w: int, ch: int, C: int,
                     th: int):
    t = pl.program_id(0)
    begin = ts_ref[t]
    cnt = tc_ref[t]
    nchunks = (cnt + C - 1) // C

    color_ref[:] = jnp.zeros_like(color_ref)
    t_run[:] = jnp.ones_like(t_run)
    basis = _make_basis(t, grid_w, th)

    @pl.when(nchunks > 0)
    def _():
        _feat_dma(feat_hbm, feat_buf, sems, 0, begin).start()

    def body(j, alive):
        # prefetch j+1 while j's math runs (last chunk reads into the next
        # tile's rows / the +C pad tail — masked by n_valid, always in
        # bounds). DMAs stay ungated on ``alive`` so wait-accounting is
        # trivial; a dead iteration costs ~a semaphore check.
        @pl.when(j + 1 < nchunks)
        def _():
            _feat_dma(feat_hbm, feat_buf, sems, (j + 1) % 2,
                      begin + (j + 1) * C).start()

        _feat_dma(feat_hbm, feat_buf, sems, j % 2, begin + j * C).wait()

        @pl.when(alive)
        def _():
            feat = feat_buf[j % 2].astype(jnp.float32)
            n_valid = jnp.minimum(cnt - j * C, C)
            (alpha, _, _, om, p_excl, contrib, w, t_new,
             _coef) = _blend_core(feat, basis, t_run[:], n_valid)
            if IMPL['colsum'] == 'mxu':
                cols = feat[:, 6:6 + ch]                          # (C, ch)
                color_ref[:] += jax.lax.dot_general(
                    cols, w, (((0,), (0,)), ((), ())),
                    precision=_mat_precision(),
                    preferred_element_type=jnp.float32)[None]     # (ch, P)
            else:
                for k in range(ch):
                    col_k = feat[:, 6 + k:7 + k]
                    color_ref[0, k, :] += jnp.sum(w * col_k, axis=0)
            t_run[:] = t_new
        return jnp.max(t_run[:]) >= T_EPS

    jax.lax.fori_loop(0, nchunks, body, True)
    alpha_ref[0, 0, :] = 1.0 - t_run[0]


def _bwd_kernel_tile(ts_ref, tc_ref, feat_hbm, gcolor_ref, galpha_ref,
                     cf_ref, af_ref, gfeat_hbm, t_run, c_run, pend,
                     feat_buf, gfeat_buf, sems, osems, *, grid_w: int,
                     ch: int, C: int, th: int):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    begin = ts_ref[t]
    cnt = tc_ref[t]
    nchunks = (cnt + C - 1) // C

    @pl.when(t == 0)
    def _():
        pend[0] = 0
        pend[1] = 0

    @pl.when(nchunks > 0)
    def _():
        _feat_dma(feat_hbm, feat_buf, sems, 0, begin).start()

    # Drain the previous tiles' outstanding grad stores BEFORE issuing ours:
    # their zeroed last-chunk tails overlap our first rows, and two in-flight
    # DMAs to overlapping HBM are unordered. The chunk-0 feature DMA is
    # already in flight, hiding the (almost always already-complete) drain.
    for s in (0, 1):
        @pl.when((nchunks > 0) & (pend[s] > 0))
        def _(s=s):
            pltpu.make_async_copy(
                gfeat_buf.at[s], gfeat_hbm.at[pl.ds(begin, C), :],
                osems.at[s]).wait()  # descriptor only fixes the size
            pend[s] = 0

    t_run[:] = jnp.ones_like(t_run)
    c_run[:] = jnp.zeros_like(c_run)
    basis = _make_basis(t, grid_w, th)
    cx, cy, u, v, X = basis

    tf = 1.0 - af_ref[0, 0:1, :]                                   # (1, P)
    g_alpha_out = galpha_ref[0, 0:1, :]                            # (1, P)
    Gout = gcolor_ref[0]                                           # (ch, P)
    # D = sum_k gout_k * cf_k: the per-tile constant of the combined suffix
    # term (all per-channel suffix passes collapse by linearity of cumsum)
    D = jnp.sum(Gout * cf_ref[0], axis=0, keepdims=True)           # (1, P)

    def body(j, alive):
        s = j % 2

        @pl.when(j + 1 < nchunks)
        def _():
            _feat_dma(feat_hbm, feat_buf, sems, (j + 1) % 2,
                      begin + (j + 1) * C).start()

        _feat_dma(feat_hbm, feat_buf, sems, s, begin + j * C).wait()

        # this slot's previous store (chunk j-2) must drain before we
        # overwrite its buffer (pend[s] is 0 or 1 by construction)
        @pl.when(pend[s] > 0)
        def _():
            pltpu.make_async_copy(
                gfeat_buf.at[s], gfeat_hbm.at[pl.ds(begin, C), :],
                osems.at[s]).wait()
            pend[s] = 0

        n_valid = jnp.minimum(cnt - j * C, C)

        @pl.when(alive)
        def _():
            feat = feat_buf[s].astype(jnp.float32)
            (alpha, alpha_raw, keep, om, p_excl, contrib, w, t_new,
             (a, b, c, o, xl, yl)) = _blend_core(feat, basis, t_run[:],
                                                 n_valid)
            inv_om = 1.0 / om                                      # (C, P)
            cols = feat[:, 6:6 + ch]                               # (C, ch)
            # B = sum_k col_k * gout_k — one matmul instead of ch passes
            Bm = jax.lax.dot_general(
                cols, Gout, (((1,), (0,)), ((), ())),
                precision=_mat_precision(),
                preferred_element_type=jnp.float32)                # (C, P)
            wB = w * Bm
            S_incl = _cumsum_sublanes(wB)                          # (C, P)
            # sum_k gout_k * s_k = D - r - S_incl  (r carries prior chunks)
            g_alpha_e = g_alpha_out * tf * inv_om + Bm * p_excl \
                - (D - c_run[0:1, :] - S_incl) * inv_om
            g_alpha_e = jnp.where(contrib & keep, g_alpha_e, 0.0)
            g_power = alpha_raw * g_alpha_e                        # (C, P)

            if IMPL['moments'] == 'mxu':
                # all five per-pair gradient sums are pixel moments of
                # g_power: one [C,P]@[P,8] matmul + [C,1] recombination
                M = jax.lax.dot_general(
                    g_power, X, (((1,), (1,)), ((), ())),
                    precision=_mat_precision(),
                    preferred_element_type=jnp.float32)            # (C, 8)
                Muu = M[:, 0:1]
                Mvv = M[:, 1:2]
                Muv = M[:, 2:3]
                Mu = M[:, 3:4]
                Mv = M[:, 4:5]
                M1 = M[:, 5:6]
                sdx = Mu - xl * M1
                sdy = Mv - yl * M1
                sdxx = Muu - 2.0 * xl * Mu + xl * xl * M1
                sdxy = Muv - xl * Mv - yl * Mu + xl * yl * M1
                sdyy = Mvv - 2.0 * yl * Mv + yl * yl * M1
                gx = a * sdx + b * sdy
                gy = c * sdy + b * sdx
                ga = -0.5 * sdxx
                gb = -sdxy
                gc = -0.5 * sdyy
                # g * g_alpha_e = g_power / o (alpha_raw = o * g); padding
                # rows have o = 0 -> g_power = 0 -> 0
                go = M1 / jnp.maximum(o, 1e-12)
            else:
                dx = (cx + u) - feat[:, 0:1]
                dy = (cy + v) - feat[:, 1:2]
                gx = jnp.sum((a * dx + b * dy) * g_power, axis=1,
                             keepdims=True)
                gy = jnp.sum((c * dy + b * dx) * g_power, axis=1,
                             keepdims=True)
                ga = jnp.sum(-0.5 * dx * dx * g_power, axis=1, keepdims=True)
                gb = jnp.sum(-dx * dy * g_power, axis=1, keepdims=True)
                gc = jnp.sum(-0.5 * dy * dy * g_power, axis=1, keepdims=True)
                go = jnp.sum(g_power * jnp.where(
                    o > 0, 1.0 / jnp.maximum(o, 1e-12), 0.0), axis=1,
                    keepdims=True)
            gcols = jax.lax.dot_general(
                w, Gout, (((1,), (1,)), ((), ())),
                precision=_mat_precision(),
                preferred_element_type=jnp.float32)                # (C, ch)
            c_run[0:1, :] += S_incl[C - 1:C, :]
            pad = jnp.zeros((C, NUM_FEAT - 6 - ch), feat.dtype)
            grads = jnp.concatenate([gx, gy, ga, gb, gc, go, gcols, pad],
                                    axis=1)
            # zero the tail: rows past n_valid belong to the NEXT tile's
            # segment, which re-writes them after the start-of-program drain
            row = jax.lax.broadcasted_iota(jnp.int32, grads.shape, 0)
            gfeat_buf[s] = jnp.where(row < n_valid, grads, 0.0)
            t_run[:] = t_new

        @pl.when(jnp.logical_not(alive))
        def _():
            # saturated: remaining entries have zero grad, but their HBM
            # rows must still be cleared (the buffer is uninitialized)
            gfeat_buf[s] = jnp.zeros_like(gfeat_buf[s])

        pltpu.make_async_copy(
            gfeat_buf.at[s], gfeat_hbm.at[pl.ds(begin + j * C, C), :],
            osems.at[s]).start()
        pend[s] = pend[s] + 1
        return jnp.max(t_run[:]) >= T_EPS

    jax.lax.fori_loop(0, nchunks, body, True)

    # end of grid: drain whatever is still in flight (pend[s] <= 1)
    @pl.when(t == nt - 1)
    def _():
        for s in (0, 1):
            @pl.when(pend[s] > 0)
            def _(s=s):
                pltpu.make_async_copy(
                    gfeat_buf.at[s], gfeat_hbm.at[pl.ds(begin, C), :],
                    osems.at[s]).wait()
                pend[s] = 0


def _pallas_forward_tile(feat_s, tile_start, tile_count, cfg: RasterConfig,
                         ch: int):
    T = cfg.num_tiles
    C = cfg.chunk
    P = cfg.pix_per_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=[
            pl.BlockSpec((1, ch, P), lambda t, ts, tc: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, ts, tc: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((2, C, NUM_FEAT), _feat_dtype()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    color, alpha = pl.pallas_call(
        functools.partial(_fwd_kernel_tile, grid_w=cfg.grid_w, ch=ch, C=C,
                          th=cfg.tile_h),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, ch, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ],
        interpret=INTERPRET,
    )(tile_start, tile_count, feat_s)
    return color, alpha


def _pallas_backward_tile(feat_s, tile_start, tile_count, color, alpha,
                          g_color, g_alpha, cfg: RasterConfig, ch: int):
    T = cfg.num_tiles
    C = cfg.chunk
    P = cfg.pix_per_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((1, ch, P), lambda t, ts, tc: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, ts, tc: (t, 0, 0)),
            pl.BlockSpec((1, ch, P), lambda t, ts, tc: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, ts, tc: (t, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((2, C, NUM_FEAT), _feat_dtype()),
            pltpu.VMEM((2, C, NUM_FEAT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (gfeat,) = pl.pallas_call(
        functools.partial(_bwd_kernel_tile, grid_w=cfg.grid_w, ch=ch, C=C,
                          th=cfg.tile_h),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(feat_s.shape, jnp.float32)],
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_count, feat_s, g_color, g_alpha, color, alpha)
    return gfeat


def _pallas_forward(feat_s, chunk_tile, chunk_start, chunk_valid, chunk_src,
                    cfg: RasterConfig, ch: int):
    nc = num_chunks(cfg)
    T = cfg.num_tiles
    C = cfg.chunk
    P = cfg.pix_per_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=[
            pl.BlockSpec((1, ch, P), lambda i, ct, cs, sv, sc: (ct[i], 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, ct, cs, sv, sc: (ct[i], 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((2, C, NUM_FEAT), _feat_dtype()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    color, alpha = pl.pallas_call(
        functools.partial(_fwd_kernel, grid_w=cfg.grid_w, ch=ch,
                          th=cfg.tile_h),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, ch, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ],
        interpret=INTERPRET,
    )(chunk_tile, chunk_start, chunk_valid, chunk_src, feat_s)
    return color, alpha


def _pallas_backward(feat_s, chunk_tile, chunk_start, chunk_valid, chunk_src,
                     color, alpha, g_color, g_alpha, cfg: RasterConfig,
                     ch: int):
    nc = num_chunks(cfg)
    C = cfg.chunk
    P = cfg.pix_per_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((1, ch, P), lambda i, ct, cs, sv, sc: (ct[i], 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, ct, cs, sv, sc: (ct[i], 0, 0)),
            pl.BlockSpec((1, ch, P), lambda i, ct, cs, sv, sc: (ct[i], 0, 0)),
            pl.BlockSpec((1, 1, P), lambda i, ct, cs, sv, sc: (ct[i], 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((ch, P), jnp.float32),
            pltpu.VMEM((2, C, NUM_FEAT), _feat_dtype()),
            pltpu.VMEM((2, C, NUM_FEAT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (gfeat,) = pl.pallas_call(
        functools.partial(_bwd_kernel, grid_w=cfg.grid_w, ch=ch,
                          th=cfg.tile_h),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(feat_s.shape, jnp.float32)],
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(chunk_tile, chunk_start, chunk_valid, chunk_src, feat_s,
      g_color, g_alpha, color, alpha)
    return gfeat


def blend_chunks_pallas(binned: BinnedSplats, xys, conic, opa, col,
                        cfg: RasterConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tile_color [T, P, ch], tile_alpha [T, P]) like blend_xla.

    ``binned.sort_gauss`` holds depth-rank ids; the padded per-gaussian
    attributes are brought into depth order here ([n]-sized gathers whose
    autodiff transpose routes the rank-space grads from the custom VJP back
    to the original rows — this replaced a [K]-sized id gather in binning).
    """
    do = binned.depth_order
    return _blend_custom(binned.sort_gauss, binned.chunk_tile,
                         binned.chunk_start_flag, binned.chunk_valid,
                         binned.chunk_src, binned.tile_start,
                         binned.tile_count, binned.tile_nonempty,
                         xys[do], conic[do], opa[do], col[do], cfg)


def _build_feat_sorted(sort_gauss, xys, conic, opa, col):
    """[K_io, NUM_FEAT] tile-sorted splat features (one row gather)."""
    if IMPL['stage_bf16'] and not INTERPRET:
        raise NotImplementedError(
            "stage_bf16: Mosaic cannot dynamically slice packed-bf16 HBM "
            "memrefs at chunk offsets (tpu.memref_slice verification "
            "failure on v5e); interpret-mode only — see IMPL comment")
    ch = col.shape[-1]
    feat = jnp.concatenate([
        xys, conic, opa[:, None], col,
        jnp.zeros((xys.shape[0], NUM_FEAT - 6 - ch), xys.dtype)
    ], axis=-1)
    if IMPL['stage_bf16']:
        feat = feat.astype(jnp.bfloat16)  # halves the gather + DMA bytes
    return feat[sort_gauss]


@functools.partial(jax.custom_vjp, nondiff_argnums=(12,))
def _blend_custom(sort_gauss, chunk_tile, chunk_start, chunk_valid, chunk_src,
                  tile_start, tile_count, tile_nonempty, xys, conic, opa, col,
                  cfg: RasterConfig):
    out, _ = _blend_fwd(sort_gauss, chunk_tile, chunk_start, chunk_valid,
                        chunk_src, tile_start, tile_count, tile_nonempty,
                        xys, conic, opa, col, cfg)
    return out


def _blend_fwd(sort_gauss, chunk_tile, chunk_start, chunk_valid, chunk_src,
               tile_start, tile_count, tile_nonempty, xys, conic, opa, col,
               cfg: RasterConfig):
    ch = col.shape[-1]
    assert ch <= NUM_FEAT - 6, f"too many color channels: {ch}"
    feat_s = _build_feat_sorted(sort_gauss, xys, conic, opa, col)
    if IMPL['schedule'] == 'tile':
        # empty tiles zero their own blocks in-kernel: no masking needed
        color, alpha = _pallas_forward_tile(feat_s, tile_start, tile_count,
                                            cfg, ch)
    else:
        color, alpha = _pallas_forward(feat_s, chunk_tile, chunk_start,
                                       chunk_valid, chunk_src, cfg, ch)
        # empty tiles were never visited -> mask their garbage blocks
        ne = tile_nonempty[:, None, None]
        color = jnp.where(ne, color, 0.0)
        alpha = jnp.where(ne, alpha, 0.0)
    # public layout: (T, P, ch) to match blend_xla
    out = (color.transpose(0, 2, 1), alpha[:, 0, :])
    residuals = (sort_gauss, chunk_tile, chunk_start, chunk_valid, chunk_src,
                 tile_start, tile_count, feat_s, color, alpha, xys.shape[0])
    return out, residuals


def _blend_bwd(cfg, residuals, cotangents):
    (sort_gauss, chunk_tile, chunk_start, chunk_valid, chunk_src,
     tile_start, tile_count, feat_s, color, alpha, n_rows) = residuals
    g_tile_color, g_tile_alpha = cotangents
    ch = color.shape[1]
    g_color = g_tile_color.transpose(0, 2, 1)  # (T, ch, P)
    g_alpha = g_tile_alpha[:, None, :]         # (T, 1, P)
    if IMPL['schedule'] == 'tile':
        gfeat = _pallas_backward_tile(feat_s, tile_start, tile_count,
                                      color, alpha, g_color, g_alpha,
                                      cfg, ch)
    else:
        gfeat = _pallas_backward(feat_s, chunk_tile, chunk_start, chunk_valid,
                                 chunk_src, color, alpha, g_color, g_alpha,
                                 cfg, ch)
    # scatter-add per-entry grads back to (N+1)-padded rows (the CUDA
    # atomicAdd equivalent, conflict-free by construction); only the real
    # feature columns — the 128-lane padding carries no gradient
    reduce_kind = IMPL['grad_reduce']
    if reduce_kind == 'auto':
        # measured crossover (v5e, kernel_lab round 3): the payload sort
        # amortizes only at large pair counts — cap 2^17/n=20k: scatter
        # 3.97 vs sorted 4.47 ms; cap 2^20/n=100k: sorted 25.2 vs 25.8 ms
        reduce_kind = 'sorted' if sort_gauss.shape[0] >= 2 ** 19 else 'scatter'
    if reduce_kind == 'sorted':
        # bring entries into ascending-rank order first: a sorted
        # segment_sum reduces contiguous runs instead of random-index
        # read-modify-writes (sum order differs from 'scatter' only in
        # f32 association)
        kk = sort_gauss.shape[0]
        ids_sorted, perm = jax.lax.sort(
            (sort_gauss, jnp.arange(kk, dtype=jnp.int32)), num_keys=1)
        # NOTE: gather-then-slice is the measured winner (A/B on v5e at
        # 800^2/cap 2^19: 7.85 ms overhead vs 9.99 for slice-then-gather —
        # narrow 9-lane rows gather worse than full 128-lane rows)
        gsum = jax.ops.segment_sum(gfeat[perm][:, :6 + ch], ids_sorted,
                                   num_segments=n_rows,
                                   indices_are_sorted=True)
    else:
        gsum = jax.ops.segment_sum(gfeat[:, :6 + ch], sort_gauss,
                                   num_segments=n_rows)
    g_xys = gsum[:, 0:2]
    g_conic = gsum[:, 2:5]
    g_opa = gsum[:, 5]
    g_col = gsum[:, 6:6 + ch]
    zero_int = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    zero_ne = np.zeros((color.shape[0],), dtype=jax.dtypes.float0)
    return (zero_int(sort_gauss), zero_int(chunk_tile), zero_int(chunk_start),
            zero_int(chunk_valid), zero_int(chunk_src), zero_int(tile_start),
            zero_int(tile_count), zero_ne, g_xys, g_conic, g_opa, g_col)


_blend_custom.defvjp(_blend_fwd, _blend_bwd)
