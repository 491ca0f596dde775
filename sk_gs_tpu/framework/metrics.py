"""Image metrics: PSNR / SSIM / MS-SSIM (+ optional LPIPS via torch-cpu).

Parity target: ``ImageMetric`` (/root/reference/my_ext/metrics/image_metric.py:14):
PSNR, SSIM, MS-SSIM, LPIPS(alex/vgg) aggregated over the eval split with a
best-metric tracker (MetricManager, my_ext/metrics/build.py:32).

PSNR/SSIM/MS-SSIM are pure JAX (device-side). LPIPS is the pure-JAX
implementation in ``lpips_jax`` (AlexNet/VGG16 feature stacks + lin
calibration, reference math from my_ext/metrics/lpipsPyTorch): calibrated
when ``weights/lpips_{net}.npz`` is vendored, else the torch 'lpips'
package when importable, else a documented deterministic untrained
fallback — always finite. ``lpips_mode(net)`` reports which path is live.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.losses import psnr, ssim, _gaussian_window

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _ssim_components(x: jnp.ndarray, y: jnp.ndarray, window_size: int = 11):
    """Returns (mean luminance-contrast term l, contrast-structure term cs)."""
    import jax.lax as lax
    c = x.shape[1]
    # separable window (outer(g,g)): two 1-D VALID passes == the 2-D VALID
    # conv exactly, at 11x fewer MACs (see models/losses.ssim)
    g1 = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
                / (2.0 * 1.5 ** 2)).astype(np.float32)
    g1 /= g1.sum()
    wh = jnp.tile(jnp.asarray(g1)[None, None, :, None], (c, 1, 1, 1))
    ww = jnp.tile(jnp.asarray(g1)[None, None, None, :], (c, 1, 1, 1))

    def conv(z):
        z = lax.conv_general_dilated(
            z, wh, (1, 1), 'VALID', feature_group_count=c,
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
        return lax.conv_general_dilated(
            z, ww, (1, 1), 'VALID', feature_group_count=c,
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'))

    mu1, mu2 = conv(x), conv(y)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(x * x) - mu1_sq
    s2 = conv(y * y) - mu2_sq
    s12 = conv(x * y) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    l = (2 * mu12 + C1) / (mu1_sq + mu2_sq + C1)
    cs = (2 * s12 + C2) / (s1 + s2 + C2)
    return jnp.mean(l * cs), jnp.mean(cs)


def ms_ssim(img1: jnp.ndarray, img2: jnp.ndarray, levels: int = 5) -> jnp.ndarray:
    """Multi-scale SSIM (Wang et al. 2003), [H, W, C] or [B, H, W, C].

    Levels are clamped so the coarsest scale still fits the 11x11 SSIM
    window (tiny debug scenes would otherwise produce empty VALID convs ->
    NaN); weights are renormalized over the used levels."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    x = jnp.transpose(img1, (0, 3, 1, 2))
    y = jnp.transpose(img2, (0, 3, 1, 2))
    min_hw = min(x.shape[2], x.shape[3])
    while levels > 1 and (min_hw >> (levels - 1)) < 11:
        levels -= 1
    weights = _MSSSIM_WEIGHTS[:levels]
    wsum = sum(weights)
    weights = tuple(w / wsum for w in weights)
    vals: List[jnp.ndarray] = []
    for i in range(levels):
        ssim_full, cs = _ssim_components(x, y)
        vals.append(ssim_full if i == levels - 1 else cs)
        if i < levels - 1:
            # 2x average-pool downscale
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 2, 2),
                                      (1, 1, 2, 2), 'VALID') / 4.0
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 1, 2, 2),
                                      (1, 1, 2, 2), 'VALID') / 4.0
    out = jnp.ones(())
    for v, wgt in zip(vals, weights):
        out = out * jnp.maximum(v, 0.0) ** wgt
    return out


_lpips_models: Dict[str, object] = {}


def lpips_mode(net: str = 'alex') -> str:
    """Which LPIPS path is live: 'calibrated-npz' | 'torch-lpips' |
    'untrained-fallback'."""
    from .lpips_jax import lpips_mode as jax_mode
    mode = jax_mode(net)
    if mode == 'calibrated-npz':
        return mode
    try:
        import lpips as _lpips_pkg  # noqa: F401
        return 'torch-lpips'
    except Exception:
        return mode


def lpips(img1: np.ndarray, img2: np.ndarray, net: str = 'alex') -> float:
    """LPIPS. Priority: vendored calibrated npz (pure JAX) > torch 'lpips'
    package > deterministic untrained-fallback (pure JAX, finite)."""
    from . import lpips_jax
    mode = lpips_mode(net)
    if mode == 'torch-lpips':
        try:
            import torch
            import lpips as lpips_pkg
            if net not in _lpips_models:
                _lpips_models[net] = lpips_pkg.LPIPS(net=net, verbose=False)
            model = _lpips_models[net]
            with torch.no_grad():
                a = torch.from_numpy(np.asarray(img1, np.float32)).permute(2, 0, 1)[None] * 2 - 1
                b = torch.from_numpy(np.asarray(img2, np.float32)).permute(2, 0, 1)[None] * 2 - 1
                return float(model(a, b))
        except Exception:
            pass  # e.g. package importable but weights not downloadable
    return lpips_jax.lpips(img1, img2, net=net)


class MetricManager:
    """Aggregates metrics over an eval epoch with best tracking
    (my_ext/metrics/build.py:32 parity)."""

    def __init__(self, main_metric: str = 'PSNR', goal: str = 'max',
                 with_lpips: bool = False):
        self.main_metric = main_metric
        self.goal = goal
        self.with_lpips = with_lpips
        self.best: Optional[float] = None
        self.reset()

    def reset(self):
        self._sums: Dict[str, float] = {}
        self._count = 0

    def update(self, pred: jnp.ndarray, gt: jnp.ndarray):
        vals = {
            'PSNR': float(psnr(pred, gt)),
            'SSIM': float(ssim(pred[..., :3], gt[..., :3])),
            'MS-SSIM': float(ms_ssim(pred[..., :3], gt[..., :3])),
        }
        if self.with_lpips:
            vals['LPIPS'] = lpips(np.asarray(pred[..., :3]),
                                  np.asarray(gt[..., :3]))
        for k, v in vals.items():
            self._sums[k] = self._sums.get(k, 0.0) + v
        self._count += 1

    def summarize(self) -> Dict[str, float]:
        out = {k: v / max(self._count, 1) for k, v in self._sums.items()}
        main = out.get(self.main_metric)
        if main is not None:
            improved = (self.best is None
                        or (main > self.best if self.goal == 'max'
                            else main < self.best))
            if improved:
                self.best = main
            out['is_best'] = float(improved)
        return out
