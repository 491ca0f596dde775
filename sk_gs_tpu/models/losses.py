"""Loss library: scheduled weights, L1/MSE image loss, SSIM.

Parity targets:
- ``LossDict`` weight scheduling (fix/linear/log over _steps/_values,
  /root/reference/networks/losses/build.py:11-97);
- ``ImageLoss`` l1/mse with optional mask (image_loss.py:6-33);
- ``SSIM_Loss``: 11x11 gaussian window sigma 1.5, same-padding depthwise
  convolution, C1=0.01^2 C2=0.03^2, returns 1 - mean(ssim_map) (ssim.py).

Weights are evaluated host-side per step (python floats) and passed into the
jitted step as traced scalars, so schedules never trigger recompiles.
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- schedules

class LossWeights:
    """Scheduled per-name loss weights (host-side)."""

    def __init__(self, cfg: Optional[dict] = None, default: float = 0.0):
        self.default = default
        self.entries: Dict[str, dict] = {}
        self._step = 0
        for name, c in (cfg or {}).items():
            if name == 'default':
                self.default = float(c)
                continue
            e = {'lambda': default, 'vary': 'fix', 'steps': [], 'values': []}
            if isinstance(c, (int, float, bool)):
                e['lambda'] = float(c)
            elif isinstance(c, dict):
                c = dict(c)
                e['lambda'] = float(c.pop('lambda', default))
                e['vary'] = c.pop('_vary', 'fix')
                e['steps'] = list(c.pop('_steps', []))
                e['values'] = [float(v) for v in c.pop('_values', [])]
                e['cfg'] = c  # extra per-loss config (e.g. image method)
            self.entries[name] = e

    def set_step(self, step: int):
        self._step = step

    def cfg(self, name: str) -> dict:
        return self.entries.get(name, {}).get('cfg', {})

    def ever_nonzero(self, name: str) -> bool:
        """True if this loss can ever have weight > 0 (graph inclusion)."""
        if name not in self.entries:
            return self.default > 0
        e = self.entries[name]
        return e['lambda'] > 0 or any(v > 0 for v in e['values'])

    def w(self, name: str) -> float:
        if name not in self.entries:
            return self.default
        e = self.entries[name]
        steps, values, vary = e['steps'], e['values'], e['vary']
        if not steps:
            return e['lambda']
        stage = int(np.sum(self._step >= np.asarray(steps)))
        if stage == len(steps):
            return max(0.0, values[-1])
        if stage == 0:
            return e['lambda']
        v1, v2 = values[stage - 1], values[stage]
        if v2 <= 0:
            return 0.0
        s1, s2 = steps[stage - 1], steps[stage]
        ratio = (self._step - s1) / max(s2 - s1, 1)
        if isinstance(vary, list):
            vary = vary[stage]
        if vary == 'fix':
            return v2
        if vary == 'linear':
            return v1 * (1 - ratio) + v2 * ratio
        if vary == 'log':
            return math.exp(math.log(v1) * (1 - ratio) + math.log(v2) * ratio)
        raise NotImplementedError(f"vary={vary}")


# ---------------------------------------------------------------- image losses

def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray,
            mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(jnp.abs(pred[..., :3] - gt[..., :3]))
    d = jnp.abs(pred[..., :3] * mask - gt[..., :3] * mask)
    return jnp.sum(d) / jnp.maximum(jnp.sum(mask), 1e-5)


def mse_loss(pred: jnp.ndarray, gt: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(jnp.square(pred[..., :3] - gt[..., :3]))
    d = jnp.square(pred[..., :3] * mask - gt[..., :3] * mask)
    return jnp.sum(d) / jnp.maximum(jnp.sum(mask), 1e-5)


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2.0 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         crop_border: bool = False) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] (or [B, H, W, C]) image pair.

    Default matches the reference (F.conv2d 'SAME' zero padding,
    /root/reference/networks/losses/ssim.py) which can exceed 1.0 in the
    padded border rows on near-perfect frames; ``crop_border=True`` means
    only the valid (fully-windowed) interior of the SSIM map, which is
    provably <= 1."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    # NCHW for depthwise conv
    x = jnp.transpose(img1, (0, 3, 1, 2))
    y = jnp.transpose(img2, (0, 3, 1, 2))
    c = x.shape[1]
    # SEPARABLE window: the Gaussian window is outer(g, g), so two 1-D
    # passes compute the identical 2-D convolution with k fewer MACs per
    # pixel. The fused 11x11 depthwise conv was the single largest op in
    # the bucketed train step (9.1 of 22.5 ms on v5e; grouped 2-D convs
    # don't map to the MXU) — separating cuts it to ~2 ms.
    g1 = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
                / (2.0 * 1.5 ** 2)).astype(np.float32)
    g1 /= g1.sum()
    wh = jnp.tile(jnp.asarray(g1)[None, None, :, None], (c, 1, 1, 1))
    ww = jnp.tile(jnp.asarray(g1)[None, None, None, :], (c, 1, 1, 1))

    import jax.lax as lax

    def conv(z):
        z = lax.conv_general_dilated(
            z, wh, window_strides=(1, 1), padding='SAME',
            feature_group_count=c,
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
        return lax.conv_general_dilated(
            z, ww, window_strides=(1, 1), padding='SAME',
            feature_group_count=c,
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'))

    mu1, mu2 = conv(x), conv(y)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(x * x) - mu1_sq
    s2 = conv(y * y) - mu2_sq
    s12 = conv(x * y) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / \
        ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    if crop_border:
        b = window_size // 2
        ssim_map = ssim_map[..., b:-b, b:-b]
    return jnp.mean(ssim_map)


def ssim_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return 1.0 - ssim(pred[..., :3], gt[..., :3])


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean(jnp.square(pred[..., :3] - gt[..., :3]))
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
