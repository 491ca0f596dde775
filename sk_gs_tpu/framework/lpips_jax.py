"""Pure-JAX LPIPS (Learned Perceptual Image Patch Similarity).

Parity target: the reference's vendored lpipsPyTorch
(/root/reference/my_ext/metrics/lpipsPyTorch/modules/{lpips,networks,utils}.py):
z-score the input with the fixed shift/scale buffers, run the AlexNet / VGG16
feature stack, unit-normalize each tap across channels, take the squared
feature difference, apply the learned non-negative 1x1 "lin" calibration
convs, spatial-mean, and sum over taps. The reference feeds images in
[0, 1] directly to the z-score (image_metric.py:73-97) — we mirror that
convention exactly.

Weights resolve in priority order:

1. **Calibrated** — a vendored npz at ``weights/lpips_{net}.npz`` (repo
   root), produced by ``tools/export_lpips_weights.py`` on a machine with
   torchvision + the richzhang v0.1 lin weights. With it, values match the
   reference to float tolerance.
2. **Untrained fallback** — deterministic seeded He-init features with
   uniform (1/C) calibration. Random-feature perceptual distances are a
   known usable proxy (Zhang et al. 2018 report untrained nets already
   rank-correlate with human judgments); values are finite, deterministic,
   and comparable *within* this repo, but are NOT comparable to published
   LPIPS numbers. ``lpips_mode()`` reports which path is live so results
   files can label the column.

All compute is jitted JAX (NCHW convs on the MXU; no torch dependency).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# z-score buffers (networks.py:41-43)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# conv specs: (in_ch, out_ch, kernel, stride, padding); 'M' = 3x3/2 maxpool
# (alex) or 2x2/2 maxpool (vgg), matching torchvision .features exactly.
# A tap ('T') follows each spec-listed ReLU that LPIPS reads.
_ALEX_SPEC: Tuple = (
    (3, 64, 11, 4, 2), 'T', 'M',
    (64, 192, 5, 1, 2), 'T', 'M',
    (192, 384, 3, 1, 1), 'T',
    (384, 256, 3, 1, 1), 'T',
    (256, 256, 3, 1, 1), 'T',
)
_VGG_SPEC: Tuple = (
    (3, 64, 3, 1, 1), (64, 64, 3, 1, 1), 'T', 'M',
    (64, 128, 3, 1, 1), (128, 128, 3, 1, 1), 'T', 'M',
    (128, 256, 3, 1, 1), (256, 256, 3, 1, 1), (256, 256, 3, 1, 1), 'T', 'M',
    (256, 512, 3, 1, 1), (512, 512, 3, 1, 1), (512, 512, 3, 1, 1), 'T', 'M',
    (512, 512, 3, 1, 1), (512, 512, 3, 1, 1), (512, 512, 3, 1, 1), 'T',
)
_SPECS = {'alex': _ALEX_SPEC, 'vgg': _VGG_SPEC}
_POOL = {'alex': (3, 2), 'vgg': (2, 2)}
N_CHANNELS = {'alex': (64, 192, 384, 256, 256),
              'vgg': (64, 128, 256, 512, 512)}

_WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), '..', '..', 'weights')

_cache: Dict[str, Tuple[Dict[str, jnp.ndarray], str]] = {}


def _conv_specs(net: str) -> List[Tuple[int, int, int, int, int]]:
    return [s for s in _SPECS[net] if isinstance(s, tuple)]


def _init_fallback(net: str) -> Dict[str, np.ndarray]:
    """Deterministic seeded He-init feature weights + uniform calibration."""
    key = jax.random.PRNGKey(0x5B) if net == 'alex' else jax.random.PRNGKey(0x5C)
    params: Dict[str, np.ndarray] = {}
    for i, (cin, cout, k, _s, _p) in enumerate(_conv_specs(net)):
        key, sub = jax.random.split(key)
        std = float(np.sqrt(2.0 / (cin * k * k)))
        params[f'conv{i}_w'] = np.asarray(
            jax.random.normal(sub, (cout, cin, k, k), jnp.float32) * std)
        params[f'conv{i}_b'] = np.zeros((cout,), np.float32)
    for j, c in enumerate(N_CHANNELS[net]):
        params[f'lin{j}_w'] = np.full((c,), 1.0 / c, np.float32)
    return params


def load_weights(net: str) -> Tuple[Dict[str, jnp.ndarray], str]:
    """Returns (params, mode); mode in {'calibrated-npz', 'untrained-fallback'}."""
    if net in _cache:
        return _cache[net]
    path = os.path.join(_WEIGHTS_DIR, f'lpips_{net}.npz')
    if os.path.exists(path):
        with np.load(path) as z:
            params = {k: np.asarray(z[k], np.float32) for k in z.files}
        mode = 'calibrated-npz'
    else:
        params, mode = _init_fallback(net), 'untrained-fallback'
    # shape-validate against the architecture (catches stale npz files)
    for i, (cin, cout, k, _s, _p) in enumerate(_conv_specs(net)):
        assert params[f'conv{i}_w'].shape == (cout, cin, k, k), \
            (net, i, params[f'conv{i}_w'].shape)
    dev = {k: jnp.asarray(v) for k, v in params.items()}
    _cache[net] = (dev, mode)
    return _cache[net]


def lpips_mode(net: str = 'alex') -> str:
    return load_weights(net)[1]


def _features(params, x: jnp.ndarray, net: str) -> List[jnp.ndarray]:
    """Taps of the feature stack for NCHW input already z-scored."""
    pk, ps = _POOL[net]
    taps, ci = [], 0
    for s in _SPECS[net]:
        if s == 'M':
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, pk, pk), (1, 1, ps, ps),
                'VALID')
        elif s == 'T':
            # unit-normalize across channels (utils.normalize_activation)
            norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
            taps.append(x / (norm + 1e-10))
        else:
            _cin, _cout, _k, stride, pad = s
            x = jax.lax.conv_general_dilated(
                x, params[f'conv{ci}_w'], (stride, stride),
                [(pad, pad), (pad, pad)],
                dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
                precision=jax.lax.Precision.HIGHEST)
            x = jax.nn.relu(x + params[f'conv{ci}_b'][None, :, None, None])
            ci += 1
    return taps


@partial(jax.jit, static_argnames=('net',))
def _lpips_nchw(params, a: jnp.ndarray, b: jnp.ndarray, net: str) -> jnp.ndarray:
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    fa = _features(params, (a - shift) / scale, net)
    fb = _features(params, (b - shift) / scale, net)
    total = jnp.zeros((a.shape[0],), jnp.float32)
    for j, (xa, xb) in enumerate(zip(fa, fb)):
        d = (xa - xb) ** 2
        w = params[f'lin{j}_w'][None, :, None, None]
        total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(1, 2))
    return total


def lpips(img1, img2, net: str = 'alex') -> float:
    """LPIPS distance between two [H, W, 3] (or [B, H, W, 3]) images in
    [0, 1]. Matches the reference call convention
    (image_metric.py:96-97 feeds prepare_input'ed [0,1] tensors)."""
    params, _mode = load_weights(net)
    a = jnp.asarray(img1, jnp.float32)
    b = jnp.asarray(img2, jnp.float32)
    if a.ndim == 3:
        a, b = a[None], b[None]
    a = jnp.transpose(a, (0, 3, 1, 2))
    b = jnp.transpose(b, (0, 3, 1, 2))
    return float(jnp.mean(_lpips_nchw(params, a, b, net)))
