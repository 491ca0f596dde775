"""Positional encoders (frequency / none).

Parity target: ``FreqEncoder_torch``
(/root/reference/networks/encoders/freq_encoder.py:89-132): NeRF positional
encoding, log-sampled frequency bands 2^0..2^(degree-1), [x, sin(f_k x),
cos(f_k x)] concatenation with include_input=True by default.

The CUDA freq-encoder kernel (/root/reference/my_ext/_C/src/nerf/freqencoder.cu)
is unnecessary on TPU: this is trivially fused elementwise work for XLA.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FreqEncoder:
    """Static (hashable) config; call ``encode`` on arrays."""
    input_dim: int
    degree: int = 4
    include_input: bool = True
    scale: float = 1.0
    log_sampling: bool = True

    @property
    def output_dim(self) -> int:
        d = self.input_dim if self.include_input else 0
        return d + self.input_dim * self.degree * 2

    @property
    def freq_bands(self) -> Tuple[float, ...]:
        if self.degree == 0:
            return ()
        if self.log_sampling:
            bands = 2.0 ** np.linspace(0.0, self.degree - 1, self.degree)
        else:
            bands = np.linspace(1.0, 2.0 ** (self.degree - 1), self.degree)
        return tuple(float(b) * self.scale for b in bands)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        outs = [x] if self.include_input else []
        for f in self.freq_bands:
            xf = x * f
            outs.append(jnp.sin(xf))
            outs.append(jnp.cos(xf))
        if not outs:
            return x
        return jnp.concatenate(outs, axis=-1)


@dataclass(frozen=True)
class NoneEncoder:
    """Pass-through (reference NonePE, networks/encoders/base.py:15)."""
    input_dim: int

    @property
    def output_dim(self) -> int:
        return self.input_dim

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x


def make_encoder(kind: str, input_dim: int, **cfg):
    """Encoder factory (reference POSITION_ENCODERS registry,
    networks/encoders/base.py:13; only freq / none are registered in the
    active SK-GS path)."""
    kind = (kind or 'none').lower()
    if kind in ('freq', 'frequency', 'freq_torch', 'frequency_torch'):
        return FreqEncoder(input_dim=input_dim, **cfg)
    if kind in ('none', 'identity'):
        return NoneEncoder(input_dim=input_dim)
    raise KeyError(f"unknown position encoder: {kind}")
