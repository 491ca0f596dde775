"""View samplers for the training loop.

Parity targets (/root/reference/data_loader/):
- ``IterableBatchSampler`` (batch_samplers.py:119): infinite uniform stream;
- ``TimeIncrementalBatchSampler`` (ti_batch_sampler.py:12): the usable time
  window widens with training progress over stages;
- ``CanonicalBatchSampler`` (canonical_batch_sampler.py:10): oversample the
  canonical frame with an annealed probability.

All host-side (they pick a view index per step). Unlike the reference's
stateful torch samplers, draws are STEP-KEYED: ``sample(step)`` derives its
RNG from (seed, step, draw#), so a resumed run reproduces the exact view
sequence of an uninterrupted one — no sampler state in checkpoints.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class _StepKeyed:
    """Deterministic per-(seed, step, draw) RNG. Repeated calls at the same
    step (grad-accumulation batches) advance the draw counter."""

    def __init__(self, seed: int):
        self.seed = int(seed)
        self._last_step = None
        self._draw = 0

    def _rng(self, step: int) -> np.random.Generator:
        if step != self._last_step:
            self._last_step = step
            self._draw = 0
        rng = np.random.default_rng((self.seed, int(step), self._draw))
        self._draw += 1
        return rng


class UniformSampler(_StepKeyed):
    """Infinite uniform view stream (IterableBatchSampler parity)."""

    def __init__(self, num_views: int, seed: int = 0):
        super().__init__(seed)
        self.num_views = num_views

    def sample(self, step: int) -> int:
        return int(self._rng(step).integers(0, self.num_views))


class TimeIncrementalSampler(_StepKeyed):
    """Widening time window: at progress p in [0, 1] only views with
    time <= max(t_min, p) are sampled (TimeIncrementalBatchSampler)."""

    def __init__(self, times: np.ndarray, total_steps: int,
                 warmup_steps: int = 0, t_min: float = 0.1, seed: int = 0):
        super().__init__(seed)
        self.times = np.asarray(times)
        self.total_steps = max(total_steps, 1)
        self.warmup_steps = warmup_steps
        self.t_min = t_min

    def sample(self, step: int) -> int:
        if step <= self.warmup_steps:
            window = self.t_min
        else:
            p = (step - self.warmup_steps) / max(
                self.total_steps - self.warmup_steps, 1)
            window = max(self.t_min, min(p, 1.0))
        eligible = np.flatnonzero(self.times <= window + 1e-9)
        if len(eligible) == 0:
            eligible = np.asarray([int(np.argmin(self.times))])
        return int(self._rng(step).choice(eligible))


class CanonicalSampler(_StepKeyed):
    """Oversample the canonical frame with annealed probability
    p(step) = p0 * (1 - step/anneal_steps), else uniform
    (CanonicalBatchSampler parity)."""

    def __init__(self, num_views: int, canonical_ids: Sequence[int],
                 p0: float = 0.3, anneal_steps: int = 10000, seed: int = 0):
        super().__init__(seed)
        self.num_views = num_views
        self.canonical_ids = np.asarray(list(canonical_ids))
        self.p0 = p0
        self.anneal_steps = max(anneal_steps, 1)

    def sample(self, step: int) -> int:
        rng = self._rng(step)
        p = self.p0 * max(0.0, 1.0 - step / self.anneal_steps)
        if len(self.canonical_ids) and rng.random() < p:
            return int(rng.choice(self.canonical_ids))
        return int(rng.integers(0, self.num_views))


def make_sampler(kind: str, num_views: int, times: Optional[np.ndarray] = None,
                 canonical_ids: Sequence[int] = (), total_steps: int = 1,
                 seed: int = 0, **kwargs):
    kind = (kind or 'uniform').lower()
    if kind in ('uniform', 'iterable', 'shuffle'):
        return UniformSampler(num_views, seed)
    if kind in ('time_incremental', 'ti'):
        return TimeIncrementalSampler(times, total_steps, seed=seed, **kwargs)
    if kind == 'canonical':
        return CanonicalSampler(num_views, canonical_ids, seed=seed, **kwargs)
    raise KeyError(f'unknown sampler {kind}')
