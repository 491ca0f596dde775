"""Checkpointing: named-object store with interval/max-keep rotation.

Parity target: ``CheckpointManager`` (/root/reference/my_ext/checkpoint.py:57):
store() named objects, interval saving with max-keep rotation and pinned
saves, resume restores by name. Shape changes across training (the reference
re-creates tensors at stored sizes, gaussian_splatting.py:430-441) are a
non-issue here: capacity-padded arrays keep static shapes.

Format: one .npz per checkpoint — flattened pytree leaves keyed by
'/'-joined paths + a JSON manifest of scalars.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np

log = logging.getLogger(__name__)


def _flatten(tree: Any, prefix: str = '') -> Dict[str, np.ndarray]:
    out = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        key = prefix + '/'.join(_path_str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _path_str(p) -> str:
    if hasattr(p, 'key'):
        return str(p.key)
    if hasattr(p, 'idx'):
        return str(p.idx)
    if hasattr(p, 'name'):
        return str(p.name)
    return str(p)


def save_pytree(tree: Any, path: Path):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrs = _flatten(tree)
    np.savez(path, **arrs)


def _is_per_point_key(key: str) -> bool:
    """True when a '/'-joined checkpoint key names a Gaussian-capacity
    leaf (eligible for the bucketed zero-pad on load)."""
    from ..models import capacity as cap_mod
    leaf = key.rsplit('/', 1)[-1]
    if leaf in cap_mod.PER_POINT_PARAMS or leaf in cap_mod.PER_POINT_FIELDS:
        return True
    # optimizer moments live under .../<moment>/<param-name>/... or map
    # param names directly; check the second-to-last segment too
    parts = key.split('/')
    return any(p in cap_mod.PER_POINT_PARAMS for p in parts[-3:])


def load_into_pytree(template: Any, path: Path) -> Any:
    """Load arrays into the structure of ``template`` (unknown keys ignored,
    missing keys keep template values)."""
    data = np.load(Path(path), allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for pth, leaf in flat:
        key = '/'.join(_path_str(p) for p in pth)
        if key in data.files:
            arr = data[key]
            tshape = np.shape(leaf)
            if arr.shape != tshape:
                # capacity-bucketed checkpoints are SMALLER in the leading
                # (Gaussian) axis than a full-capacity template: pad with
                # zeros (bool pads False = dead rows). Restricted to known
                # per-point leaf names — any OTHER mismatch (fewer frames,
                # different superpoint count, …) is a config mismatch and
                # keeps the template with a warning, not a silent pad.
                if (_is_per_point_key(key)
                        and len(arr.shape) == len(tshape) and len(tshape) >= 1
                        and arr.shape[0] < tshape[0]
                        and arr.shape[1:] == tshape[1:]):
                    pad = np.zeros((tshape[0] - arr.shape[0],)
                                   + arr.shape[1:], arr.dtype)
                    leaves.append(np.concatenate([arr, pad], axis=0))
                    log.info('ckpt %s: zero-padded %d -> %d rows '
                             '(capacity bucket)', key, arr.shape[0],
                             tshape[0])
                else:
                    log.warning('ckpt %s: shape %s != %s, keeping template',
                                key, arr.shape, np.shape(leaf))
                    leaves.append(leaf)
            else:
                leaves.append(arr)
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class CheckpointManager:
    def __init__(self, directory: str | Path, interval: int = 5000,
                 max_keep: int = 2, prefix: str = 'checkpoint'):
        self.dir = Path(directory)
        self.interval = interval
        self.max_keep = max_keep
        self.prefix = prefix
        self._managed: List[Path] = []

    def path_for(self, step: int) -> Path:
        return self.dir / f'{self.prefix}_{step:08d}.npz'

    def save(self, state: Dict[str, Any], step: int, force: bool = False,
             name: Optional[str] = None, manage: bool = True) -> Optional[Path]:
        if not force and (self.interval <= 0 or step % self.interval != 0):
            return None
        path = (self.dir / name) if name else self.path_for(step)
        meta = {'step': step}
        save_pytree({'state': state, 'meta': meta}, path)
        if manage and name is None:
            self._managed.append(path)
            while len(self._managed) > self.max_keep:
                old = self._managed.pop(0)
                old.unlink(missing_ok=True)
        log.info('saved checkpoint %s', path)
        return path

    def load(self, template: Dict[str, Any], path: Optional[str | Path] = None
             ) -> Dict[str, Any]:
        if path is None:
            cands = sorted(self.dir.glob(f'{self.prefix}_*.npz'))
            if not cands:
                raise FileNotFoundError(f'no checkpoints in {self.dir}')
            path = cands[-1]
        tree = load_into_pytree({'state': template, 'meta': {'step': 0}}, path)
        return tree

    def latest_step(self) -> int:
        cands = sorted(self.dir.glob(f'{self.prefix}_*.npz'))
        if not cands:
            return 0
        return int(cands[-1].stem.split('_')[-1])
