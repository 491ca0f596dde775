"""Config system: YAML with __base__ inheritance, deep merge, CLI overrides.

Parity target: /root/reference/my_ext/config.py — ``_load_from_yaml``
(:54-74) resolves ``__base__`` (str or list) recursively and deep-merges;
``__replace__: true`` in a sub-dict replaces instead of merging; precedence
resume < yaml < command line (:91-113). CLI overrides use dotted keys:
``--set train.epochs=100 model.num_superpoints=256``.
"""
from __future__ import annotations

import copy
import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import yaml


def deep_merge(base: Dict[str, Any], overlay: Dict[str, Any]) -> Dict[str, Any]:
    """Merge overlay into base (overlay wins); ``__replace__`` skips merging."""
    out = copy.deepcopy(base)
    for k, v in overlay.items():
        if k == '__replace__':
            continue
        if (isinstance(v, dict) and isinstance(out.get(k), dict)
                and not v.get('__replace__', False)):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_yaml(path: str | Path) -> Dict[str, Any]:
    path = Path(path)
    with path.open() as f:
        cfg = yaml.safe_load(f) or {}
    bases = cfg.pop('__base__', None)
    if bases is None:
        return cfg
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for b in bases:
        merged = deep_merge(merged, load_yaml(path.parent / b))
    return deep_merge(merged, cfg)


def parse_value(s: str) -> Any:
    """Parse a CLI override value: JSON first, then yaml scalar fallback."""
    try:
        return json.loads(s)
    except (json.JSONDecodeError, ValueError):
        return yaml.safe_load(s)


def apply_overrides(cfg: Dict[str, Any], overrides: Sequence[str]
                    ) -> Dict[str, Any]:
    """Apply ``a.b.c=value`` strings."""
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        if '=' not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        key, _, val = ov.partition('=')
        parts = key.split('.')
        node = cfg
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = parse_value(val)
    return cfg


def make_config(yaml_path: Optional[str] = None,
                overrides: Sequence[str] = ()) -> Dict[str, Any]:
    cfg: Dict[str, Any] = {}
    if yaml_path:
        cfg = load_yaml(yaml_path)
    return apply_overrides(cfg, overrides)


def save_config(cfg: Dict[str, Any], path: str | Path):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open('w') as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
