"""Native (C++) host-side components, loaded via ctypes.

The reference ships its host logic inside a CUDA/pybind11 extension
(my_ext/_C). Here the host-side pieces (MST joint discovery) are a small
C++ shared library built on demand with g++; every entry point has a
numpy fallback so the framework runs without a toolchain.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = Path(__file__).parent / 'joint_discovery.cpp'
    lib_path = Path(__file__).parent / 'libjoint.so'
    try:
        if (not lib_path.exists()
                or lib_path.stat().st_mtime < src.stat().st_mtime):
            subprocess.run(
                ['g++', '-O2', '-shared', '-fPIC', '-o', str(lib_path),
                 str(src)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(lib_path))
        lib.joint_discovery.restype = ctypes.c_int
        lib.joint_discovery.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
        log.info('native joint_discovery loaded (%s)', lib_path)
    except Exception as e:  # fallback to numpy
        log.warning('native joint_discovery unavailable (%s); numpy fallback', e)
        _LIB = None
    return _LIB


def joint_discovery_native(cost: np.ndarray, alive: np.ndarray,
                           max_levels: int
                           ) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Returns (parents, depth, root) or None if the library is unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    m = cost.shape[0]
    cost_c = np.ascontiguousarray(cost, np.float32)
    alive_c = np.ascontiguousarray(alive, np.uint8)
    parents = np.zeros((m, max_levels), np.int32)
    depth = np.zeros((m,), np.int32)
    root = np.zeros((1,), np.int32)
    rc = lib.joint_discovery(
        cost_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        alive_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m, max_levels,
        parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        root.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    return parents, depth, int(root[0])
