"""ctypes loader for the native planner (see planner.cc).

Builds the shared library lazily with the system C++ compiler on first
import (single translation unit, no third-party deps) and caches the
binary next to the source.  Exposes ``greedy_color_native`` — or
``None`` when no compiler/binary is available, in which case
``myfm_tpu.design`` falls back to the pure-numpy implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "planner.cc")
_EXT = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
_LIB = os.path.join(_HERE, "_planner" + _EXT)


def _build() -> bool:
    for cxx in (os.environ.get("CXX"), "g++", "clang++", "c++"):
        if not cxx:
            continue
        cmd = [cxx, "-O3", "-std=c++14", "-shared", "-fPIC", _SRC,
               "-o", _LIB]
        try:
            res = subprocess.run(
                cmd, capture_output=True, timeout=120
            )
        except (OSError, subprocess.TimeoutExpired):
            continue
        if res.returncode == 0 and os.path.exists(_LIB):
            return True
    return False


def _load():
    if not os.path.exists(_LIB) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    fn = lib.myfm_greedy_color
    fn.restype = None
    fn.argtypes = [
        ctypes.c_int64,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    return fn


_fn = _load()

if _fn is None:  # pragma: no cover - depends on toolchain availability
    greedy_color_native = None
else:

    def greedy_color_native(
        n_rows: int, n_cols: int, indptr, indices
    ) -> np.ndarray:
        """C++ greedy coloring; signature mirrors the numpy fallback in
        myfm_tpu.design.greedy_color."""
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        indices = np.ascontiguousarray(indices, dtype=np.int32)
        assign = np.zeros(n_cols, dtype=np.int32)
        _fn(n_rows, n_cols, indptr, indices, assign)
        return assign
