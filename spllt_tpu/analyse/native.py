"""ctypes binding to the C++ symbolic-analysis fast paths.

The reference's analyse phase leans on native code (SPRAL SSIDS + METIS,
/root/reference/src/spllt_analyse_mod.F90:26-28).  Our native component is
native/symbolic.cpp, built into libspllt_symbolic.so; every entry point has a
NumPy fallback so the package works without the library.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    for cand in (
        os.path.join(here, "native", "libspllt_symbolic.so"),
        os.path.join(os.path.dirname(__file__), "libspllt_symbolic.so"),
    ):
        if os.path.exists(cand):
            try:
                _LIB = ctypes.CDLL(cand)
                break
            except OSError:
                pass
    return _LIB


def native_available() -> bool:
    return _load() is not None


def native_amd_or_none(a) -> np.ndarray | None:
    """AMD ordering via the native library, or None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "spllt_amd"):
        return None
    n = a.n
    colptr = np.ascontiguousarray(a.colptr, dtype=np.int64)
    rowind = np.ascontiguousarray(a.rowind, dtype=np.int64)
    perm = np.empty(n, dtype=np.int64)
    lib.spllt_amd.restype = ctypes.c_int
    rc = lib.spllt_amd(
        ctypes.c_int64(n),
        colptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rowind.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return perm


def native_etree_or_none(n, colptr, rowind) -> np.ndarray | None:
    """Elimination tree via the native library, or None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "spllt_etree"):
        return None
    colptr = np.ascontiguousarray(colptr, dtype=np.int64)
    rowind = np.ascontiguousarray(rowind, dtype=np.int64)
    parent = np.empty(n, dtype=np.int64)
    lib.spllt_etree.restype = ctypes.c_int
    rc = lib.spllt_etree(
        ctypes.c_int64(n),
        colptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rowind.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return parent
