"""C-interface tests (reference parity: interfaces/C + example/C).

The full C round-trip (compile libspllt_tpu_c.so, compile the C example,
run it against the CPU backend in a fresh process) is gated behind
SPLLT_SLOW_TESTS because it builds native code; the Python glue layer is
tested directly (it is what the embedded interpreter calls).
"""

import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

from spllt_tpu.sparse.generators import poisson2d

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_capi_glue_roundtrip():
    """Drive spllt_tpu.capi exactly as native/capi.cpp does (raw pointers
    as integers)."""
    from spllt_tpu import capi

    a = poisson2d(8)
    n = a.n
    colptr = np.ascontiguousarray(a.colptr, dtype=np.int64)
    rowind = np.ascontiguousarray(a.rowind, dtype=np.int64)
    vals = np.ascontiguousarray(a.values, dtype=np.float64)

    h, nnzl, flops, nodes = capi.analyse_c(
        n, n + 1, colptr.ctypes.data, rowind.ctypes.data,
        16, 8, "natural", "scan", "highest", 2)
    assert h > 0 and nnzl > 0 and flops > 0 and nodes > 0
    assert capi.factor_c(h, vals.ctypes.data) == 0

    rng = np.random.default_rng(3)
    xt = rng.standard_normal((n, 2))
    b = a.matvec(xt)
    x = np.asfortranarray(b)            # column-major in/out buffer
    assert capi.solve_c(h, 2, x.ctypes.data, 0) == 0
    bwd = np.linalg.norm(a.matvec(np.ascontiguousarray(x)) - b) \
        / np.linalg.norm(b)
    assert bwd < 1e-12
    assert capi.free_c(h) == 0


def test_capi_solve_before_factor_fails():
    from spllt_tpu import capi

    a = poisson2d(6)
    colptr = np.ascontiguousarray(a.colptr, dtype=np.int64)
    rowind = np.ascontiguousarray(a.rowind, dtype=np.int64)
    h, *_ = capi.analyse_c(a.n, a.n + 1, colptr.ctypes.data,
                           rowind.ctypes.data, 16, 8, "natural", "scan",
                           "highest", 0)
    x = np.zeros(a.n)
    assert capi.solve_c(h, 1, x.ctypes.data, 0) == -2
    capi.free_c(h)


@pytest.mark.skipif(
    os.environ.get("SPLLT_SLOW_TESTS", "") == "" or not shutil.which("gcc"),
    reason="native C round-trip builds the embedded-CPython library "
           "(set SPLLT_SLOW_TESTS=1)")
def test_capi_native_example():
    r = subprocess.run(["make", "-C", os.path.join(REPO, "native"),
                        "example"], capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ok" in r.stdout
