"""General-graph nested dissection (the METIS role) — validity + quality.

Reference bar: the reference's ordering quality comes from METIS via
SPRAL (/root/reference/src/spllt_analyse_mod.F90:129-131); analyse/nd.py
replaces it for irregular patterns.
"""

import numpy as np
import pytest

from spllt_tpu import Options, analyse, factor, make_rhs, solve
from spllt_tpu.analyse.nd import nd_ordering
from spllt_tpu.sparse.generators import fem3d, poisson2d, random_spd


def test_nd_is_permutation():
    for a in (poisson2d(20), fem3d(8), random_spd(300, 0.02, seed=1)):
        perm = nd_ordering(a)
        assert np.array_equal(np.sort(perm), np.arange(a.n))


def test_nd_end_to_end():
    a = fem3d(8)
    opts = Options(ordering="nd", mode="stf", nb=32, nemin=16, refine=0)
    symb = analyse(a, opts)
    num = factor(symb)
    xt, b = make_rhs(a, nrhs=2)
    x = solve(num, b)
    bwd = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
    assert bwd < 1e-12


def test_nd_quality_vs_amd_on_fem():
    """On the irregular FEM fixture ND must stay within 15% of AMD fill
    (VERDICT round-3 acceptance bar; currently it is ahead)."""
    a = fem3d(10)
    res = {}
    for meth in ("nd", "amd"):
        s = analyse(a, Options(ordering=meth, nemin=32, prune_tree=False))
        res[meth] = s.inform.num_factor
    assert res["nd"] <= 1.15 * res["amd"]


def test_hem_native_parity():
    """native/symbolic.cpp spllt_hem must match the Python matching
    loop exactly (same traversal order and tie-breaking)."""
    import importlib

    import scipy.sparse as sp

    nat = importlib.import_module("spllt_tpu.analyse.native")
    nd_mod = importlib.import_module("spllt_tpu.analyse.nd")
    if not nat.native_available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    n = 400
    a = sp.random(n, n, 0.03, random_state=5)
    g = (a + a.T).tocsr()
    g.setdiag(0)
    g.eliminate_zeros()
    g.data[:] = np.abs(g.data)
    order = rng.permutation(n)
    res = nat.native_hem_or_none(g.indptr, g.indices, g.data, order)
    assert res is not None
    orig = nat.native_hem_or_none
    nat.native_hem_or_none = lambda *a_: None

    class _R:
        def permutation(self, _m):
            return order

    try:
        cmap_py, nc_py = nd_mod._heavy_edge_matching(
            g, np.ones(n), _R())
    finally:
        nat.native_hem_or_none = orig
    assert nc_py == res[1]
    assert np.array_equal(cmap_py, res[0])
