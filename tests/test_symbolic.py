"""Symbolic-phase unit tests: etree, postorder, supernodes, row lists.

Oracle: dense/scipy Cholesky of small matrices (the reference validates its
analyse only indirectly through residuals; we additionally check structure
invariants, SURVEY §4 'verification invariants worth porting')."""

import numpy as np
import pytest
import scipy.sparse as sp

from spllt_tpu import CscMatrix, Options, poisson2d, poisson3d, random_spd
from spllt_tpu.analyse.analyse import analyse
from spllt_tpu.analyse.etree import etree, postorder


def dense_chol_struct(a: CscMatrix) -> np.ndarray:
    """Exact boolean lower-factor structure via dense symbolic elimination
    (no numerical thresholds — immune to cancellation/decay)."""
    n = a.n
    s = np.tril((a.to_scipy().toarray() != 0))
    for k in range(n):
        below = np.nonzero(s[k + 1:, k])[0] + k + 1
        s[np.ix_(below, below)] |= np.tril(np.ones((len(below), len(below)),
                                                   dtype=bool))
    return s


def reference_etree(a: CscMatrix) -> np.ndarray:
    """O(n²) reference elimination tree from the dense factor structure."""
    ls = dense_chol_struct(a)
    n = a.n
    parent = np.full(n, -1, dtype=np.int64)
    for j in range(n):
        below = np.nonzero(ls[j + 1:, j])[0]
        if len(below):
            parent[j] = j + 1 + below[0]
    return parent


@pytest.mark.parametrize("mat", [poisson2d(7), random_spd(40, 0.08, seed=3)])
def test_etree_matches_dense_reference(mat):
    parent = etree(mat.n, mat.colptr, mat.rowind)
    assert np.array_equal(parent, reference_etree(mat))


def test_postorder_is_valid():
    mat = poisson2d(9)
    parent = etree(mat.n, mat.colptr, mat.rowind)
    post = postorder(parent)
    assert np.array_equal(np.sort(post), np.arange(mat.n))
    pos = np.empty(mat.n, dtype=np.int64)
    pos[post] = np.arange(mat.n)
    for v in range(mat.n):
        if parent[v] != -1:
            assert pos[v] < pos[parent[v]]  # children before parents


@pytest.mark.parametrize("mat,ordering", [
    (poisson2d(8), "natural"),
    (poisson2d(8), "rcm"),
    (random_spd(50, 0.06, seed=1), "natural"),
])
def test_supernode_rows_match_dense_factor(mat, ordering):
    symb = analyse(mat, Options(ordering=ordering, nemin=1,
                                prune_tree=False))
    ls = dense_chol_struct(symb.a_perm)
    forest = symb.forest
    # columns partition 0..n-1 contiguously
    assert forest.sa[0] == 0
    assert np.all(forest.sa[1:] == forest.en[:-1] + 1)
    assert forest.en[-1] == mat.n - 1
    for nd in range(forest.nnodes):
        rows = forest.node_rows(nd)
        w = forest.ncols(nd)
        # first w rows are the node's own columns
        assert np.array_equal(rows[:w],
                              np.arange(forest.sa[nd], forest.en[nd] + 1))
        # with nemin=1 the union structure must cover the true structure of
        # every column and equal that of the first column
        for jloc, j in enumerate(range(forest.sa[nd], forest.en[nd] + 1)):
            true_rows = np.nonzero(ls[:, j])[0]
            assert set(true_rows) <= set(rows[jloc:].tolist())
        # node rowset == struct of first column (zero-fill supernode)
        first = np.nonzero(ls[:, forest.sa[nd]])[0]
        assert np.array_equal(rows, first)


def test_amalgamation_reduces_nodes():
    mat = poisson2d(12)
    s1 = analyse(mat, Options(ordering="natural", nemin=1,
                              prune_tree=False))
    s16 = analyse(mat, Options(ordering="natural", nemin=16,
                               prune_tree=False))
    assert s16.nnodes < s1.nnodes
    # flop/entry counts are monotone under amalgamation
    assert s16.inform.num_factor >= s1.inform.num_factor
    assert s16.inform.num_flops >= s1.inform.num_flops


def test_nd_grid_ordering_reduces_fill():
    mat = poisson2d(16)
    nat = analyse(mat, Options(ordering="natural", prune_tree=False))
    nd = analyse(mat, Options(ordering="nd-grid", grid_shape=(16, 16),
                              prune_tree=False))
    assert nd.inform.num_factor < nat.inform.num_factor


def test_amd_ordering_runs_and_reduces_fill():
    mat = poisson2d(10)
    nat = analyse(mat, Options(ordering="natural", prune_tree=False))
    amd = analyse(mat, Options(ordering="amd", prune_tree=False))
    assert amd.inform.num_factor <= nat.inform.num_factor
    assert np.array_equal(np.sort(amd.perm), np.arange(mat.n))


def test_analyse_poisson3d_counts():
    mat = poisson3d(6)
    symb = analyse(mat, Options(ordering="nd-grid", grid_shape=(6, 6, 6),
                                prune_tree=False))
    assert symb.inform.num_nodes >= 1
    assert symb.inform.num_factor >= mat.nnz
    assert symb.inform.maxdepth >= 1


def test_factor_plan_native_parity():
    """The C++ plan enumeration (native/symbolic.cpp spllt_factor_plan)
    must emit byte-identical task arrays to the Python loops."""
    import dataclasses
    import importlib

    from spllt_tpu.plan import factor_tasks as ft
    from spllt_tpu.plan.blocking import build_block_plan

    nat = importlib.import_module("spllt_tpu.analyse.native")
    if not nat.native_available():
        pytest.skip("native library not built")
    for mat, o in [
        (poisson2d(24), Options(nb=16, nemin=8)),
        (poisson3d(10), Options(nb=32, nemin=24)),
        (poisson2d(13), Options(nb=8, nemin=1)),
    ]:
        symb = analyse(mat, o)
        bp = build_block_plan(symb, o.nb)
        assert nat.native_factor_plan_or_none(
            symb.forest.sparent, bp) is not None
        fp_nat = ft.build_factor_plan(symb, bp)
        orig = nat.native_factor_plan_or_none
        nat.native_factor_plan_or_none = lambda *a, **k: None
        try:
            fp_py = ft.build_factor_plan(symb, bp)
        finally:
            nat.native_factor_plan_or_none = orig
        for f in dataclasses.fields(fp_nat):
            a, b = getattr(fp_nat, f.name), getattr(fp_py, f.name)
            if isinstance(a, np.ndarray):
                assert a.shape == b.shape and np.array_equal(a, b), f.name
            else:
                assert a == b, f.name
