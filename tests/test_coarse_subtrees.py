"""Dense coarse-subtree phase tests: the coarsened factorization must
match the fully task-based one exactly at the solution level."""

import numpy as np
import pytest

from spllt_tpu import Options, analyse, factor, make_rhs, poisson2d, \
    poisson3d, random_spd, solve
from spllt_tpu.analyse.coarsen import coarse_partition


def bwderr(a, x, b):
    return np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)


def test_coarse_partition_structure():
    mat = poisson2d(16)
    symb = analyse(mat, Options(ordering="nd-grid", grid_shape=(16, 16),
                                nb=8, nemin=4, prune_tree=False))
    co = coarse_partition(symb.forest, symb.node_flops, max_span=64,
                          waste=16.0)
    assert co.nsub > 0
    # coarse node sets are disjoint contiguous ranges below their roots
    for s in range(co.nsub):
        nds = np.nonzero(co.sub_of_node == s)[0]
        assert np.array_equal(nds, np.arange(co.node_lo[s], co.root[s] + 1))
        # boundary rows all lie above the subtree columns
        assert np.all(co.boundary(s) > co.v_hi[s])
        assert co.span[s] == (co.v_hi[s] - co.v_lo[s] + 1
                              + len(co.boundary(s)))


CASES = [
    ("poisson2d-16", poisson2d(16),
     dict(ordering="nd-grid", grid_shape=(16, 16), nb=8, nemin=4)),
    ("poisson3d-6", poisson3d(6),
     dict(ordering="nd-grid", grid_shape=(6, 6, 6), nb=16, nemin=8)),
    ("random-80", random_spd(80, 0.05, seed=5),
     dict(ordering="amd", nb=8, nemin=4)),
]


@pytest.mark.parametrize("name,mat,opts", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("mode", ["stf", "batched"])
def test_coarse_matches_plain(name, mat, opts, mode):
    kw = dict(mode=mode, prune_tree=False, refine=0)
    if mode == "batched":
        kw["dtype"] = "float64"
    plain = factor(analyse(mat, Options(coarse_subtrees=False, **opts,
                                        **kw)))
    co = factor(analyse(mat, Options(coarse_subtrees=True, coarse_span=96,
                                     coarse_waste=50.0, **opts, **kw)))
    assert (co.fplan.dense is not None and
            sum(b["nsub"] for b in co.fplan.dense) > 0), \
        "no subtrees were coarsened — test not exercising the phase"
    assert co.fplan.num_tasks < plain.fplan.num_tasks
    xt, b = make_rhs(mat, nrhs=2)
    x1 = solve(plain, b)
    x2 = solve(co, b)
    assert bwderr(mat, x2, b) < 1e-12
    np.testing.assert_allclose(x2, x1, atol=1e-9)
