"""Scan-scheduled (bucketed) executors must match the unrolled ones and
the sequential oracle exactly."""

import numpy as np
import pytest

from spllt_tpu import Options, analyse, factor, make_rhs, poisson2d, \
    poisson3d, solve


@pytest.mark.parametrize("mat,gs,nb", [
    (poisson2d(16), (16, 16), 8),
    (poisson3d(7), (7, 7, 7), 16),
])
def test_scan_matches_unrolled(mat, gs, nb):
    base = dict(ordering="nd-grid", grid_shape=gs, nb=nb, nemin=8,
                mode="batched", dtype="float64", refine=0,
                prune_tree=False)
    s1 = analyse(mat, Options(schedule="scan", **base))
    n1 = factor(s1)
    s2 = analyse(mat, Options(schedule="unrolled", **base))
    n2 = factor(s2)
    np.testing.assert_array_equal(np.asarray(n1.pool), np.asarray(n2.pool))
    xt, b = make_rhs(mat, nrhs=2)
    x1 = solve(n1, b)
    x2 = solve(n2, b)
    np.testing.assert_allclose(x1, x2, atol=1e-14)
    r = mat.matvec(x1) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-13


def test_bucket_compression():
    from spllt_tpu.plan.blocking import build_block_plan
    from spllt_tpu.plan.factor_tasks import build_factor_plan
    from spllt_tpu.numeric.factor_scan import ScanFactorExecutor
    import jax.numpy as jnp

    mat = poisson3d(10)
    o = Options(ordering="nd-grid", grid_shape=(10, 10, 10), nb=16,
                nemin=16, prune_tree=False)
    s = analyse(mat, o)
    plan = build_block_plan(s, o.nb)
    fp = build_factor_plan(s, plan)
    ex = ScanFactorExecutor(fp, dtype=jnp.float32)
    assert len(ex.buckets) <= 12
    assert fp.nlevels > len(ex.buckets)
