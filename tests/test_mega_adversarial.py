"""Adversarial megakernel streams: force chunk seams everywhere.

The factor/solve megakernels defer destination writes and only
synchronize at drain steps; chunk boundaries additionally reset the
kernel state and may cut a destination group in half (the partial sums
must RMW-commute across the seam).  These tests rebuild the streams
with a tiny ``kmax`` so every few steps is a chunk/drain boundary and
destination groups split across seams, then check against the oracle —
exercising exactly the hazards bench.py's single happy-path run would
miss.  On real TPUs the same streams validate DMA ordering
(scripts/adversarial_mega.py drives this file's helpers on device).
"""

import numpy as np
import pytest

from spllt_tpu import Options, analyse, factor, poisson2d
from spllt_tpu.numeric.solve import solve_bwd_np, solve_fwd_np


def _problem(nb=8):
    mat = poisson2d(12)
    options = Options(mode="batched", dtype="float32", refine=0,
                      schedule="scan", ordering="amd", nb=nb, nemin=8,
                      prune_tree=False)
    symb = analyse(mat, options)
    num = factor(symb)
    return mat, symb, num


def run_factor_adversarial(kmax, group=2, interpret=True, nb=8):
    from spllt_tpu.numeric.assemble import assemble_jax
    from spllt_tpu.numeric.megakernel import (build_mega_stream,
                                              mega_factorize)

    mat, symb, num = _problem(nb)
    fp = num.fplan
    pool_rows = (fp.nblocks + 1) * fp.nb
    chunks = build_mega_stream(fp, group, pool_rows, kmax=kmax)
    assert len(chunks) > 3, "kmax did not force chunk seams"
    import jax.numpy as jnp

    pool0 = assemble_jax(num.plan, num.values_perm, jnp.float32)
    poolf = mega_factorize(pool0.reshape(-1, fp.nb), chunks, fp.nb,
                           group, interpret=interpret)
    got = np.asarray(poolf).reshape(fp.nblocks + 1, fp.nb, fp.nb)
    ref = np.asarray(num.pool)
    err = float(np.max(np.abs(got[:fp.nblocks] - ref[:fp.nblocks])))
    return err


def run_solve_adversarial(kmax, group=2, interpret=True, nb=8):
    from spllt_tpu.numeric.solve_mega import MegaSolveExecutor
    import spllt_tpu.numeric.solve_mega as sm

    mat, symb, num = _problem(nb)
    orig = sm.chunk_solve_runs

    def tiny(runs, group_, nb_, ws, ps, kmax_=16384):
        return orig(runs, group_, nb_, ws, ps, kmax=kmax)

    sm.chunk_solve_runs = tiny
    try:
        ex = MegaSolveExecutor(symb, num.plan, nrhs=2,
                               interpret=interpret, group=group)
    finally:
        sm.chunk_solve_runs = orig
    assert len(ex._fwd_chunks) > 3, "kmax did not force chunk seams"

    n = symb.n
    rng = np.random.default_rng(9)
    b = rng.standard_normal((n, 2))
    x0 = np.zeros((n + 1, 2), np.float32)
    x0[:n] = b[symb.perm]
    pool = np.asarray(num.pool)
    z = np.asarray(ex.full(pool, x0.copy()))
    zr = solve_bwd_np(np.float64(pool), num.splan,
                      solve_fwd_np(np.float64(pool), num.splan,
                                   np.float64(x0)))
    return float(np.max(np.abs(z[:n] - zr[:n])
                        / (np.abs(zr[:n]) + 1e-3)))


@pytest.mark.parametrize("kmax", [4, 10])
def test_factor_megakernel_chunk_seams(kmax):
    assert run_factor_adversarial(kmax) < 1e-4


def test_solve_megakernel_chunk_seams():
    assert run_solve_adversarial(kmax=4) < 1e-3
