"""Solve-megakernel tests: plan semantics (NumPy stream simulator over
several fixtures) + the pallas kernel in interpret mode on a tiny case.

The simulator executes the micro-task stream sequentially with exact
NumPy arithmetic — validating the leveling, the reduction segment maps
and the panel-space layout independent of the pallas machinery (the
reference's equivalent machinery is validated only end-to-end;
SURVEY §4 — we can do better because the stream is a host artifact).
"""

import numpy as np
import pytest
import scipy.linalg as sla

from spllt_tpu import Options, analyse, factor, make_rhs, poisson2d, \
    poisson3d, random_spd
from spllt_tpu.numeric.solve import solve_bwd_np, solve_fwd_np
from spllt_tpu.plan.solve_mega import (KIND_ADDG, KIND_MM, KIND_MMT,
                                       KIND_SOL, build_solve_mega_plan)


def simulate_runs(smp, runs, poolf, x):
    """Execute one direction's stream on [n+1, nrhs] permuted rhs."""
    nb = smp.nb
    P, n = smp.P, smp.n
    nr = x.shape[1]
    xp = x[smp.xp_src]
    work = np.concatenate([np.zeros((P, nr)), xp])
    for run in runs:
        kind = run["kind"]
        for t in range(len(run["wS"])):
            wS, dst, wA = (int(run["wS"][t]), int(run["dst"][t]),
                           int(run["wA"][t]))
            src = work[wS:wS + nb]
            if kind == KIND_ADDG:
                rel = run["rel"][t]
                u = np.where((rel >= 0)[:, None],
                             src[np.maximum(rel, 0)], 0.0)
                work[dst:dst + nb] += u
            elif kind in (KIND_MM, KIND_MMT):
                blk = poolf[wA:wA + nb]
                u = (blk.T if kind == KIND_MMT else blk) @ src
                work[dst:dst + nb] -= u
            else:
                k = int(run["aux"][t])
                m = poolf[wA:wA + nb].copy()
                idx = np.arange(k, nb)
                m[idx, idx] = 1.0
                y = sla.solve_triangular(
                    m, src, lower=True,
                    trans="T" if kind != KIND_SOL else "N")
                work[wS:wS + nb] = y
                work[dst:dst + nb] = y
    out = np.zeros((n + 1, nr))
    out[:n] = work[P:][smp.col_to_xp]
    return out


CASES = [
    ("poisson2d-10", poisson2d(10), dict(ordering="amd", nb=8, nemin=8)),
    ("poisson2d-16-nd", poisson2d(16),
     dict(ordering="nd-grid", grid_shape=(16, 16), nb=8, nemin=16)),
    ("random-60", random_spd(60, 0.05, seed=7),
     dict(ordering="amd", nb=8, nemin=4)),
    ("poisson3d-5", poisson3d(5),
     dict(ordering="nd-grid", grid_shape=(5, 5, 5), nb=16, nemin=8)),
]


@pytest.mark.parametrize("name,mat,opts", CASES, ids=[c[0] for c in CASES])
def test_stream_simulator_matches_oracle(name, mat, opts):
    options = Options(mode="stf", prune_tree=False, **opts)
    symb = analyse(mat, options)
    num = factor(symb)
    pool = np.asarray(num.pool)             # [nblocks(+1)?, nb, nb] f64
    if pool.shape[0] == num.plan.nblocks:   # stf pool has no scratch
        pool = np.concatenate(
            [pool, np.zeros((1,) + pool.shape[1:])])
    poolf = pool.reshape(-1, opts["nb"])
    smp = build_solve_mega_plan(symb, num.plan)

    n = symb.n
    rng = np.random.default_rng(3)
    b = rng.standard_normal((n, 2))
    x = np.zeros((n + 1, 2))
    x[:n] = b[symb.perm]

    y = simulate_runs(smp, smp.fwd_runs, poolf, x.copy())
    y_ref = solve_fwd_np(pool, num.splan, x.copy())
    np.testing.assert_allclose(y[:n], y_ref[:n], rtol=1e-10, atol=1e-12)

    z = simulate_runs(smp, smp.bwd_runs, poolf, y.copy())
    z_ref = solve_bwd_np(pool, num.splan, y_ref.copy())
    np.testing.assert_allclose(z[:n], z_ref[:n], rtol=1e-10, atol=1e-12)

    # full solve really solves A x = b
    xs = np.empty((n, 2))
    xs[symb.perm] = z[:n]
    r = mat.matvec(xs) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-12


def test_mega_solve_kernel_interpret():
    """The pallas kernel (interpret mode, group=2) matches the oracle."""
    mat = poisson2d(10)
    opts = dict(ordering="amd", nb=8, nemin=8)
    options = Options(mode="batched", dtype="float32", refine=0,
                      schedule="scan", prune_tree=False, **opts)
    symb = analyse(mat, options)
    num = factor(symb)
    from spllt_tpu.numeric.solve_mega import MegaSolveExecutor

    ex = MegaSolveExecutor(symb, num.plan, nrhs=2, interpret=True,
                           group=2)
    n = symb.n
    rng = np.random.default_rng(5)
    b = rng.standard_normal((n, 2))
    x = np.zeros((n + 1, 2), np.float32)
    x[:n] = b[symb.perm]

    pool = np.asarray(num.pool)       # batched pool includes the scratch
    y = np.asarray(ex.fwd(pool, x.copy()))
    y_ref = solve_fwd_np(np.float64(pool), num.splan,
                         np.float64(x.copy()))
    np.testing.assert_allclose(y[:n], y_ref[:n], rtol=2e-4, atol=2e-5)

    z = np.asarray(ex.bwd(pool, y.copy()))
    z_ref = solve_bwd_np(np.float64(pool), num.splan, y_ref.copy())
    np.testing.assert_allclose(z[:n], z_ref[:n], rtol=2e-3, atol=2e-4)

    zf = np.asarray(ex.full(pool, x.copy()))
    np.testing.assert_allclose(zf[:n], z_ref[:n], rtol=2e-3, atol=2e-4)


def test_api_mega_schedule_end_to_end():
    """schedule='mega' end-to-end solve with refinement reaches f64-level
    backward error (falls back gracefully when ineligible)."""
    mat = poisson2d(10)
    options = Options(mode="batched", dtype="float32", refine=2,
                      schedule="mega", ordering="amd", nb=8, nemin=8,
                      prune_tree=False)
    symb = analyse(mat, options)
    num = factor(symb)
    xt, b = make_rhs(mat, nrhs=1)
    x = np.asarray(__import__("spllt_tpu").solve(num, b[:, 0]))
    r = mat.matvec(x) - b[:, 0]
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-12
