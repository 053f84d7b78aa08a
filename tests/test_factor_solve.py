"""End-to-end factorization + solve tests.

Follows the reference's test strategy (test_solve_phasis.F90: known
solution, backward error check, multiple solve configurations; SURVEY §4):
the STF (NumPy, float64) mode is the deterministic oracle; the batched JAX
mode must match it and meet backward-error targets.
"""

import numpy as np
import pytest

from spllt_tpu import (CscMatrix, Options, analyse, factor, make_rhs,
                       poisson2d, poisson3d, random_spd, solve)


def backward_error(a: CscMatrix, x, b):
    r = a.matvec(x) - b
    return np.linalg.norm(r) / max(1e-300, np.linalg.norm(b))


CASES = [
    ("poisson2d-8-natural", poisson2d(8), dict(ordering="natural", nb=8)),
    ("poisson2d-16-nd", poisson2d(16),
     dict(ordering="nd-grid", grid_shape=(16, 16), nb=16)),
    ("poisson2d-16-amd-nemin1", poisson2d(16),
     dict(ordering="amd", nb=8, nemin=1)),
    ("random-60", random_spd(60, 0.05, seed=7), dict(ordering="amd", nb=8)),
    ("poisson3d-5", poisson3d(5),
     dict(ordering="nd-grid", grid_shape=(5, 5, 5), nb=16, nemin=8)),
]


@pytest.mark.parametrize("name,mat,opts", CASES,
                         ids=[c[0] for c in CASES])
def test_stf_mode_solves(name, mat, opts):
    options = Options(mode="stf", prune_tree=False, **opts)
    symb = analyse(mat, options)
    num = factor(symb)
    xt, b = make_rhs(mat, nrhs=1)
    x = solve(num, b[:, 0])
    assert backward_error(mat, x, b[:, 0]) < 1e-13
    np.testing.assert_allclose(x, xt[:, 0], rtol=1e-8)


@pytest.mark.parametrize("name,mat,opts", CASES,
                         ids=[c[0] for c in CASES])
def test_batched_mode_matches_stf(name, mat, opts):
    options = Options(mode="batched", dtype="float64", refine=0,
                      prune_tree=False, **opts)
    symb = analyse(mat, options)
    num = factor(symb)

    options_stf = Options(mode="stf", prune_tree=False, **opts)
    symb2 = analyse(mat, options_stf)
    num2 = factor(symb2)

    pool_b = np.asarray(num.pool)
    np.testing.assert_allclose(pool_b, num2.pool, atol=1e-9)

    xt, b = make_rhs(mat, nrhs=3)
    x = solve(num, b)
    x2 = solve(num2, b)
    np.testing.assert_allclose(x, x2, atol=1e-9)
    assert backward_error(mat, x[:, 0], b[:, 0]) < 1e-12


def test_f32_with_refinement_reaches_f64_accuracy():
    mat = poisson2d(16)
    options = Options(mode="batched", dtype="float32", refine=3,
                      ordering="nd-grid", grid_shape=(16, 16), nb=16,
                      prune_tree=False)
    symb = analyse(mat, options)
    num = factor(symb)
    xt, b = make_rhs(mat, nrhs=1)
    x = solve(num, b[:, 0])
    assert backward_error(mat, x, b[:, 0]) < 1e-13


def test_multirhs_and_jobs():
    mat = poisson2d(10)
    options = Options(mode="stf", ordering="natural", nb=8,
                      prune_tree=False)
    symb = analyse(mat, options)
    num = factor(symb)
    xt, b = make_rhs(mat, nrhs=4)
    # full solve
    x = solve(num, b)
    assert backward_error(mat, x[:, 2], b[:, 2]) < 1e-13
    # fwd then bwd staged through the API (reference job=1 then job=2)
    y = solve(num, b, job=1)
    x3 = solve(num, y, job=2)
    np.testing.assert_allclose(x3, x, atol=1e-10)


def test_refactor_same_pattern():
    mat = random_spd(40, 0.08, seed=11)
    options = Options(mode="stf", ordering="amd", nb=8, prune_tree=False)
    symb = analyse(mat, options)
    num = factor(symb)
    # new values, same pattern
    mat2 = CscMatrix(mat.n, mat.colptr.copy(), mat.rowind.copy(),
                     mat.values * 2.0)
    num2 = factor(symb, a=mat2)
    xt, b = make_rhs(mat2, nrhs=1)
    x = solve(num2, b[:, 0])
    assert backward_error(mat2, x, b[:, 0]) < 1e-13


def test_not_positive_definite_raises():
    from spllt_tpu import NotPositiveDefiniteError

    mat = poisson2d(6)
    mat.values = mat.values.copy()
    mat.values[mat.colptr[:-1]] = -1.0  # negative diagonal
    options = Options(mode="stf", ordering="natural", nb=8,
                      prune_tree=False)
    symb = analyse(mat, options)
    with pytest.raises(NotPositiveDefiniteError):
        factor(symb)


def test_potrf_blocked_matches_plain():
    """Blocked right-looking batched potrf == single-call version for
    wide tiles with mixed kvec (incl. boundary rows and empty panels)."""
    import jax.numpy as jnp
    from spllt_tpu.numeric.factor import _potrf_batch, _potrf_batch_blocked

    rng = np.random.default_rng(3)
    sp, bsz = 96, 5
    a = rng.standard_normal((bsz, sp, sp))
    spd = a @ a.transpose(0, 2, 1) + sp * np.eye(sp)
    kvec = np.asarray([96, 60, 33, 1, 17], np.int32)
    # zero padded region like the assembly does
    for i, k in enumerate(kvec):
        spd[i, :, k:] = 0.0
        spd[i, k:, k:] = 0.0
    t = jnp.asarray(spd, jnp.float32)
    ref = np.asarray(_potrf_batch(t, jnp.asarray(kvec), sp))
    got = np.asarray(_potrf_batch_blocked(t, jnp.asarray(kvec), sp,
                                          panel=32))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
