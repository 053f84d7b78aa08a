"""Test-matrix generators.

The reference exercises SpLLT on generated Poisson grids
(/root/reference/aux/run_tests_poisson3d.sh:6-60) and SuiteSparse SPD
matrices; SPRAL ``random_real`` fills pattern-only inputs
(/root/reference/src/spllt_mod.F90:481-486).  We generate the same families
natively.
"""

from __future__ import annotations

import numpy as np

from .csc import CscMatrix

__all__ = ["poisson2d", "poisson3d", "random_spd", "make_rhs"]


def _grid_laplacian(shape: tuple[int, ...]) -> CscMatrix:
    """(2·dim)+1 point Laplacian on a regular grid, SPD."""
    n = int(np.prod(shape))
    idx = np.arange(n, dtype=np.int64).reshape(shape)
    rows = [np.arange(n)]
    cols = [np.arange(n)]
    vals = [np.full(n, 2.0 * len(shape))]
    for axis in range(len(shape)):
        lo = [slice(None)] * len(shape)
        hi = [slice(None)] * len(shape)
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        a = idx[tuple(lo)].ravel()
        b = idx[tuple(hi)].ravel()
        rows.append(b)
        cols.append(a)
        vals.append(np.full(len(a), -1.0))
    return CscMatrix.from_coo(
        n, np.concatenate(rows), np.concatenate(cols), np.concatenate(vals)
    )


def poisson2d(m: int) -> CscMatrix:
    """5-point 2-D Poisson matrix on an m×m grid (SPD, n = m²)."""
    return _grid_laplacian((m, m))


def poisson3d(m: int) -> CscMatrix:
    """7-point 3-D Poisson matrix on an m³ grid (SPD, n = m³)."""
    return _grid_laplacian((m, m, m))


def random_spd(n: int, density: float = 0.01, seed: int = 0) -> CscMatrix:
    """Random sparse SPD matrix: random symmetric pattern + diagonal
    dominance (the reference forces diagonal dominance on read matrices,
    rb_options%values=3, /root/reference/test/test_solve_phasis.F90:89)."""
    rng = np.random.default_rng(seed)
    m = max(0, int(density * n * (n - 1) / 2))
    r = rng.integers(0, n, size=2 * m)
    c = rng.integers(0, n, size=2 * m)
    mask = r > c
    r, c = r[mask], c[mask]
    v = rng.standard_normal(len(r))
    rows = np.concatenate([np.arange(n), r])
    cols = np.concatenate([np.arange(n), c])
    vals = np.concatenate([np.zeros(n), v])
    a = CscMatrix.from_coo(n, rows, cols, vals)
    # set diagonal to (row degree sum of |offdiag|) + 1 → diagonally dominant
    cols_full = np.repeat(np.arange(n), np.diff(a.colptr))
    absv = np.abs(a.values)
    dom = np.zeros(n)
    off = a.rowind != cols_full
    np.add.at(dom, a.rowind[off], absv[off])
    np.add.at(dom, cols_full[off], absv[off])
    diag_pos = a.colptr[:-1]  # diagonal is first entry of each column
    a.values[diag_pos] = dom + 1.0
    return a


def make_rhs(a: CscMatrix, nrhs: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Build rhs b = A·x* for the known solution x*[:, r] = r+1 (the
    reference's construction, /root/reference/test/test_solve_phasis.F90:140-155).

    Returns (x_true [n, nrhs], b [n, nrhs]).
    """
    x = np.tile(np.arange(1, nrhs + 1, dtype=np.float64), (a.n, 1))
    return x, a.matvec(x)
