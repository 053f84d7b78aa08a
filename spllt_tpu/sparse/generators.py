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

__all__ = ["poisson2d", "poisson3d", "random_spd", "fem3d",
           "make_rhs"]


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


def fem3d(m: int, dofs: int = 1, seed: int = 0) -> CscMatrix:
    """27-point 3-D "FEM-like" SPD matrix (bcsstk / audikw structural
    class analogue: denser element connectivity than the 7-point
    Poisson; optional ``dofs`` per grid point for block structure)."""
    shape = (m, m, m)
    n0 = m ** 3
    idx = np.arange(n0, dtype=np.int64).reshape(shape)
    rows, cols = [], []
    offs = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
            for k in (-1, 0, 1)]
    for (di, dj, dk) in offs:
        if (di, dj, dk) <= (0, 0, 0):
            continue   # lower triangle only (plus diag handled below)
        sl_a = tuple(slice(max(0, -d), m - max(0, d)) for d in (di, dj, dk))
        sl_b = tuple(slice(max(0, d), m + min(0, d)) for d in (di, dj, dk))
        a = idx[sl_a].ravel()
        b = idx[sl_b].ravel()
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        rows.append(hi)
        cols.append(lo)
    rows = np.concatenate([np.arange(n0)] + rows)
    cols = np.concatenate([np.arange(n0)] + cols)
    if dofs > 1:
        rr = (rows[:, None] * dofs + np.arange(dofs)[None, :]).ravel()
        cc = (cols[:, None] * dofs + np.arange(dofs)[None, :]).ravel()
        rows, cols = rr, cc
    n = n0 * dofs
    rng = np.random.default_rng(seed)
    vals = -np.abs(rng.standard_normal(len(rows)))
    a = CscMatrix.from_coo(n, rows, cols, vals, sum_duplicates=True)
    # diagonal dominance -> SPD
    deg = np.zeros(n)
    cs = np.repeat(np.arange(n, dtype=np.int64), np.diff(a.colptr))
    off = a.rowind != cs
    np.add.at(deg, a.rowind[off], np.abs(a.values[off]))
    np.add.at(deg, cs[off], np.abs(a.values[off]))
    diag_pos = a.colptr[:-1]
    a.values[diag_pos] = deg + 1.0
    return a
