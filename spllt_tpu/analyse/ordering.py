"""Fill-reducing orderings.

The reference delegates ordering to METIS nested dissection through SPRAL
(``ssids_opt%ordering = 1``, /root/reference/src/spllt_analyse_mod.F90:109).
We own the ordering pipeline: approximate-minimum-degree (amd), geometric
nested dissection for regular grids (nd-grid), reverse Cuthill-McKee (rcm)
and natural.  All return ``perm`` with perm[i] = original index placed at
position i.
"""

from __future__ import annotations

import numpy as np

__all__ = ["compute_ordering", "nd_grid_ordering", "amd_ordering"]


def compute_ordering(a, method: str = "amd", grid_shape=None) -> np.ndarray:
    """Dispatch on method name (options.ordering)."""
    if method == "natural":
        return np.arange(a.n, dtype=np.int64)
    if method == "nd-grid":
        if grid_shape is None:
            raise ValueError("nd-grid ordering requires grid_shape")
        return nd_grid_ordering(grid_shape)
    if method == "rcm":
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        full = sp.csc_matrix(
            (np.ones(a.nnz), a.rowind, a.colptr), shape=(a.n, a.n))
        full = full + full.T
        return reverse_cuthill_mckee(full.tocsr(), symmetric_mode=True).astype(
            np.int64)
    if method == "amd":
        return amd_ordering(a)
    if method == "nd":
        from .nd import nd_ordering

        return nd_ordering(a)
    raise ValueError(f"unknown ordering method: {method}")


# --------------------------------------------------------------------------- #
def nd_grid_ordering(shape: tuple[int, ...]) -> np.ndarray:
    """Geometric nested dissection for a regular grid graph.

    Recursively bisects the longest axis; separator cells are numbered last.
    This matches METIS-quality fill for the Poisson benchmark matrices
    (/root/reference/aux/run_tests_poisson3d.sh) without an external library.
    """
    ndim = len(shape)
    n = int(np.prod(shape))
    out = np.empty(n, dtype=np.int64)
    pos = 0

    idx = np.arange(n, dtype=np.int64).reshape(shape)

    def rec(block: np.ndarray):
        nonlocal pos
        if block.size <= 2:
            flat = np.sort(block.ravel())
            out[pos:pos + flat.size] = flat
            pos += flat.size
            return
        dims = block.shape
        axis = int(np.argmax(dims))
        if dims[axis] < 3:
            flat = np.sort(block.ravel())
            out[pos:pos + flat.size] = flat
            pos += flat.size
            return
        mid = dims[axis] // 2
        sl_lo = [slice(None)] * ndim
        sl_sep = [slice(None)] * ndim
        sl_hi = [slice(None)] * ndim
        sl_lo[axis] = slice(0, mid)
        sl_sep[axis] = slice(mid, mid + 1)
        sl_hi[axis] = slice(mid + 1, None)
        rec(block[tuple(sl_lo)])
        rec(block[tuple(sl_hi)])
        sep = np.sort(block[tuple(sl_sep)].ravel())
        out[pos:pos + sep.size] = sep
        pos += sep.size

    rec(idx)
    assert pos == n
    return out


# --------------------------------------------------------------------------- #
def amd_ordering(a) -> np.ndarray:
    """Approximate minimum degree ordering (quotient-graph AMD).

    Pure-Python implementation of the Amestoy-Davis-Duff algorithm with
    element absorption and external-degree approximation; replaced by the
    C++ fast path in native/symbolic.cpp when available.
    """
    from .native import native_amd_or_none

    perm = native_amd_or_none(a)
    if perm is not None:
        return perm
    return _amd_python(a.n, a.colptr, a.rowind)


def _amd_python(n: int, colptr: np.ndarray, rowind: np.ndarray) -> np.ndarray:
    """Minimum-degree on the quotient graph (simplified AMD).

    Maintains for each uneliminated variable its adjacency as (variables,
    elements); eliminating v creates element e(v) whose variable list is the
    union of v's variable neighbours and its elements' variable lists.
    Degree is approximated by |union| (true degree of the merged lists).
    O(n·deg²)-ish; fine for the moderate host-side problems, superseded by
    the C++ implementation for large n.
    """
    # build full symmetric adjacency (lists of variables, no self loops)
    import scipy.sparse as sp

    full = sp.csc_matrix(
        (np.ones(len(rowind)), rowind, colptr), shape=(n, n))
    full = (full + full.T).tocsc()
    adj_ptr, adj_ind = full.indptr, full.indices

    var_nbrs: list[set] = [
        set(int(x) for x in adj_ind[adj_ptr[j]:adj_ptr[j + 1]] if x != j)
        for j in range(n)
    ]
    elem_nbrs: list[set] = [set() for _ in range(n)]
    elems: dict[int, set] = {}  # element id -> variable set
    alive = np.ones(n, dtype=bool)
    degree = np.array([len(s) for s in var_nbrs], dtype=np.int64)
    import heapq

    heap = [(int(degree[j]), j) for j in range(n)]
    heapq.heapify(heap)
    perm = np.empty(n, dtype=np.int64)
    k = 0
    while k < n:
        while True:
            d, v = heapq.heappop(heap)
            if alive[v] and d == degree[v]:
                break
        # form element from v
        lv = set(var_nbrs[v])
        for e in elem_nbrs[v]:
            lv |= elems[e]
        lv.discard(v)
        lv = {u for u in lv if alive[u]}
        # absorb v's elements
        for e in elem_nbrs[v]:
            del elems[e]
        elems[v] = lv
        alive[v] = False
        perm[k] = v
        k += 1
        for u in lv:
            var_nbrs[u].discard(v)
            var_nbrs[u] -= lv  # edges now represented by the element
            elem_nbrs[u] = {e for e in elem_nbrs[u] if e in elems}
            elem_nbrs[u].add(v)
            # approximate external degree
            du = len(var_nbrs[u])
            seen = set()
            for e in elem_nbrs[u]:
                seen |= elems[e]
            seen.discard(u)
            seen -= var_nbrs[u]
            du += len(seen)
            degree[u] = du
            heapq.heappush(heap, (du, u))
    return perm
