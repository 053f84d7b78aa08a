"""Supernode detection, nemin amalgamation, and L row-list construction.

Replaces the supernode partition SpLLT receives from SPRAL SSIDS
(``sptr``/``sparent``/``rptr``/``rlist``,
/root/reference/src/spllt_analyse_mod.F90:129-131) with our own bottom-up
pass: fundamental supernodes are found by exact zero-fill merging while L row
structures are built by child-row union (phase 1); a second tree pass
amalgamates small supernodes under the ``nemin`` rule (phase 2), mirroring
SSIDS's nemin semantics (default nemin=32,
/root/reference/src/spllt_data_mod.F90:36-39).

Input must already be permuted so that the elimination tree is postordered
(children of a column have smaller indices and sibling subtrees occupy
contiguous ranges) — guaranteed by analyse().
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["SupernodeForest", "find_supernodes"]


@dataclasses.dataclass
class SupernodeForest:
    """Supernodal structure of L (all indices in the permuted ordering).

    Attributes:
      nnodes: number of supernodes.
      sa, en: int64[nnodes] first/last column (inclusive) of each node.
      sparent: int64[nnodes] parent supernode (-1 for roots).
      rptr: int64[nnodes+1] pointers into ``rows``.
      rows: int64[sum m] per-node sorted global row lists; the first
        (en-sa+1) entries of a node's list are its own columns.
    """

    nnodes: int
    sa: np.ndarray
    en: np.ndarray
    sparent: np.ndarray
    rptr: np.ndarray
    rows: np.ndarray

    def node_rows(self, nd: int) -> np.ndarray:
        return self.rows[self.rptr[nd]:self.rptr[nd + 1]]

    def ncols(self, nd: int) -> int:
        return int(self.en[nd] - self.sa[nd] + 1)


def find_supernodes(
    n: int,
    colptr: np.ndarray,
    rowind: np.ndarray,
    parent: np.ndarray,
    nemin: int = 32,
) -> SupernodeForest:
    """Compute amalgamated supernodes + row lists of a postordered matrix."""
    from .native import native_supernodes_or_none

    nat = native_supernodes_or_none(n, colptr, rowind, parent, nemin)
    if nat is not None:
        sa, en, sparent, rptr, rows = nat
        return SupernodeForest(nnodes=len(sa), sa=sa, en=en,
                               sparent=sparent, rptr=rptr, rows=rows)
    # ---------------- phase 1: zero-fill supernodes + row lists ----------- #
    # Iterate columns ascending (== postorder).  For column j:
    #   struct(L col j) = A rows of col j ∪ ⋃_{c: parent(c)=j} struct(L col c)\{c}
    # Etree children of j are either (a) root columns of snodes closed
    # earlier (registered in pending[j]) or (b) the column j-1 when
    # parent(j-1) == j (the still-open previous snode).  Column j merges into
    # the previous snode iff case (b) holds and the merge adds no explicit
    # zeros: below(prev) == struct(L col j) as sets.
    f_sa: list[int] = []
    f_en: list[int] = []
    f_rows: list[np.ndarray] = []
    # pending[j] = snode ids whose root column's etree parent is column j
    pending: dict[int, list[int]] = {}

    for j in range(n):
        arows = rowind[colptr[j]:colptr[j + 1]]  # sorted, first entry is j
        contrib = [arows]
        prev_child = bool(f_en) and f_en[-1] == j - 1 and parent[j - 1] == j
        below_prev = None
        if prev_child:
            s_prev = len(f_en) - 1
            ncols_prev = f_en[s_prev] - f_sa[s_prev] + 1
            below_prev = f_rows[s_prev][ncols_prev:]
            contrib.append(below_prev)
        for s in pending.pop(j, ()):  # closed children snodes
            ncols_s = f_en[s] - f_sa[s] + 1
            contrib.append(f_rows[s][ncols_s:])
        rows_j = (np.unique(np.concatenate(contrib)) if len(contrib) > 1
                  else arows)

        if (prev_child and below_prev.shape == rows_j.shape
                and np.array_equal(below_prev, rows_j)):
            # exact zero-fill merge → extend the open supernode
            s = len(f_en) - 1
            ncols_old = f_en[s] - f_sa[s] + 1
            f_rows[s] = np.concatenate([f_rows[s][:ncols_old], rows_j])
            f_en[s] = j
        else:
            f_sa.append(j)
            f_en.append(j)
            f_rows.append(rows_j)
        # close the current snode unless column j+1 can still merge into it
        s = len(f_en) - 1
        p = int(parent[j])
        if p != -1 and p != j + 1:
            pending.setdefault(p, []).append(s)
        # (when p == j+1 the next iteration consumes this snode directly via
        #  the prev_child path, merge or not; when p == -1 it is a root)

    nf = len(f_sa)
    f_sa_a = np.asarray(f_sa, dtype=np.int64)
    f_en_a = np.asarray(f_en, dtype=np.int64)
    col_node = np.empty(n, dtype=np.int64)
    for s in range(nf):
        col_node[f_sa_a[s]:f_en_a[s] + 1] = s
    f_parent = np.full(nf, -1, dtype=np.int64)
    for s in range(nf):
        p = parent[f_en_a[s]]
        f_parent[s] = col_node[p] if p != -1 else -1

    # ---------------- phase 2: nemin amalgamation ------------------------- #
    # Merge child c into parent p when the child's columns are contiguous
    # with the parent's and BOTH sides have fewer than nemin columns (the
    # SSIDS nemin rule — merging on "either" collapses chains of small
    # supernodes into one dense giant, n²/2 fill on banded orderings).  After
    # merging, rows(p) = cols(c) ∪ rows(p)  (below(c) ⊆ rows(p) because
    # struct(L_{:,c})\{c} ⊆ struct(L_{:,parent(c)}) transitively).
    alive = np.ones(nf, dtype=bool)
    sa_m = f_sa_a.copy()
    en_m = f_en_a.copy()
    rows_m: list[np.ndarray] = list(f_rows)
    parent_m = f_parent.copy()

    def find_rep(s: int, rep: np.ndarray) -> int:
        while rep[s] != s:
            rep[s] = rep[rep[s]]
            s = rep[s]
        return s

    rep = np.arange(nf, dtype=np.int64)
    if nemin > 1:
        # process children in ascending order so chains collapse bottom-up
        for c in range(nf):
            p = parent_m[c]
            if p == -1:
                continue
            p = find_rep(int(p), rep)
            c_r = find_rep(c, rep)
            if c_r == p:
                continue
            ncols_c = int(en_m[c_r] - sa_m[c_r] + 1)
            ncols_p = int(en_m[p] - sa_m[p] + 1)
            if en_m[c_r] + 1 != sa_m[p]:
                continue  # not contiguous (only last child can be)
            if ncols_c >= nemin or ncols_p >= nemin:
                continue
            # merge c_r into p
            own_c = rows_m[c_r][:ncols_c]
            rows_m[p] = np.concatenate([own_c, rows_m[p]])
            sa_m[p] = sa_m[c_r]
            alive[c_r] = False
            rep[c_r] = p

    # ---------------- renumber ------------------------------------------- #
    keep = np.nonzero(alive)[0]
    order = np.argsort(sa_m[keep], kind="stable")
    keep = keep[order]
    newid = np.full(nf, -1, dtype=np.int64)
    newid[keep] = np.arange(len(keep))
    nnodes = len(keep)
    sa = sa_m[keep]
    en = en_m[keep]
    rows_list = [rows_m[s] for s in keep]
    rptr = np.zeros(nnodes + 1, dtype=np.int64)
    rptr[1:] = np.cumsum([len(r) for r in rows_list])
    rows = (np.concatenate(rows_list) if nnodes else
            np.empty(0, dtype=np.int64))
    col_node2 = np.empty(n, dtype=np.int64)
    for s in range(nnodes):
        col_node2[sa[s]:en[s] + 1] = s
    sparent = np.full(nnodes, -1, dtype=np.int64)
    for s in range(nnodes):
        p = parent[en[s]]
        sparent[s] = col_node2[p] if p != -1 else -1
    return SupernodeForest(nnodes=nnodes, sa=sa, en=en, sparent=sparent,
                           rptr=rptr, rows=rows)
