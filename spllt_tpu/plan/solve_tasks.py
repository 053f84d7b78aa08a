"""Static solve DAG: forward/backward triangular-solve tasks + levels.

Replaces the reference's solve dependency machinery
(``spllt_compute_solve_dep`` and the OMP task managers,
/root/reference/src/spllt_solve_dep_mod.F90, task_manager_omp.F90) with the
same plan-time leveling used for the factorization.  Two task kinds per
direction:

  SOLVE  (per diagonal tile): gather x rows of the tile, apply
         M^{-1} (fwd) or M^{-T} (bwd) where M = tile + I on padded diagonal
         = [[L,0],[B,I]] — one triangular solve covers both the diagonal
         solve and the within-tile below-row update (the reference needs
         ``slv_solve`` + part of ``slv_fwd_update`` for this,
         /root/reference/src/spllt_solve_kernels_mod.F90:11-138).
  UPD    (per off-diagonal tile): fwd: x[tile rows] -= blk @ x[cols];
         bwd: x[cols] -= blkᵀ @ x[tile rows].

Level rules: scatter-adds into x commute; solves are exclusive.  We track
per global row ``last_write`` (exclusive) and ``pending_add`` levels.
Invalid row slots point at the dump row index n (x has n+1 rows; masked
values are zero so the dump row stays zero).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .blocking import BlockPlan

__all__ = ["SolvePlan", "build_solve_plan"]


@dataclasses.dataclass
class SolvePlan:
    nb: int
    n: int
    nlevels_fwd: int
    nlevels_bwd: int
    # fwd solve (diag tiles)
    fsol_ptr: np.ndarray
    fsol_blk: np.ndarray
    fsol_rows: np.ndarray   # [T, nb] global rows (n = invalid)
    fsol_k: np.ndarray
    # fwd update (off-diag tiles)
    fupd_ptr: np.ndarray
    fupd_blk: np.ndarray
    fupd_rows: np.ndarray
    fupd_c0: np.ndarray
    fupd_k: np.ndarray
    # bwd update
    bupd_ptr: np.ndarray
    bupd_blk: np.ndarray
    bupd_rows: np.ndarray
    bupd_c0: np.ndarray
    bupd_k: np.ndarray
    # bwd solve
    bsol_ptr: np.ndarray
    bsol_blk: np.ndarray
    bsol_rows: np.ndarray
    bsol_k: np.ndarray


def _bucket(levels, nlevels, *fields):
    levels = np.asarray(levels, dtype=np.int64)
    order = np.argsort(levels, kind="stable")
    ptr = np.zeros(nlevels + 2, dtype=np.int64)
    np.add.at(ptr, levels + 1, 1)
    ptr = np.cumsum(ptr)
    out = []
    for f in fields:
        f = np.asarray(f)
        out.append(f[order] if len(order) else f)
    return ptr, out


def build_solve_plan(symb, plan: BlockPlan) -> SolvePlan:
    nb = plan.nb
    n = symb.n
    nnodes = plan.nnodes

    def tile_rows(nd, ib):
        s = plan.node_rptr[nd] + ib * nb
        e = min(plan.node_rptr[nd + 1], s + nb)
        out = np.full(nb, n, dtype=np.int64)
        out[: e - s] = plan.rows[s:e]
        return out

    # Leveling model (phase-aware): per global row, ``last_write`` = level
    # of the latest exclusive write, ``pending`` = max level of commutative
    # adds.  A diagonal-tile SOLVE writes its k column rows exclusively and
    # ADDS into its (shared, within-tile) below rows; UPD tasks are pure
    # adds.  The executors apply phases in a fixed order inside one level —
    # fwd: SOLVE then UPD, bwd: UPD then SOLVE — so dependencies along that
    # order share a level (1 level per pivot column on the critical path).

    # ---------------- forward ------------------------------------------- #
    last_write = np.zeros(n + 1, dtype=np.int64)
    pending = np.zeros(n + 1, dtype=np.int64)
    fsol = []   # (lvl, blk, rows, k)
    fupd = []   # (lvl, blk, rows, c0, k)
    for nd in range(nnodes):
        T = int(plan.node_ntiles[nd])
        C = int(plan.node_nctiles[nd])
        b0 = int(plan.node_blk_ptr[nd])
        w = int(plan.node_en[nd] - plan.node_sa[nd] + 1)
        for jb in range(C):
            d = b0 + jb * T - (jb * (jb - 1)) // 2
            k = min(nb, w - jb * nb)
            rows = tile_rows(nd, jb)
            colsv = rows[:k]                      # always valid (k <= blkm)
            belowv = rows[k:][rows[k:] < n]
            # strictly after any adds into our columns (UPD phase runs
            # after SOLVE within a level) and any exclusive write
            lvl = int(max(pending[colsv].max(initial=0) + 1,
                          last_write[colsv].max(initial=0) + 1,
                          last_write[belowv].max(initial=0) + 1,
                          1))
            last_write[colsv] = lvl
            pending[colsv] = lvl
            pending[belowv] = np.maximum(pending[belowv], lvl)
            fsol.append((lvl, d, rows, k))
            c0 = int(plan.node_sa[nd] + jb * nb)
            cols = np.arange(c0, c0 + k)
            for ib in range(jb + 1, T):
                blk = d + (ib - jb)
                wrows = tile_rows(nd, ib)
                wv = wrows[wrows < n]
                # may share the level with the SOLVE that produced cols
                ulvl = int(max(last_write[cols].max(initial=0),
                               last_write[wv].max(initial=0), 1))
                pending[wv] = np.maximum(pending[wv], ulvl)
                fupd.append((ulvl, blk, wrows, c0, k))
    nlev_f = max([t[0] for t in fsol + fupd], default=0)

    # ---------------- backward ------------------------------------------ #
    last_write = np.zeros(n + 1, dtype=np.int64)
    pending = np.zeros(n + 1, dtype=np.int64)
    bupd = []
    bsol = []
    for nd in range(nnodes - 1, -1, -1):
        T = int(plan.node_ntiles[nd])
        C = int(plan.node_nctiles[nd])
        b0 = int(plan.node_blk_ptr[nd])
        w = int(plan.node_en[nd] - plan.node_sa[nd] + 1)
        for jb in range(C - 1, -1, -1):
            d = b0 + jb * T - (jb * (jb - 1)) // 2
            k = min(nb, w - jb * nb)
            c0 = int(plan.node_sa[nd] + jb * nb)
            cols = np.arange(c0, c0 + k)
            for ib in range(jb + 1, T):
                blk = d + (ib - jb)
                rrows = tile_rows(nd, ib)
                rv = rrows[rrows < n]
                # strictly after the SOLVEs that finalized the read rows
                # (SOLVE phase runs after UPD within a level)
                ulvl = int(max(last_write[rv].max(initial=0) + 1,
                               last_write[cols].max(initial=0), 1))
                pending[cols] = np.maximum(pending[cols], ulvl)
                bupd.append((ulvl, blk, rrows, c0, k))
            rows = tile_rows(nd, jb)
            colsv = rows[:k]
            belowv = rows[k:][rows[k:] < n]
            # may share the level with the UPDs into its columns; must be
            # strictly after the SOLVEs that wrote the read below rows
            lvl = int(max(pending[colsv].max(initial=0),
                          last_write[colsv].max(initial=0) + 1,
                          last_write[belowv].max(initial=0) + 1,
                          1))
            last_write[colsv] = lvl
            pending[colsv] = lvl
            bsol.append((lvl, d, rows, k))
    nlev_b = max([t[0] for t in bsol + bupd], default=0)

    def stack_rows(tl, idx):
        if not tl:
            return np.empty((0, nb), dtype=np.int32)
        return np.stack([t[idx] for t in tl]).astype(np.int32)

    fs_ptr, (fs_blk, fs_k) = _bucket([t[0] for t in fsol], nlev_f,
                                     [t[1] for t in fsol],
                                     [t[3] for t in fsol])
    fs_rows_all = stack_rows(fsol, 2)
    order = np.argsort([t[0] for t in fsol], kind="stable")
    fs_rows = fs_rows_all[order] if len(order) else fs_rows_all

    fu_ptr, (fu_blk, fu_c0, fu_k) = _bucket(
        [t[0] for t in fupd], nlev_f, [t[1] for t in fupd],
        [t[3] for t in fupd], [t[4] for t in fupd])
    fu_rows_all = stack_rows(fupd, 2)
    order = np.argsort([t[0] for t in fupd], kind="stable")
    fu_rows = fu_rows_all[order] if len(order) else fu_rows_all

    bu_ptr, (bu_blk, bu_c0, bu_k) = _bucket(
        [t[0] for t in bupd], nlev_b, [t[1] for t in bupd],
        [t[3] for t in bupd], [t[4] for t in bupd])
    bu_rows_all = stack_rows(bupd, 2)
    order = np.argsort([t[0] for t in bupd], kind="stable")
    bu_rows = bu_rows_all[order] if len(order) else bu_rows_all

    bs_ptr, (bs_blk, bs_k) = _bucket([t[0] for t in bsol], nlev_b,
                                     [t[1] for t in bsol],
                                     [t[3] for t in bsol])
    bs_rows_all = stack_rows(bsol, 2)
    order = np.argsort([t[0] for t in bsol], kind="stable")
    bs_rows = bs_rows_all[order] if len(order) else bs_rows_all

    return SolvePlan(
        nb=nb, n=n, nlevels_fwd=nlev_f, nlevels_bwd=nlev_b,
        fsol_ptr=fs_ptr, fsol_blk=np.asarray(fs_blk, np.int64),
        fsol_rows=fs_rows, fsol_k=np.asarray(fs_k, np.int64),
        fupd_ptr=fu_ptr, fupd_blk=np.asarray(fu_blk, np.int64),
        fupd_rows=fu_rows, fupd_c0=np.asarray(fu_c0, np.int64),
        fupd_k=np.asarray(fu_k, np.int64),
        bupd_ptr=bu_ptr, bupd_blk=np.asarray(bu_blk, np.int64),
        bupd_rows=bu_rows, bupd_c0=np.asarray(bu_c0, np.int64),
        bupd_k=np.asarray(bu_k, np.int64),
        bsol_ptr=bs_ptr, bsol_blk=np.asarray(bs_blk, np.int64),
        bsol_rows=bs_rows, bsol_k=np.asarray(bs_k, np.int64),
    )
