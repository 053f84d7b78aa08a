"""Static factorization DAG: task construction + ASAP level schedule.

This module replaces the reference's dynamic task runtimes.  Where SpLLT
submits ``factorize_block`` / ``solve_block`` / ``update_block`` /
``update_between`` tasks to OpenMP/StarPU/PaRSEC with data dependencies
(/root/reference/src/spllt_factorization_task_mod.F90, factorize.jdf), we
enumerate the same four task kinds at plan time, compute an ASAP level for
every task from the block dependence structure, and bucket tasks by
(level, kind).  Execution is then a statically compiled sequence of batched
same-shape kernels — one batch per (level, kind) — under a single jit.

Level rule (all tasks inside one level are independent by construction):
  potrf(d):        lvl = upd_level[d] + 1;             fact_level[d] = lvl
  trsm(d → i):     lvl = max(fact[d], upd[i]) + 1;     fact_level[i] = lvl
  update(… → t):   lvl = max(fact[sources]) + 1;       upd_level[t] ⊔= lvl
(updates into the same target commute — executed as scatter-adds).

Inter-node updates (``update_between``) use deduplicated position-map
tables: for (source node s, ancestor a, tile tb of a) one int32[nb] vector
``map[t] = position of a.rows[tb·nb+t] in s.rows (or -1)``.  A task stores
(dest, map_row_id, map_col_id, k·nb threshold, source block base); validity
``p >= k·nb`` is evaluated in-kernel, so one map serves every source block
column k — the analogue of the reference's row/col scatter lists
(``spllt_update_between_compute_map``,
/root/reference/src/spllt_kernels_mod.F90:1606-1723) at a fraction of the
memory.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .blocking import BlockPlan, blk_id

__all__ = ["FactorPlan", "build_factor_plan"]


@dataclasses.dataclass
class FactorPlan:
    nb: int
    nblocks: int
    nlevels: int
    # potrf ---------------------------------------------------------------
    potrf_ptr: np.ndarray
    potrf_blk: np.ndarray
    potrf_k: np.ndarray
    # trsm ----------------------------------------------------------------
    trsm_ptr: np.ndarray
    trsm_diag: np.ndarray
    trsm_dst: np.ndarray
    trsm_k: np.ndarray
    # intra-node update (syrk/gemm) ---------------------------------------
    syrk_ptr: np.ndarray
    syrk_src_i: np.ndarray
    syrk_src_j: np.ndarray
    syrk_dst: np.ndarray
    # inter-node update (update_between) ----------------------------------
    updbt_ptr: np.ndarray
    updbt_dst: np.ndarray
    updbt_mr: np.ndarray
    updbt_mc: np.ndarray
    updbt_kthr: np.ndarray
    updbt_srcbase: np.ndarray
    maps: np.ndarray          # [nmaps, nb] int32, -1 = invalid slot
    # masks ---------------------------------------------------------------
    blk_n: np.ndarray         # int32[nblocks]
    num_tasks: int = 0

    def level_counts(self) -> dict:
        return {
            "potrf": np.diff(self.potrf_ptr),
            "trsm": np.diff(self.trsm_ptr),
            "syrk": np.diff(self.syrk_ptr),
            "updbt": np.diff(self.updbt_ptr),
        }


def _bucket(levels, nlevels, *fields):
    """Sort task tuples by level; return (ptr, sorted fields)."""
    levels = np.asarray(levels, dtype=np.int64)
    order = np.argsort(levels, kind="stable")
    ptr = np.zeros(nlevels + 2, dtype=np.int64)
    np.add.at(ptr, levels + 1, 1)
    ptr = np.cumsum(ptr)
    out = [np.asarray(f)[order] if len(order) else np.asarray(f)
           for f in fields]
    return ptr, out


def build_factor_plan(symb, plan: BlockPlan) -> FactorPlan:
    nb = plan.nb
    nnodes = plan.nnodes
    fact_level = np.zeros(plan.nblocks, dtype=np.int64)
    upd_level = np.zeros(plan.nblocks, dtype=np.int64)

    potrf = []   # (lvl, blk, k)
    trsm = []    # (lvl, diag, dst, k)
    syrk = []    # (lvl, src_i, src_j, dst)
    updbt = []   # (lvl, dst, mr, mc, kthr, srcbase)

    map_registry: dict[bytes, int] = {}
    map_list: list[np.ndarray] = []

    def register_map(vec: np.ndarray) -> int:
        key = vec.tobytes()
        mid = map_registry.get(key)
        if mid is None:
            mid = len(map_list)
            map_registry[key] = mid
            map_list.append(vec)
        return mid

    sparent = symb.forest.sparent
    rows_all = plan.rows
    rptr = plan.node_rptr

    for nd in range(nnodes):
        T = int(plan.node_ntiles[nd])
        C = int(plan.node_nctiles[nd])
        b0 = int(plan.node_blk_ptr[nd])

        def bid(ib, jb, _b0=b0, _T=T):
            return _b0 + jb * _T - (jb * (jb - 1)) // 2 + (ib - jb)

        # ---- intra-node right-looking factorization ---------------------- #
        for kb in range(C):
            d = bid(kb, kb)
            kcols = int(plan.blk_n[d])
            lvl = upd_level[d] + 1
            fact_level[d] = lvl
            potrf.append((lvl, d, kcols))
            for ib in range(kb + 1, T):
                t = bid(ib, kb)
                lvl = max(fact_level[d], upd_level[t]) + 1
                fact_level[t] = lvl
                trsm.append((lvl, d, t, kcols))
            for jb2 in range(kb + 1, C):
                sj = bid(jb2, kb)
                for ib2 in range(jb2, T):
                    si = bid(ib2, kb)
                    dst = bid(ib2, jb2)
                    lvl = max(fact_level[si], fact_level[sj]) + 1
                    syrk.append((lvl, si, sj, dst))
                    upd_level[dst] = max(upd_level[dst], lvl)

        # ---- inter-node updates into ancestors --------------------------- #
        nrows = rows_all[rptr[nd]:rptr[nd + 1]]
        anc = int(sparent[nd])
        while anc != -1:
            lo = int(np.searchsorted(nrows, plan.node_sa[anc]))
            if lo >= len(nrows):
                break
            hi = int(np.searchsorted(nrows, plan.node_en[anc] + 1))
            if hi > lo:
                s_glob = nrows[lo:]
                a_rows = rows_all[rptr[anc]:rptr[anc + 1]]
                pos_a = np.searchsorted(a_rows, s_glob)
                if __debug__:
                    assert np.all(a_rows[pos_a] == s_glob), \
                        "ancestor row structure violated"
                p_src = np.arange(lo, len(nrows), dtype=np.int64)
                tiles_a = pos_a // nb
                slots_a = pos_a % nb
                touched = np.unique(tiles_a)
                map_ids = {}
                tile_ps: dict[int, np.ndarray] = {}
                for tb in touched:
                    sel = tiles_a == tb
                    vec = np.full(nb, -1, dtype=np.int32)
                    vec[slots_a[sel]] = p_src[sel]
                    map_ids[int(tb)] = register_map(vec)
                    tile_ps[int(tb)] = p_src[sel]
                # column-role tiles: positions that are columns of anc
                ncols_part = hi - lo
                col_tiles = np.unique(tiles_a[:ncols_part])
                col_ps = {int(tb): p_src[:ncols_part][tiles_a[:ncols_part]
                                                      == tb]
                          for tb in col_tiles}
                aT = int(plan.node_ntiles[anc])
                a0 = int(plan.node_blk_ptr[anc])
                for kb in range(C):
                    thr = kb * nb
                    jlist = [tb for tb in col_tiles
                             if col_ps[int(tb)].max() >= thr]
                    ilist = [tb for tb in touched
                             if tile_ps[int(tb)].max() >= thr]
                    srcbase = b0 + kb * T - (kb * (kb - 1)) // 2 - kb
                    for jbt in jlist:
                        for ibt in ilist:
                            if ibt < jbt:
                                continue
                            ps_i = tile_ps[int(ibt)]
                            ps_j = col_ps[int(jbt)]
                            used = np.unique(np.concatenate(
                                [ps_i[ps_i >= thr], ps_j[ps_j >= thr]]
                            ) // nb)
                            lvl = 1 + max(
                                int(fact_level[srcbase + st]) for st in used)
                            dst = a0 + jbt * aT - (jbt * (jbt - 1)) // 2 \
                                + (ibt - jbt)
                            updbt.append((lvl, dst, map_ids[int(ibt)],
                                          map_ids[int(jbt)], thr, srcbase))
                            upd_level[dst] = max(upd_level[dst], lvl)
            anc = int(sparent[anc])

    nlevels = 0
    for tl in (potrf, trsm, syrk, updbt):
        if tl:
            nlevels = max(nlevels, max(t[0] for t in tl))

    def cols(tl, k):
        return [t[k] for t in tl]

    p_ptr, (p_blk, p_k) = _bucket(cols(potrf, 0), nlevels,
                                  cols(potrf, 1), cols(potrf, 2))
    t_ptr, (t_diag, t_dst, t_k) = _bucket(cols(trsm, 0), nlevels,
                                          cols(trsm, 1), cols(trsm, 2),
                                          cols(trsm, 3))
    s_ptr, (s_i, s_j, s_dst) = _bucket(cols(syrk, 0), nlevels,
                                       cols(syrk, 1), cols(syrk, 2),
                                       cols(syrk, 3))
    u_ptr, (u_dst, u_mr, u_mc, u_thr, u_sb) = _bucket(
        cols(updbt, 0), nlevels, cols(updbt, 1), cols(updbt, 2),
        cols(updbt, 3), cols(updbt, 4), cols(updbt, 5))

    maps = (np.stack(map_list) if map_list
            else np.empty((1, nb), dtype=np.int32))
    return FactorPlan(
        nb=nb, nblocks=plan.nblocks, nlevels=nlevels,
        potrf_ptr=p_ptr, potrf_blk=np.asarray(p_blk, np.int64),
        potrf_k=np.asarray(p_k, np.int64),
        trsm_ptr=t_ptr, trsm_diag=np.asarray(t_diag, np.int64),
        trsm_dst=np.asarray(t_dst, np.int64),
        trsm_k=np.asarray(t_k, np.int64),
        syrk_ptr=s_ptr, syrk_src_i=np.asarray(s_i, np.int64),
        syrk_src_j=np.asarray(s_j, np.int64),
        syrk_dst=np.asarray(s_dst, np.int64),
        updbt_ptr=u_ptr, updbt_dst=np.asarray(u_dst, np.int64),
        updbt_mr=np.asarray(u_mr, np.int64),
        updbt_mc=np.asarray(u_mc, np.int64),
        updbt_kthr=np.asarray(u_thr, np.int64),
        updbt_srcbase=np.asarray(u_sb, np.int64),
        maps=maps,
        blk_n=plan.blk_n.astype(np.int32),
        num_tasks=len(potrf) + len(trsm) + len(syrk) + len(updbt),
    )
