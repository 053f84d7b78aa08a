"""Whole-factorization pallas megakernel.

The bucketed scan executor still pays one kernel launch per (level, kind)
plus XLA gather/scatter glue around the batched potrf/trsm calls — ~35
levels x ~6 dispatches with a per-launch floor puts level sequencing on
the critical path.  This module compiles the ENTIRE numeric factorization
into ONE pallas kernel (chunked only by the SMEM scalar-table budget):

  * the plan's tasks are flattened into a single micro-task stream in
    dependency order: per level, [UPD...] (between-updates expanded to
    per-source-column micro-tasks, merged with intra-node syrk/gemm as
    identity-map tasks, destination-sorted) then [POTRF...] then
    [TRSM...], each run padded to the grid-step group size
  * the TPU grid is sequential, so one grid step per ``group`` tasks of
    one kind executes the schedule in order with zero launch overhead
  * every step DMAs its own nb-row pool windows (double-buffered across
    steps); at run boundaries a host-computed ``drain`` flag defers the
    window prefetch until all deferred destination writes completed —
    the only synchronization the schedule needs
  * task kinds share the scalar tables: wr/wc (window row bases), dst
    (destination row base), aux (UPD: blkn | first<<10 | last<<11;
    POTRF/TRSM: column count kv)

Kind bodies reuse the standalone kernels' elimination routines
(pallas_potrf.potrf_tiles_body, pallas_trsm.trsm_tiles_body) and the
fused update pipeline of pallas_update (one-hot MXU row gathers from
nb-row windows, VMEM destination accumulation, deferred RMW writeback).

Destination accumulation (round-5 redesign) is branch-free segment
reduction: tasks are destination-sorted, so each step's ``group`` tasks
form <= group contiguous same-destination segments.  The per-task keep
flag (task i continues task i-1's segment) drives a segmented inclusive
running sum over the group axis — statically sliced register values
with SMEM scalar multipliers, no dynamic VMEM indexing or scratch RMW.
Slot i then holds the sum of its segment up to i; segment COMPLETIONS
(host-computed: the slot is its destination's stream-global group end)
RMW their destination tile from that slot.  The destination reads are
prefetched ONE STEP AHEAD (the completion schedule is static), so the
HBM round-trip that used to stall short dest groups is hidden.  A
partial segment spanning the step boundary is carried in ``acc``.

Reference analogue: this is the STF task stream of
``spllt_stf_factorize`` (/root/reference/src/spllt_stf_mod.F90:18-192)
executed as one statically scheduled device program instead of a
dynamic task runtime.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_potrf import potrf_tiles_body, scalars_to_vec
from .pallas_trsm import trsm_tiles_body
from .pallas_update import build_micro_tasks, onehot_gather

__all__ = ["build_mega_stream", "mega_factorize", "MegaFactorExecutor"]


def rel_dtype(nb: int):
    """Narrowest dtype for the relr/relc position maps: entries are
    window-relative (in [-1, nb)), so int8 suffices at nb <= 128.  At
    Poisson 96³ the int32 maps were 3.9 GB of HBM — the term that
    pushed the single-chip footprint over the v5e's 16 GB."""
    return np.int8 if nb <= 128 else np.int16

KIND_UPD, KIND_POTRF, KIND_TRSM = 0, 1, 2
KIND_NOOP = -1           # padded steps: no loads, no compute, no writes
# UPD aux bit layout (per slot i of a step): bits 0-9 blkn of task i,
# bit 10 keep (task i continues the within-step segment; the scan's
# propagate flag), bit 11 sact (task i's segment COMPLETES at slot i ->
# dest RMW from the scanned slot), bits 12-15 seg (within-step segment
# index of task i; the carry subtraction tests seg == 0).
# POTRF/TRSM aux = kv (< 1024).
_BLKN_BITS = 10
_KEEP_BIT, _SACT_BIT, _SEG_BITS = 10, 11, 12
# segmeta bit layout (per step): bit 0 cin (task 0 continues the carry
# accumulator), bit 1 c2 (the carry stays open through this step)
_META_C2_BIT = 1


def _i0():
    import jax.numpy as jnp
    return jnp.int32(0)


# ===================================================================== #
# stream construction (host side)
# ===================================================================== #

def _upd_slot_tables(d, blkn, group, scratch):
    """Per-slot segment tables for one emitted UPD piece.

    ``d`` is the destination row per task (dest-sorted, length a
    multiple of ``group``).  Returns (aux, dst_slots, segmeta): aux
    packs blkn|keep|sact|seg per slot (see the bit-layout constants),
    dst_slots[t*G+i] is the dest row that slot i RMWs when its segment
    completes there (scratch if none — padded scratch-dest slots are
    marked inactive so padding costs no DMA at all), and segmeta packs
    the per-step carry flags cin|c2.  A piece cut closes the segment at
    the cut: the partial sum RMWs its destination and the next piece
    re-reads it (partial updates into one destination commute, and
    piece starts are drain steps, so the write completes first).
    """
    k = len(d)
    nst = k // group
    D = d.reshape(nst, group)
    first = np.empty(k, bool)
    first[0] = True
    first[1:] = d[1:] != d[:-1]
    last = np.empty(k, bool)
    last[-1] = True
    last[:-1] = d[:-1] != d[1:]
    F = first.reshape(nst, group)
    L = last.reshape(nst, group)
    inc = F.copy()
    inc[:, 0] = False               # slot 0 is always within-step seg 0
    seg = np.cumsum(inc, axis=1)
    keep = ~F
    keep[:, 0] = False              # scan restarts per step; carry in acc
    sact = L & (D != scratch)       # padded tail: skip the scratch RMW
    sdst = np.where(L, D, scratch)
    cin = F[:, 0] == 0
    open_ = L[:, -1] == 0
    c2 = cin & open_ & (seg[:, -1] == 0)
    meta = (cin.astype(np.int64)
            | (c2.astype(np.int64) << _META_C2_BIT))
    aux = (blkn.reshape(nst, group)
           | (keep.astype(np.int64) << _KEEP_BIT)
           | (sact.astype(np.int64) << _SACT_BIT)
           | (seg.astype(np.int64) << _SEG_BITS)).reshape(k)
    return aux, sdst.reshape(k), meta


def build_mega_stream(fp, group: int, pool_rows: int,
                      kmax: int = 16384) -> list[dict]:
    """Flatten the FactorPlan into chunked megakernel task streams.

    Returns a list of chunks; each chunk holds int32 arrays
    ``kind``/``drain`` per grid step and ``wr``/``wc``/``dst``/``aux``
    per task plus ``relr``/``relc`` [K, nb] position maps.  Chunks split
    only at drain (run-boundary) steps, so each chunk is independent
    under the executor's sequential chaining.
    """
    nb = fp.nb
    scratch = fp.nblocks * nb            # flat row base of the pad tile
    iden = np.arange(nb, dtype=np.int32)

    # raw runs: (kind, wr, wc, dst, aux_or_blkn, relr, relc); slot
    # tables are computed AFTER balanced chunk partitioning, per final
    # piece, so pieces may cut runs at any group boundary (the cut
    # closes open segments — see _upd_slot_tables)
    runs = []

    def emit(kind, wr, wc, dst, aux, relr, relc, blkn=None):
        runs.append((kind, wr, wc, dst,
                     blkn if kind == KIND_UPD else aux, relr, relc))

    for lvl in range(1, fp.nlevels + 1):
        # ---- UPD: between-update micro-tasks + intra-node syrk ------- #
        mt = build_micro_tasks(fp, lvl, lvl, nb, pool_rows)
        k_upd = len(mt["dst"])
        s0, s1 = int(fp.syrk_ptr[lvl]), int(fp.syrk_ptr[lvl + 1])
        k_syrk = s1 - s0
        if k_upd + k_syrk:
            dst = np.concatenate([
                mt["dst"].astype(np.int64) * nb,
                fp.syrk_dst[s0:s1] * nb]).astype(np.int64)
            wr = np.concatenate([
                mt["lor"].astype(np.int64),
                fp.syrk_src_i[s0:s1] * nb]).astype(np.int64)
            wc = np.concatenate([
                mt["loc"].astype(np.int64),
                fp.syrk_src_j[s0:s1] * nb]).astype(np.int64)
            blkn = np.concatenate([
                mt["blkn"].astype(np.int64),
                fp.blk_n[fp.syrk_dst[s0:s1]].astype(np.int64)])
            relr = np.concatenate([
                mt["relr"], np.tile(iden, (k_syrk, 1))], axis=0)
            relc = np.concatenate([
                mt["relc"], np.tile(iden, (k_syrk, 1))], axis=0)
            order = np.argsort(dst, kind="stable")
            dst, wr, wc, blkn = dst[order], wr[order], wc[order], \
                blkn[order]
            relr, relc = relr[order], relc[order]
            k = len(dst)
            kp = -(-k // group) * group
            if kp != k:
                pad = kp - k
                dst = np.concatenate([dst, np.full(pad, scratch)])
                wr = np.concatenate([wr, np.full(pad, scratch)])
                wc = np.concatenate([wc, np.full(pad, scratch)])
                blkn = np.concatenate([blkn, np.zeros(pad, np.int64)])
                relr = np.concatenate(
                    [relr, np.full((pad, nb), -1, np.int32)])
                relc = np.concatenate(
                    [relc, np.full((pad, nb), -1, np.int32)])
            emit(KIND_UPD, wr, wc, dst, None, relr, relc, blkn=blkn)

        # ---- POTRF (kv-sorted descending, plan pre-sorts) ------------- #
        p0, p1 = int(fp.potrf_ptr[lvl]), int(fp.potrf_ptr[lvl + 1])
        if p1 > p0:
            blk = fp.potrf_blk[p0:p1] * nb
            kv = fp.potrf_k[p0:p1].astype(np.int64)
            k = p1 - p0
            kp = -(-k // group) * group
            if kp != k:
                blk = np.concatenate([blk, np.full(kp - k, scratch)])
                kv = np.concatenate([kv, np.zeros(kp - k, np.int64)])
            z2 = np.zeros((kp, nb), np.int32)
            emit(KIND_POTRF, blk, blk, blk, kv, z2, z2)

        # ---- TRSM ------------------------------------------------------ #
        t0, t1 = int(fp.trsm_ptr[lvl]), int(fp.trsm_ptr[lvl + 1])
        if t1 > t0:
            diag = fp.trsm_diag[t0:t1] * nb
            dstt = fp.trsm_dst[t0:t1] * nb
            kv = fp.trsm_k[t0:t1].astype(np.int64)
            k = t1 - t0
            kp = -(-k // group) * group
            if kp != k:
                diag = np.concatenate([diag, np.full(kp - k, scratch)])
                dstt = np.concatenate([dstt, np.full(kp - k, scratch)])
                kv = np.concatenate([kv, np.zeros(kp - k, np.int64)])
            z2 = np.zeros((kp, nb), np.int32)
            emit(KIND_TRSM, diag, dstt, dstt, kv, z2, z2)

    # ---- balanced chunk partition under the SMEM task budget --------- #
    # chunks share ONE compiled program (uniform shapes), so unequal
    # chunks pad with dead steps up to the longest.  Cut the stream at
    # exact group boundaries every ceil(total/nchunks) steps — runs that
    # straddle a cut are split there (the cut closes open UPD segments,
    # which commutes; piece starts are drain steps) — so uniform padding
    # is < nchunks steps total.
    total = sum(len(r[1]) for r in runs)
    nchunks = max(1, -(-total // kmax))
    tgt = -(-(total // group) // nchunks)      # steps per chunk
    chunks = []
    cur = None
    room = 0

    def flush():
        nonlocal cur
        if cur is None:
            return
        chunks.append({
            "kind": np.asarray(cur["kind"], np.int32),
            "drain": np.asarray(cur["drain"], np.int32),
            "segmeta": np.concatenate(cur["segmeta"]).astype(np.int32),
            "wr": np.concatenate(cur["wr"]).astype(np.int32),
            "wc": np.concatenate(cur["wc"]).astype(np.int32),
            "dst": np.concatenate(cur["dst"]).astype(np.int32),
            "aux": np.concatenate(cur["aux"]).astype(np.int32),
            "relr": np.concatenate(cur["relr"], axis=0).astype(
                rel_dtype(nb)),
            "relc": np.concatenate(cur["relc"], axis=0).astype(
                rel_dtype(nb)),
        })
        cur = None

    def put(kind, wr, wc, dst, bk, relr, relc):
        nonlocal cur, room
        if cur is None:
            cur = {"kind": [], "drain": [], "segmeta": [], "wr": [],
                   "wc": [], "dst": [], "aux": [], "relr": [],
                   "relc": []}
            room = tgt
        if kind == KIND_UPD:
            aux, dstp, meta = _upd_slot_tables(dst, bk, group, scratch)
        else:
            aux, dstp = bk, dst
            meta = np.zeros(len(wr) // group, np.int64)
        nsteps = len(wr) // group
        cur["kind"].extend([kind] * nsteps)
        cur["drain"].extend([1] + [0] * (nsteps - 1))
        cur["segmeta"].append(meta)
        cur["wr"].append(wr)
        cur["wc"].append(wc)
        cur["dst"].append(dstp)
        cur["aux"].append(aux)
        cur["relr"].append(relr.astype(np.int32))
        cur["relc"].append(relc.astype(np.int32))
        room -= nsteps
        if room <= 0:
            flush()

    for kind, wr, wc, dst, bk, relr, relc in runs:
        o = 0
        k = len(wr)
        while k - o > 0:
            take = min(k - o, (room if cur is not None else tgt) * group)
            sl = slice(o, o + take)
            put(kind, wr[sl], wc[sl], dst[sl],
                bk[sl] if bk is not None else None,
                relr[sl], relc[sl])
            o += take
    flush()
    return pad_chunks_uniform(chunks, group, nb, scratch)


def pad_chunks_uniform(chunks, group: int, nb: int, scratch: int):
    """Pad every chunk's stream to the max step count with KIND_NOOP
    steps (no loads, no compute — the kernel skips them at the grid-step
    floor only), so ALL chunks share one static shape and compile to ONE
    pallas program (49 chunks at Poisson 64³ would otherwise each
    compile separately: ~minutes per program)."""
    if len(chunks) <= 1:
        return chunks
    tmax = max(len(c["kind"]) for c in chunks)
    for c in chunks:
        pad = tmax - len(c["kind"])
        if pad == 0:
            continue
        k = pad * group
        c["kind"] = np.concatenate(
            [c["kind"], np.full(pad, KIND_NOOP, np.int32)])
        c["drain"] = np.concatenate(
            [c["drain"], np.ones(1, np.int32),
             np.zeros(pad - 1, np.int32)])
        c["segmeta"] = np.concatenate(
            [c["segmeta"], np.zeros(pad, np.int32)])
        for nm in ("wr", "wc", "dst"):
            c[nm] = np.concatenate(
                [c[nm], np.full(k, scratch, np.int32)])
        # keep=0, sact=0, seg=0: padded slots do no accumulation or DMA
        c["aux"] = np.concatenate([c["aux"], np.zeros(k, np.int32)])
        for nm in ("relr", "relc"):
            c[nm] = np.concatenate(
                [c[nm], np.full((k, nb), -1, c[nm].dtype)], axis=0)
    return chunks


# ===================================================================== #
# kernel
# ===================================================================== #

def _kernel(kind_ref, drain_ref, segmeta_ref, wr_ref, wc_ref, dst_ref,
            aux_ref, relr, relc, poolf_hbm, out_hbm,
            acc, winr, winc, dtile, pscr, wrow,
            semr, semc, semd_r, semd_w, semw,
            *, nb, group, nsteps, pb, precision,
            ablate=frozenset()):
    """One grid step = ``group`` micro-tasks of one kind.

    Window prefetch is kind-independent (wr/wc row bases); ``drain``
    steps wait the deferred UPD destination writes before loading their
    own windows (run boundaries are the only cross-kind hazards — see
    module docstring).  UPD destination tiles are prefetched one step
    ahead into ``dtile[2, group]`` per the static completion schedule
    (aux sact bits); ``wrow`` (SMEM [2*group]) tracks the pending
    deferred-write row of each dtile slot (-1 = none).
    """
    t = pl.program_id(0)
    slot = jax.lax.rem(jnp.int32(t), jnp.int32(2))
    nxt = jax.lax.rem(jnp.int32(t) + jnp.int32(1), jnp.int32(2))
    f32 = winr.dtype
    one_c = jnp.int32(1)
    sh_keep = jnp.int32(_KEEP_BIT)
    sh_sact = jnp.int32(_SACT_BIT)
    sh_seg = jnp.int32(_SEG_BITS)
    mask4 = jnp.int32(15)

    def start_wins_abl(s, step):   # ablation: cost-attribution no-op
        pass

    def start_wins_real(s, step):
        # reads go through the aliased OUTPUT ref: the input ref is only
        # the initial content (in interpret mode they are distinct
        # buffers, so reading poolf_hbm would miss earlier writebacks).
        # NOOP (padded) steps start no copies — the wait side is gated
        # on the same predicate, so semaphores stay matched.
        @pl.when(kind_ref[step] != jnp.int32(KIND_NOOP))
        def _():
            for i_ in range(group):
                i = jnp.int32(i_)   # python ints trace i64 under x64
                pltpu.make_async_copy(
                    out_hbm.at[pl.ds(wr_ref[step * group + i_], nb)],
                    winr.at[s, i], semr.at[s, i]).start()
                pltpu.make_async_copy(
                    out_hbm.at[pl.ds(wc_ref[step * group + i_], nb)],
                    winc.at[s, i], semc.at[s, i]).start()

    start_wins = (start_wins_abl if "dma" in ablate else start_wins_real)

    def sact_of(step_slot):
        return jnp.bitwise_and(
            jax.lax.shift_right_logical(aux_ref[step_slot], sh_sact),
            one_c) > 0

    def wait_write(p, s_):
        # p traced 0/1, s_ python int: finish the deferred write held by
        # dtile slot (p, s_); wrow stores its destination row
        pltpu.make_async_copy(
            dtile.at[p, jnp.int32(s_)],
            out_hbm.at[pl.ds(wrow[p * jnp.int32(group) + jnp.int32(s_)],
                             nb)],
            semd_w.at[p, jnp.int32(s_)]).wait()
        wrow[p * jnp.int32(group) + jnp.int32(s_)] = jnp.int32(-1)

    def start_dest_reads(p, step):
        # prefetch the dest tiles of ``step``'s completing segments
        if "rmw" in ablate:
            return      # ablation skips the completion loop that waits
        for s_ in range(group):
            @pl.when(sact_of(step * group + s_))
            def _(s_=s_):
                @pl.when(wrow[p * jnp.int32(group) + jnp.int32(s_)] >= 0)
                def _():
                    wait_write(p, s_)
                pltpu.make_async_copy(
                    out_hbm.at[pl.ds(dst_ref[step * group + s_], nb)],
                    dtile.at[p, jnp.int32(s_)],
                    semd_r.at[p, jnp.int32(s_)]).start()

    @pl.when(t == 0)
    def _():
        acc[:, :] = jnp.zeros((nb, nb), f32)
        for j_ in range(2 * group):
            wrow[j_] = jnp.int32(-1)

    # run boundary: finish ALL deferred writes, then load this step's
    # windows and (same-step) destination tiles
    @pl.when(drain_ref[t] > 0)
    def _():
        for p_ in (0, 1):
            for s_ in range(group):
                @pl.when(wrow[p_ * group + s_] >= 0)
                def _(p_=p_, s_=s_):
                    wait_write(jnp.int32(p_), s_)
        start_wins(slot, t)

        @pl.when(kind_ref[t] == jnp.int32(KIND_UPD))
        def _():
            start_dest_reads(slot, t)

    # steady state: prefetch the next step's windows and dest tiles
    # (skipped across run boundaries — the next run may read tiles this
    # run still writes)
    nxt_drain = drain_ref[jnp.minimum(t + 1, nsteps - 1)]
    @pl.when(jnp.logical_and(t + 1 < nsteps, nxt_drain == 0))
    def _():
        start_wins(nxt, t + 1)

        @pl.when(kind_ref[jnp.minimum(t + 1, nsteps - 1)]
                 == jnp.int32(KIND_UPD))
        def _():
            start_dest_reads(nxt, t + 1)

    kind = kind_ref[t]

    if "dma" not in ablate:
        @pl.when(kind != jnp.int32(KIND_NOOP))
        def _():
            for i_ in range(group):
                i = jnp.int32(i_)
                pltpu.make_async_copy(
                    out_hbm.at[pl.ds(wr_ref[t * group + i_], nb)],
                    winr.at[slot, i], semr.at[slot, i]).wait()
                pltpu.make_async_copy(
                    out_hbm.at[pl.ds(wc_ref[t * group + i_], nb)],
                    winc.at[slot, i], semc.at[slot, i]).wait()

    # ------------------------------------------------------------------ #
    @pl.when(kind == KIND_UPD)
    def _():
        iot3 = jax.lax.broadcasted_iota(jnp.int32, (group, nb, nb), 2)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (group, nb, 1), 1)
        # explicit int32 constants: under jax x64 mode python ints trace
        # as int64 and the SMEM scalars are int32
        mask_c = jnp.int32((1 << _BLKN_BITS) - 1)
        bkv = scalars_to_vec(
            [jnp.bitwise_and(aux_ref[t * group + i], mask_c)
             for i in range(group)], group)
        # rel maps ship as int8/int16 (window-relative entries < nb);
        # widen once for the iota compares
        rr3 = relr[...].astype(jnp.int32)[:, :, None]    # [G, nb, 1]
        rc3 = relc[...].astype(jnp.int32)[:, :, None]
        if "gather" in ablate:
            r3 = winr[slot]
            c3 = jnp.where(rowi < bkv, winc[slot], 0.0)
        else:
            ponr = (iot3 == rr3) & (rr3 >= 0)
            ponc = (iot3 == rc3) & (rc3 >= 0) & (rowi < bkv)
            r3 = onehot_gather(ponr, winr[slot], group)
            c3 = onehot_gather(ponc, winc[slot], group)
        if "main" in ablate:
            u3 = r3 + c3
        else:
            u3 = jax.lax.dot_general(r3, c3,
                                     (((2,), (2,)), ((0,), (0,))),
                                     precision=precision,
                                     preferred_element_type=jnp.float32)
        if "rmw" in ablate:
            acc[:, :] = u3[0]
            return

        # segmented inclusive running sum over the group axis: slot i
        # ends up holding the sum of its segment's tasks up to i.  All
        # slices are static and the per-slot keep flags are SMEM scalars
        # (scalar*vector broadcasts lower cleanly) — no dynamic VMEM
        # indexing, no VMEM scratch round trip.
        x = [u3[0]]
        for i in range(1, group):
            kf = jnp.bitwise_and(
                jax.lax.shift_right_logical(aux_ref[t * group + i],
                                            sh_keep), one_c).astype(f32)
            x.append(x[i - 1] * kf + u3[i])

        # segment completions: prefetched dest tile - scanned slot sum
        meta = segmeta_ref[t]
        cinf = jnp.bitwise_and(meta, one_c).astype(f32)
        for s_ in range(group):
            @pl.when(sact_of(t * group + s_))
            def _(s_=s_):
                si = jnp.int32(s_)
                pltpu.make_async_copy(
                    out_hbm.at[pl.ds(dst_ref[t * group + s_], nb)],
                    dtile.at[slot, si], semd_r.at[slot, si]).wait()
                # the incoming carry belongs to the step's segment 0
                segz = (jnp.bitwise_and(
                    jax.lax.shift_right_logical(
                        aux_ref[t * group + s_], sh_seg), mask4)
                    == 0).astype(f32)
                dtile[slot, si] = (dtile[slot, si] - x[s_]
                                   - acc[:, :] * (cinf * segz))
                row = dst_ref[t * group + s_]
                pltpu.make_async_copy(
                    dtile.at[slot, si], out_hbm.at[pl.ds(row, nb)],
                    semd_w.at[slot, si]).start()
                wrow[slot * jnp.int32(group) + si] = row

        # carry the open segment's partial across the step boundary
        c2f = jnp.bitwise_and(
            jax.lax.shift_right_logical(meta, jnp.int32(_META_C2_BIT)),
            one_c).astype(f32)
        acc[:, :] = x[group - 1] + acc[:, :] * c2f

    # ------------------------------------------------------------------ #
    def kv_and_max():
        vals = [aux_ref[t * group + i] for i in range(group)]
        kv = scalars_to_vec(vals, group)
        kvmax = vals[0]
        for v in vals[1:]:
            kvmax = jnp.maximum(kvmax, v)
        return kv, kvmax

    def write_back(buf, s):
        # synchronous per-step result writeback (waited before the step
        # ends, so run-boundary drains only track the UPD dtile slots)
        for i_ in range(group):
            i = jnp.int32(i_)
            pltpu.make_async_copy(
                buf.at[s, i], out_hbm.at[pl.ds(dst_ref[t * group + i_], nb)],
                semw.at[i]).start()
        for i_ in range(group):
            i = jnp.int32(i_)
            pltpu.make_async_copy(
                buf.at[s, i], out_hbm.at[pl.ds(dst_ref[t * group + i_], nb)],
                semw.at[i]).wait()

    # panel bodies stay exact f32 even at precision=default: the potrf
    # divisions/sqrt are numerically sensitive and a negligible flop
    # fraction — only the update contractions take the 1-pass bf16 cut
    panel_prec = jax.lax.Precision.HIGHEST

    if "potrf" not in ablate:
        @pl.when(kind == KIND_POTRF)
        def _():
            kv, kvmax = kv_and_max()
            out = potrf_tiles_body(pscr, winr[slot], kv, kvmax, nb=nb,
                                   pb=pb, group=group,
                                   precision=panel_prec)
            winr[slot] = out
            write_back(winr, slot)

    if "trsm" not in ablate:
        @pl.when(kind == KIND_TRSM)
        def _():
            kv, kvmax = kv_and_max()
            out = trsm_tiles_body(pscr, winr[slot],
                                  jnp.swapaxes(winc[slot], 1, 2), kv,
                                  kvmax, nb=nb, pb=pb, group=group,
                                  precision=panel_prec)
            winc[slot] = out
            write_back(winc, slot)

    # chunk end: drain deferred UPD writes (the next chunk re-inits
    # wrow at its t == 0)
    @pl.when(t == nsteps - 1)
    def _():
        for p_ in (0, 1):
            for s_ in range(group):
                @pl.when(wrow[p_ * group + s_] >= 0)
                def _(p_=p_, s_=s_):
                    wait_write(jnp.int32(p_), s_)


def mega_factorize(poolf, chunks, nb: int, group: int,
                   interpret: bool = False,
                   precision=jax.lax.Precision.HIGHEST,
                   ablate=frozenset()):
    """Run the chunked megakernel stream over the flat pool [R, nb]."""
    pb = next((c for c in (32, 16, 8) if nb % c == 0), nb)
    for ch in chunks:
        nsteps = len(ch["kind"])
        if nsteps == 0:
            continue
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((group, nb), lambda t, *_: (t, _i0())),
                pl.BlockSpec((group, nb), lambda t, *_: (t, _i0())),
                pl.BlockSpec(memory_space=pl.ANY),    # poolf (HBM)
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((nb, nb), jnp.float32),            # acc
                pltpu.VMEM((2, group, nb, nb), jnp.float32),  # winr
                pltpu.VMEM((2, group, nb, nb), jnp.float32),  # winc
                pltpu.VMEM((2, group, nb, nb), jnp.float32),  # dtile
                pltpu.VMEM((group, nb, nb), jnp.float32),     # pscr
                pltpu.SMEM((2 * group,), jnp.int32),          # wrow
                pltpu.SemaphoreType.DMA((2, group)),          # semr
                pltpu.SemaphoreType.DMA((2, group)),          # semc
                pltpu.SemaphoreType.DMA((2, group)),          # dtile reads
                pltpu.SemaphoreType.DMA((2, group)),          # dtile writes
                pltpu.SemaphoreType.DMA((group,)),            # writebacks
            ],
        )
        fn = pl.pallas_call(
            functools.partial(_kernel, nb=nb, group=group, nsteps=nsteps,
                              pb=pb, precision=precision, ablate=ablate),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(poolf.shape, poolf.dtype),
            input_output_aliases={9: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )
        poolf = fn(ch["kind"], ch["drain"], ch["segmeta"], ch["wr"],
                   ch["wc"], ch["dst"], ch["aux"], ch["relr"],
                   ch["relc"], poolf)
    return poolf


# ===================================================================== #
# executor
# ===================================================================== #

def _on_cpu() -> bool:
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", "") == "cpu"
    return jax.default_backend() == "cpu"


class MegaFactorExecutor:
    """Single-kernel factorization executor (f32 pools).

    API-compatible with ScanFactorExecutor: ``__call__(pool_ext)`` with
    the trailing scratch block returns ``(pool, not_posdef_flag)``.
    """

    def __init__(self, fp, dtype=jnp.float32, matmul_precision="highest",
                 group: int | None = None, interpret: bool | None = None,
                 ablate=frozenset()):
        if np.dtype(dtype) != np.float32:
            raise ValueError("megakernel executor is float32-only")
        if matmul_precision not in ("highest", "high", "default"):
            raise ValueError(
                "megakernel precision must be highest|high|default")
        self.fp = fp
        self.nb = fp.nb
        self._interpret = _on_cpu() if interpret is None else interpret
        if not self._interpret and fp.nb % 128 != 0:
            raise ValueError("megakernel needs nb % 128 == 0 on TPU")
        self._group = group or (2 if self._interpret else 8)
        self.pool_rows = (fp.nblocks + 1) * fp.nb
        # Mosaic lowers only DEFAULT/HIGHEST ('high' would need a manual
        # 3-pass bf16 split); 'default' = the bf16+IR operating point:
        # the UPDATE contractions (the flop bulk) run as ONE bf16 MXU
        # pass while the panel math (potrf/trsm bodies) stays exact f32
        # — pair with Options(refine>=3) to restore f64 backward error
        self._prec = (jax.lax.Precision.DEFAULT
                      if matmul_precision == "default"
                      else jax.lax.Precision.HIGHEST)
        self.chunks = build_mega_stream(fp, self._group, self.pool_rows)
        # chunk tables live on device and are passed as jit ARGUMENTS:
        # closing over them would embed ~O(tasks*nb) int32 tables as HLO
        # constants — at Poisson 64³ that is >600 MB of constants and the
        # remote compile service rejects the request (HTTP 413)
        self.chunks_dev = [{k: jnp.asarray(v) for k, v in ch.items()}
                           for ch in self.chunks]
        njit = functools.partial(mega_factorize, nb=self.nb,
                                 group=self._group,
                                 interpret=self._interpret,
                                 precision=self._prec, ablate=ablate)

        def run(pool_ext, chunks):
            poolf = pool_ext.reshape(-1, self.nb)
            poolf = njit(poolf, chunks)
            pool = poolf.reshape(pool_ext.shape)
            notpos = jnp.isnan(jnp.sum(pool[:, 0, 0]))
            return pool, notpos

        self._run = run     # raw: callers embedding this in a larger jit
        self._jit = jax.jit(run, donate_argnums=(0,))

    def __call__(self, pool):
        pool = jnp.asarray(pool, dtype=jnp.float32)
        assert pool.shape[0] == self.fp.nblocks + 1, \
            "pool must include the trailing scratch block"
        return self._jit(pool, self.chunks_dev)
