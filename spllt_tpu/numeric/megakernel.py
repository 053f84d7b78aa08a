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

KIND_UPD, KIND_POTRF, KIND_TRSM = 0, 1, 2
KIND_NOOP = -1           # padded steps: no loads, no compute, no writes
_BLKN_BITS = 10          # blkn in aux bits 0-9; first/last flags above


def _i0():
    import jax.numpy as jnp
    return jnp.int32(0)


# ===================================================================== #
# stream construction (host side)
# ===================================================================== #

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

    runs = []        # (kind, wr, wc, dst, aux, relr, relc) per run

    def emit(kind, wr, wc, dst, aux, relr, relc, blkn=None):
        """Split a run into <= kmax segments at group boundaries.  UPD
        first/last flags are computed per segment: a dest group cut at a
        segment boundary RMWs its partial sum at the cut (partial updates
        into one destination commute), and segment starts are drain
        steps, so the previous partial write completes first."""
        k = len(wr)
        seg = max(group, kmax - kmax % group)
        for s0_ in range(0, k, seg):
            s1_ = min(k, s0_ + seg)
            sl = slice(s0_, s1_)
            if kind == KIND_UPD:
                d = dst[sl]
                kseg = s1_ - s0_
                first = np.empty(kseg, bool)
                first[0] = True
                first[1:] = d[1:] != d[:-1]
                last = np.empty(kseg, bool)
                last[-1] = True
                last[:-1] = d[:-1] != d[1:]
                aux_seg = (blkn[sl]
                           | (first.astype(np.int64) << _BLKN_BITS)
                           | (last.astype(np.int64) << (_BLKN_BITS + 1)))
            else:
                aux_seg = aux[sl]
            runs.append((kind, wr[sl], wc[sl], dst[sl], aux_seg,
                         relr[sl], relc[sl]))

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

    # ---- chunk at run boundaries under the SMEM task budget ---------- #
    # chunks share ONE compiled program (uniform shapes), so a greedy
    # fill (full, full, ..., small tail) pads the tail chunk with dead
    # steps up to the longest chunk.  Balance instead: aim every chunk
    # at total/nchunks tasks so uniform padding nearly vanishes.
    total = sum(len(r[1]) for r in runs)
    if total > kmax:
        nchunks = -(-total // kmax)
        kmax = min(kmax, -(-total // (nchunks * group)) * group
                   + 2 * group)
    chunks = []
    cur = None

    def flush():
        nonlocal cur
        if cur is None:
            return
        chunks.append({
            "kind": np.asarray(cur["kind"], np.int32),
            "drain": np.asarray(cur["drain"], np.int32),
            "wr": np.concatenate(cur["wr"]).astype(np.int32),
            "wc": np.concatenate(cur["wc"]).astype(np.int32),
            "dst": np.concatenate(cur["dst"]).astype(np.int32),
            "aux": np.concatenate(cur["aux"]).astype(np.int32),
            "relr": np.concatenate(cur["relr"], axis=0),
            "relc": np.concatenate(cur["relc"], axis=0),
        })
        cur = None

    ntask = 0
    for kind, wr, wc, dst, aux, relr, relc in runs:
        k = len(wr)
        if cur is None or ntask + k > kmax:
            flush()
            cur = {"kind": [], "drain": [], "wr": [], "wc": [],
                   "dst": [], "aux": [], "relr": [], "relc": []}
            ntask = 0
        nsteps = k // group
        cur["kind"].extend([kind] * nsteps)
        cur["drain"].extend([1] + [0] * (nsteps - 1))
        cur["wr"].append(wr)
        cur["wc"].append(wc)
        cur["dst"].append(dst)
        cur["aux"].append(aux)
        cur["relr"].append(relr.astype(np.int32))
        cur["relc"].append(relc.astype(np.int32))
        ntask += k
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
        for nm in ("wr", "wc", "dst"):
            c[nm] = np.concatenate(
                [c[nm], np.full(k, scratch, np.int32)])
        # blkn=0 | first | last per padded task (own dest group each)
        aux_pad = np.full(k, (1 << _BLKN_BITS) | (1 << (_BLKN_BITS + 1)),
                          np.int32)
        c["aux"] = np.concatenate([c["aux"], aux_pad])
        for nm in ("relr", "relc"):
            c[nm] = np.concatenate(
                [c[nm], np.full((k, nb), -1, np.int32)], axis=0)
    return chunks


# ===================================================================== #
# kernel
# ===================================================================== #

def _kernel(kind_ref, drain_ref, wr_ref, wc_ref, dst_ref, aux_ref,
            relr, relc, poolf_hbm, out_hbm,
            acc, winr, winc, dtile, pscr, gstate,
            semr, semc, semd_r, semd_w, semw,
            *, nb, group, nsteps, pb, precision,
            ablate=frozenset()):
    """One grid step = ``group`` micro-tasks of one kind.

    Window prefetch is kind-independent (wr/wc row bases); ``drain``
    steps wait the deferred UPD destination writes before loading their
    own windows (run boundaries are the only cross-kind hazards — see
    module docstring).  ``gstate`` (SMEM): [0] = UPD dest-group counter,
    [1]/[2] = pending-write destination row of each dtile slot (-1 =
    none).
    """
    t = pl.program_id(0)
    slot = jax.lax.rem(jnp.int32(t), jnp.int32(2))
    nxt = jax.lax.rem(jnp.int32(t) + jnp.int32(1), jnp.int32(2))
    f32 = winr.dtype

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

    def wait_write(p):
        p = jnp.int32(p)   # x64-safe: callers pass python ints 0/1
        pltpu.make_async_copy(
            dtile.at[p], out_hbm.at[pl.ds(gstate[1 + p], nb)],
            semd_w.at[p]).wait()
        gstate[1 + p] = jnp.int32(-1)

    @pl.when(t == 0)
    def _():
        gstate[0] = jnp.int32(0)
        gstate[1] = jnp.int32(-1)
        gstate[2] = jnp.int32(-1)

    # run boundary: finish deferred writes, then load this step's windows
    @pl.when(drain_ref[t] > 0)
    def _():
        for p_ in (0, 1):
            @pl.when(gstate[1 + p_] >= 0)
            def _(p_=p_):
                wait_write(p_)
        start_wins(slot, t)

    # steady state: prefetch the next step's windows (skipped across run
    # boundaries — the next run may read tiles this run still writes)
    nxt_drain = drain_ref[jnp.minimum(t + 1, nsteps - 1)]
    @pl.when(jnp.logical_and(t + 1 < nsteps, nxt_drain == 0))
    def _():
        start_wins(nxt, t + 1)

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
        sh_f = jnp.int32(_BLKN_BITS)
        sh_l = jnp.int32(_BLKN_BITS + 1)
        one_c = jnp.int32(1)
        bkv = scalars_to_vec(
            [jnp.bitwise_and(aux_ref[t * group + i], mask_c)
             for i in range(group)], group)
        rr3 = relr[...][:, :, None]              # [G, nb, 1]
        rc3 = relc[...][:, :, None]
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

        for i in range(group):
            gi = t * group + i
            first = jnp.bitwise_and(
                jax.lax.shift_right_logical(aux_ref[gi], sh_f),
                one_c) > 0
            last = jnp.bitwise_and(
                jax.lax.shift_right_logical(aux_ref[gi], sh_l),
                one_c) > 0

            @pl.when(first)
            def _():
                p = jax.lax.rem(gstate[0], jnp.int32(2))
                gstate[0] = gstate[0] + jnp.int32(1)

                @pl.when(gstate[1 + p] >= 0)
                def _():
                    wait_write(p)
                pltpu.make_async_copy(
                    out_hbm.at[pl.ds(dst_ref[gi], nb)], dtile.at[p],
                    semd_r.at[p]).start()

            @pl.when(first)
            def _():
                acc[:, :] = u3[i]

            @pl.when(jnp.logical_not(first))
            def _():
                acc[:, :] += u3[i]

            @pl.when(last)
            def _():
                p = jax.lax.rem(gstate[0] - jnp.int32(1), jnp.int32(2))
                pltpu.make_async_copy(
                    out_hbm.at[pl.ds(dst_ref[gi], nb)], dtile.at[p],
                    semd_r.at[p]).wait()
                dtile[p] -= acc[:, :]
                pltpu.make_async_copy(
                    dtile.at[p], out_hbm.at[pl.ds(dst_ref[gi], nb)],
                    semd_w.at[p]).start()
                gstate[1 + p] = dst_ref[gi]

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
    # gstate at its t == 0)
    @pl.when(t == nsteps - 1)
    def _():
        for p_ in (0, 1):
            @pl.when(gstate[1 + p_] >= 0)
            def _(p_=p_):
                wait_write(p_)


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
            num_scalar_prefetch=6,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((group, nb), lambda t, *_: (t, _i0())),
                pl.BlockSpec((group, nb), lambda t, *_: (t, _i0())),
                pl.BlockSpec(memory_space=pltpu.ANY),    # poolf (HBM)
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((nb, nb), jnp.float32),            # acc
                pltpu.VMEM((2, group, nb, nb), jnp.float32),  # winr
                pltpu.VMEM((2, group, nb, nb), jnp.float32),  # winc
                pltpu.VMEM((2, nb, nb), jnp.float32),         # dtile
                pltpu.VMEM((group, nb, nb), jnp.float32),     # pscr
                pltpu.SMEM((3,), jnp.int32),                  # gstate
                pltpu.SemaphoreType.DMA((2, group)),          # semr
                pltpu.SemaphoreType.DMA((2, group)),          # semc
                pltpu.SemaphoreType.DMA((2,)),                # dtile reads
                pltpu.SemaphoreType.DMA((2,)),                # dtile writes
                pltpu.SemaphoreType.DMA((group,)),            # writebacks
            ],
        )
        fn = pl.pallas_call(
            functools.partial(_kernel, nb=nb, group=group, nsteps=nsteps,
                              pb=pb, precision=precision, ablate=ablate),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(poolf.shape, poolf.dtype),
            input_output_aliases={8: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )
        poolf = fn(ch["kind"], ch["drain"], ch["wr"], ch["wc"],
                   ch["dst"], ch["aux"], ch["relr"], ch["relc"], poolf)
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
