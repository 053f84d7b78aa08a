"""Whole-solve pallas megakernel (fwd + bwd triangular solve).

Executes the panel-space micro-task stream of
:mod:`spllt_tpu.plan.solve_mega` as ONE pallas kernel per direction
(chunked only by the SMEM table budget): a sequential grid where every
step runs ``group`` micro-tasks of one kind on nb-row windows of a flat
work array [P + X, nr] (partial-sum panels + node-padded rhs), with
double-buffered window DMAs and host-computed ``drain`` flags at run
boundaries — the same skeleton as the factorization megakernel
(numeric/megakernel.py).

This replaces the reference's entire runtime solve machinery — the
dependency-driven OMP task managers with k-ary dep combining and the
partial-sum panel reductions (/root/reference/src/spllt_solve_dep_mod.F90,
task_manager_omp.F90:444-1165) — with a statically scheduled device
program: zero per-level dispatches, window traffic at HBM bandwidth.

Kind bodies:
  ADDG      one-hot MXU gather-add (INIT / FRED / BINIT / BRED)
  MM / MMT  blk @ win / blkᵀ @ win update-add (FUPD / BUPD)
  SOL/SOLT  in-window [[L,0],[B,I]] substitution (pallas_solve body),
            result written back to BOTH the panel and its xp slot
Destination read-modify-writes are deferred and double-buffered exactly
as in the factor kernel; drains at run boundaries are the only
synchronization.  All work-array reads go through the ALIASED OUTPUT
ref (interpret mode gives the input ref a stale copy).

Layout note (Mosaic DMA alignment): window DMAs must slice the work
array along a 128-aligned lane dimension, so the work array is stored
TRANSPOSED — ``work[nr, P + X]`` with windows ``work[:, base:base+nb]``
([nr, nb] in VMEM, lane dim = nb).  All kind bodies operate in this
row-vector form (u = y·Lᵀ etc.); only the substitution body flips a
window to [nb, nr] in registers (VMEM-value transpose) and back.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..plan.solve_mega import (KIND_ADDG, KIND_MM, KIND_MMT, KIND_NOOP,
                               KIND_SOL, KIND_SOLT, build_solve_mega_plan)
from .megakernel import rel_dtype
from .pallas_potrf import scalars_to_vec
from .pallas_solve import solve_tiles_body

__all__ = ["MegaSolveExecutor", "chunk_solve_runs", "mega_solve_chunks"]


def onehot_gather_right(win, pon_bool):
    """win @ onehot as THREE exact bf16 MXU passes (the right-operand
    mirror of pallas_update.onehot_gather; same f32-into-3×bf16 split)."""
    f32 = win.dtype
    p = pon_bool.astype(jnp.bfloat16)
    w0 = win.astype(jnp.bfloat16)
    r1 = win - w0.astype(f32)
    w1 = r1.astype(jnp.bfloat16)
    w2 = (r1 - w1.astype(f32)).astype(jnp.bfloat16)
    dn = (((2,), (1,)), ((0,), (0,)))
    out = jax.lax.dot_general(w0, p, dn, preferred_element_type=f32)
    out += jax.lax.dot_general(w1, p, dn, preferred_element_type=f32)
    out += jax.lax.dot_general(w2, p, dn, preferred_element_type=f32)
    return out


def _i0():
    import jax.numpy as jnp
    return jnp.int32(0)


def _on_cpu() -> bool:
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", "") == "cpu"
    return jax.default_backend() == "cpu"


# ===================================================================== #
# host-side: pad runs to the group size, chunk at the table budget
# ===================================================================== #

def chunk_solve_runs(runs, group: int, nb: int, work_scratch: int,
                     pool_scratch: int, kmax: int = 16384):
    """[{kind, drain, wA, wS, dst, aux, rel}] chunks from unpadded runs.

    ADD-kind runs get per-dest-group first/last flags (aux bits 0/1);
    a dest group cut at a chunk boundary RMWs its partial sum (adds
    commute) and chunk/run starts are drain steps.  Padded slots point
    at the pool/work scratch windows — the pool scratch tile is zero
    (padded factor tasks write masked zeros) and the work scratch
    window only ever receives zeros, so padded tasks are exact no-ops.
    """
    # balance chunk sizes so the shared-shape padding nearly vanishes:
    # cut the stream at exact group boundaries every tgt steps (runs
    # straddling a cut are split there — the cut closes open dest
    # groups, whose partial RMWs commute)
    total = sum(-(-len(r["wS"]) // group) * group for r in runs)
    nchunks = max(1, -(-total // kmax))
    tgt = -(-(total // group) // nchunks)
    chunks = []
    cur = None
    room = 0

    def flush():
        nonlocal cur
        if cur is None or not cur["kind"]:
            cur = None
            return
        chunks.append({
            "kind": np.asarray(cur["kind"], np.int32),
            "drain": np.asarray(cur["drain"], np.int32),
            "wA": np.concatenate(cur["wA"]).astype(np.int32),
            "wS": np.concatenate(cur["wS"]).astype(np.int32),
            "dst": np.concatenate(cur["dst"]).astype(np.int32),
            "aux": np.concatenate(cur["aux"]).astype(np.int32),
            "rel": np.concatenate(cur["rel"], axis=0).astype(
                rel_dtype(nb)),
        })
        cur = None

    for run in runs:
        kind = run["kind"]
        k = len(run["wS"])
        kp = -(-k // group) * group
        wA = np.concatenate([run["wA"], np.full(kp - k, pool_scratch)])
        wS = np.concatenate([run["wS"], np.full(kp - k, work_scratch)])
        dst = np.concatenate([run["dst"], np.full(kp - k, work_scratch)])
        aux = np.concatenate([run["aux"], np.zeros(kp - k, np.int64)])
        rel = np.concatenate(
            [run["rel"], np.full((kp - k, nb), -1, np.int32)], axis=0)
        s0 = 0
        while s0 < kp:
            if cur is None:
                cur = {"kind": [], "drain": [], "wA": [], "wS": [],
                       "dst": [], "aux": [], "rel": []}
                room = tgt
            s1 = min(kp, s0 + room * group)
            sl = slice(s0, s1)
            if kind in (KIND_ADDG, KIND_MM, KIND_MMT):
                d = dst[sl]
                m = s1 - s0
                first = np.empty(m, bool)
                first[0] = True
                first[1:] = d[1:] != d[:-1]
                last = np.empty(m, bool)
                last[-1] = True
                last[:-1] = d[:-1] != d[1:]
                aux_seg = (first.astype(np.int64)
                           | (last.astype(np.int64) << 1))
            else:
                aux_seg = aux[sl]
            nsteps = (s1 - s0) // group
            cur["kind"].extend([kind] * nsteps)
            cur["drain"].extend([1] + [0] * (nsteps - 1))
            cur["wA"].append(wA[sl])
            cur["wS"].append(wS[sl])
            cur["dst"].append(dst[sl])
            cur["aux"].append(aux_seg)
            cur["rel"].append(rel[sl])
            room -= nsteps
            if room <= 0:
                flush()
            s0 = s1
    flush()
    # pad chunks to one static shape -> ONE pallas program for all
    # chunks of a direction (same trick as megakernel.pad_chunks_uniform;
    # NOOP steps cost only the grid-step floor)
    if len(chunks) > 1:
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
            c["wA"] = np.concatenate(
                [c["wA"], np.full(k, pool_scratch, np.int32)])
            for nm in ("wS", "dst"):
                c[nm] = np.concatenate(
                    [c[nm], np.full(k, work_scratch, np.int32)])
            c["aux"] = np.concatenate(
                [c["aux"], np.full(k, 3, np.int32)])   # first|last
            c["rel"] = np.concatenate(
                [c["rel"], np.full((k, nb), -1, c["rel"].dtype)],
                axis=0)
    return chunks


# ===================================================================== #
# kernel
# ===================================================================== #

def _kernel(kind_ref, drain_ref, wa_ref, ws_ref, dst_ref, aux_ref,
            rel, poolf_hbm, work_hbm, out_hbm,
            acc, wina, winb, dtile, yscr, gstate,
            sema, semb, semd_r, semd_w, semw,
            *, nb, nr, group, nsteps, precision, pb):
    """One grid step = ``group`` micro-tasks of one kind.

    ``gstate`` (SMEM): [0] = dest-group counter, [1]/[2] = pending-write
    destination row of each dtile slot (-1 = none).  Pool windows
    (wina) are loaded only for kinds that use them (MM/MMT/SOL/SOLT) —
    the start and the wait share the same kind predicate.
    """
    t = pl.program_id(0)
    slot = jax.lax.rem(jnp.int32(t), jnp.int32(2))
    nxt = jax.lax.rem(jnp.int32(t) + jnp.int32(1), jnp.int32(2))

    def start_wins(s, step):
        @pl.when(kind_ref[step] != jnp.int32(KIND_NOOP))
        def _():
            for i_ in range(group):
                i = jnp.int32(i_)   # python ints trace i64 under x64
                pltpu.make_async_copy(
                    out_hbm.at[:, pl.ds(ws_ref[step * group + i_] * jnp.int32(nb), nb)],
                    winb.at[s, i], semb.at[s, i]).start()

        @pl.when(kind_ref[step] >= jnp.int32(KIND_MM))
        def _():
            for i_ in range(group):
                i = jnp.int32(i_)
                pltpu.make_async_copy(
                    poolf_hbm.at[pl.ds(wa_ref[step * group + i_], nb)],
                    wina.at[s, i], sema.at[s, i]).start()

    def wait_write(p):
        p = jnp.int32(p)   # x64-safe: callers pass python ints 0/1
        pltpu.make_async_copy(
            dtile.at[p], out_hbm.at[:, pl.ds(gstate[1 + p] * jnp.int32(nb), nb)],
            semd_w.at[p]).wait()
        gstate[1 + p] = jnp.int32(-1)

    @pl.when(t == 0)
    def _():
        gstate[0] = jnp.int32(0)
        gstate[1] = jnp.int32(-1)
        gstate[2] = jnp.int32(-1)

    @pl.when(drain_ref[t] > 0)
    def _():
        for p_ in (0, 1):
            @pl.when(gstate[1 + p_] >= 0)
            def _(p_=p_):
                wait_write(p_)
        start_wins(slot, t)

    nxt_drain = drain_ref[jnp.minimum(t + 1, nsteps - 1)]

    @pl.when(jnp.logical_and(t + 1 < nsteps, nxt_drain == 0))
    def _():
        start_wins(nxt, t + 1)

    kind = kind_ref[t]

    @pl.when(kind != jnp.int32(KIND_NOOP))
    def _():
        for i_ in range(group):
            i = jnp.int32(i_)
            pltpu.make_async_copy(
                out_hbm.at[:, pl.ds(ws_ref[t * group + i_] * jnp.int32(nb), nb)],
                winb.at[slot, i], semb.at[slot, i]).wait()

    @pl.when(kind >= jnp.int32(KIND_MM))
    def _():
        for i_ in range(group):
            i = jnp.int32(i_)
            pltpu.make_async_copy(
                poolf_hbm.at[pl.ds(wa_ref[t * group + i_], nb)],
                wina.at[slot, i], sema.at[slot, i]).wait()

    # ------------------------- ADD kinds ------------------------------ #
    def rmw(u3, sign):
        for i in range(group):
            gi_ = t * group + i
            first = jnp.bitwise_and(aux_ref[gi_], jnp.int32(1)) > 0
            last = jnp.bitwise_and(aux_ref[gi_], jnp.int32(2)) > 0

            @pl.when(first)
            def _():
                p = jax.lax.rem(gstate[0], jnp.int32(2))
                gstate[0] = gstate[0] + jnp.int32(1)

                @pl.when(gstate[1 + p] >= 0)
                def _():
                    wait_write(p)
                pltpu.make_async_copy(
                    out_hbm.at[:, pl.ds(dst_ref[gi_] * jnp.int32(nb), nb)], dtile.at[p],
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
                    out_hbm.at[:, pl.ds(dst_ref[gi_] * jnp.int32(nb), nb)], dtile.at[p],
                    semd_r.at[p]).wait()
                if sign > 0:
                    dtile[p] += acc[:, :]
                else:
                    dtile[p] -= acc[:, :]
                pltpu.make_async_copy(
                    dtile.at[p], out_hbm.at[:, pl.ds(dst_ref[gi_] * jnp.int32(nb), nb)],
                    semd_w.at[p]).start()
                gstate[1 + p] = dst_ref[gi_]

    @pl.when(kind == jnp.int32(KIND_ADDG))
    def _():
        # u[g, :, i] = src[g, :, rel[i]]: right-onehot with
        # pon[g, j, i] = (rel[i] == j)
        iot3 = jax.lax.broadcasted_iota(jnp.int32, (group, nb, nb), 1)
        r3 = rel[...].astype(jnp.int32)[:, None, :]      # [G, 1, nb]
        pon = (iot3 == r3) & (r3 >= 0)
        u3 = onehot_gather_right(winb[slot], pon)
        rmw(u3, +1)

    @pl.when(kind == jnp.int32(KIND_MM))
    def _():
        # fwd update row form: u = y · blkᵀ   ([G, nr, k] x [G, i, k])
        u3 = jax.lax.dot_general(winb[slot], wina[slot],
                                 (((2,), (2,)), ((0,), (0,))),
                                 precision=precision,
                                 preferred_element_type=jnp.float32)
        rmw(u3, -1)

    @pl.when(kind == jnp.int32(KIND_MMT))
    def _():
        # bwd update row form: u = z · blk    ([G, nr, i] x [G, i, k])
        u3 = jax.lax.dot_general(winb[slot], wina[slot],
                                 (((2,), (1,)), ((0,), (0,))),
                                 precision=precision,
                                 preferred_element_type=jnp.float32)
        rmw(u3, -1)

    # ------------------------- SOL kinds ------------------------------ #
    def sol(transpose):
        vals = [jnp.bitwise_and(aux_ref[t * group + i], jnp.int32(4095))
                for i in range(group)]
        kv = scalars_to_vec(vals, group)
        kvmax = vals[0]
        for v in vals[1:]:
            kvmax = jnp.maximum(kvmax, v)
        z = jnp.swapaxes(winb[slot], 1, 2)       # [G, nb, nr]
        y = solve_tiles_body(yscr, wina[slot], z, kv, nb=nb,
                             nrhs=nr, transpose=transpose, group=group,
                             pb=pb, kvmax=kvmax)
        winb[slot] = jnp.swapaxes(y, 1, 2)       # [G, nr, nb]
        i32_0, i32_1 = jnp.int32(0), jnp.int32(1)
        for i_ in range(group):
            gi_ = t * group + i_
            i = jnp.int32(i_)
            pltpu.make_async_copy(
                winb.at[slot, i], out_hbm.at[:, pl.ds(ws_ref[gi_] * jnp.int32(nb), nb)],
                semw.at[i, i32_0]).start()
            pltpu.make_async_copy(
                winb.at[slot, i], out_hbm.at[:, pl.ds(dst_ref[gi_] * jnp.int32(nb), nb)],
                semw.at[i, i32_1]).start()
        for i_ in range(group):
            gi_ = t * group + i_
            i = jnp.int32(i_)
            pltpu.make_async_copy(
                winb.at[slot, i], out_hbm.at[:, pl.ds(ws_ref[gi_] * jnp.int32(nb), nb)],
                semw.at[i, i32_0]).wait()
            pltpu.make_async_copy(
                winb.at[slot, i], out_hbm.at[:, pl.ds(dst_ref[gi_] * jnp.int32(nb), nb)],
                semw.at[i, i32_1]).wait()

    @pl.when(kind == jnp.int32(KIND_SOL))
    def _():
        sol(False)

    @pl.when(kind == jnp.int32(KIND_SOLT))
    def _():
        sol(True)

    # chunk end: drain deferred RMW writes
    @pl.when(t == nsteps - 1)
    def _():
        for p_ in (0, 1):
            @pl.when(gstate[1 + p_] >= 0)
            def _(p_=p_):
                wait_write(p_)


def mega_solve_chunks(poolf, work, chunks, nb: int, nr: int, group: int,
                      interpret: bool = False,
                      precision=jax.lax.Precision.HIGHEST, pb: int = 8):
    """Run chunked solve streams over work [nr, P+X] (poolf read-only)."""
    for ch in chunks:
        nsteps = len(ch["kind"])
        if nsteps == 0:
            continue
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((group, nb), lambda t, *_: (t, _i0())),
                pl.BlockSpec(memory_space=pl.ANY),    # poolf (HBM)
                pl.BlockSpec(memory_space=pl.ANY),    # work (HBM)
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((nr, nb), jnp.float32),            # acc
                pltpu.VMEM((2, group, nb, nb), jnp.float32),  # wina
                pltpu.VMEM((2, group, nr, nb), jnp.float32),  # winb
                pltpu.VMEM((2, nr, nb), jnp.float32),         # dtile
                pltpu.VMEM((group, nb, nr), jnp.float32),     # yscr
                pltpu.SMEM((3,), jnp.int32),                  # gstate
                pltpu.SemaphoreType.DMA((2, group)),          # sema
                pltpu.SemaphoreType.DMA((2, group)),          # semb
                pltpu.SemaphoreType.DMA((2,)),                # dtile reads
                pltpu.SemaphoreType.DMA((2,)),                # dtile writes
                pltpu.SemaphoreType.DMA((group, 2)),          # writebacks
            ],
        )
        fn = pl.pallas_call(
            functools.partial(_kernel, nb=nb, nr=nr, group=group,
                              nsteps=nsteps, precision=precision, pb=pb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(work.shape, work.dtype),
            input_output_aliases={8: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )
        work = fn(ch["kind"], ch["drain"], ch["wA"], ch["wS"],
                  ch["dst"], ch["aux"], ch["rel"], poolf, work)
    return work


# ===================================================================== #
# executor
# ===================================================================== #

class MegaSolveExecutor:
    """Single-kernel fwd/bwd solve (f32); ScanSolveExecutor-compatible.

    ``fwd``/``bwd``/``full`` take (pool_ext, x[n+1, nrhs]) in permuted
    row space (row n = dump) and return the same shape;
    ``full_refined`` matches the scan executor's refined-device entry.
    """

    def __init__(self, symb, plan, nrhs: int, dtype=jnp.float32,
                 matmul_precision="highest", group: int | None = None,
                 interpret: bool | None = None, smp=None):
        if np.dtype(dtype) != np.float32:
            raise ValueError("solve megakernel is float32-only")
        self._interpret = _on_cpu() if interpret is None else interpret
        if not self._interpret and plan.nb % 128 != 0:
            raise ValueError("solve megakernel needs nb % 128 == 0 on TPU")
        self.smp = smp or build_solve_mega_plan(symb, plan)
        self.nb = plan.nb
        self.n = symb.n
        self.nrhs = nrhs
        self.dtype = jnp.float32
        nr = max(8, -(-nrhs // 8) * 8)
        self.nr = nr
        nb_ = plan.nb
        if group is None:
            # measured on TPU v5e (nb=128 nemin=192, fwd+bwd):
            #   32³ nr=1:  G=16 17.6 ms, G=8 18.2, G=32 70.8 (VMEM)
            #   32³ nr=64: G=8 60.3 ms,  G=16 96.2, G=32 142
            #   64³ nr=1:  G=8 216 ms,   G=16 540  (2.5× WORSE)
            # G=16's 3% edge at 32³/nr≤8 inverts catastrophically at
            # scale, so G=8 is the default everywhere; Pallas needs the
            # (group, nb) rel block's sublane dim divisible by 8, so 8
            # is also the floor.
            group = 2 if self._interpret else 8
        if (not self._interpret
                and 4 * group * nb_ * (2 * nb_ + 3 * nr) > 24 << 20):
            # even the floor group cannot fit VMEM (huge nb × wide rhs):
            # signal ineligibility so api._scan_executor falls back to
            # the scan solve path
            raise ValueError(
                f"solve megakernel VMEM budget exceeded at nb={nb_} "
                f"nrhs={nrhs} group={group}")
        self._group = group
        self._prec = (jax.lax.Precision.HIGHEST
                      if matmul_precision in ("highest", "high")
                      else jax.lax.Precision.DEFAULT)
        smp = self.smp
        P, X, nb = smp.P, smp.X, self.nb
        work_scratch = smp.P - nb      # trailing panel window = scratch
        pool_scratch = smp.P - nb      # pool flat scratch row base
        self._fwd_chunks = self._dev(chunk_solve_runs(
            smp.fwd_runs, group, nb, work_scratch, pool_scratch))
        self._bwd_chunks = self._dev(chunk_solve_runs(
            smp.bwd_runs, group, nb, work_scratch, pool_scratch))
        self._xp_src = jnp.asarray(smp.xp_src, jnp.int32)
        self._col_to_xp = jnp.asarray(smp.col_to_xp, jnp.int32)
        run = functools.partial(mega_solve_chunks, nb=nb, nr=nr,
                                group=group, interpret=self._interpret,
                                precision=self._prec)

        def to_xp(z):                       # [n+1, nrhs] -> [nr, X]
            zp = jnp.pad(z.astype(jnp.float32),
                         ((0, 0), (0, nr - z.shape[1])))
            return zp.T[:, self._xp_src]

        def from_xp(xp, nrhs_):             # [nr, X] -> [n+1, nrhs]
            out = xp[:nrhs_, self._col_to_xp].T
            return jnp.concatenate(
                [out, jnp.zeros((1, nrhs_), out.dtype)])

        # chunk tables are jit ARGUMENTS everywhere below: closing over
        # them would embed the whole micro-task stream as HLO constants
        # (>hundreds of MB at 64³ → remote-compile HTTP 413)
        def one_dir(poolf, xp, chunks):
            work = jnp.concatenate(
                [jnp.zeros((nr, P), jnp.float32), xp], axis=1)
            work = run(poolf, work, chunks)
            return work[:, P:]

        def fwd_fn(pool_ext, z, fwd_chunks):
            poolf = pool_ext.reshape(-1, nb).astype(jnp.float32)
            xp = one_dir(poolf, to_xp(z), fwd_chunks)
            return from_xp(xp, z.shape[1])

        def bwd_fn(pool_ext, z, bwd_chunks):
            poolf = pool_ext.reshape(-1, nb).astype(jnp.float32)
            xp = one_dir(poolf, to_xp(z), bwd_chunks)
            return from_xp(xp, z.shape[1])

        def full_fn(pool_ext, z, fwd_chunks, bwd_chunks):
            poolf = pool_ext.reshape(-1, nb).astype(jnp.float32)
            xp = one_dir(poolf, to_xp(z), fwd_chunks)
            xp = one_dir(poolf, xp, bwd_chunks)
            return from_xp(xp, z.shape[1])

        self._fwd_raw, self._bwd_raw, self._full_raw = \
            fwd_fn, bwd_fn, full_fn
        self._fwd_fn = jax.jit(fwd_fn, donate_argnums=(1,))
        self._bwd_fn = jax.jit(bwd_fn, donate_argnums=(1,))
        self._full_fn = jax.jit(full_fn, donate_argnums=(1,))
        self._refined_fns = {}

    def _dev(self, chunks):
        # wS/dst carry WINDOW INDICES (row base / nb): the kernel
        # multiplies back so Mosaic can prove the lane-dim slice bases
        # are 128-divisible (raw table values cannot be proven aligned)
        nb = self.nb
        out = []
        for ch in chunks:
            d = {}
            for k, v in ch.items():
                if k in ("wS", "dst"):
                    assert np.all(v % nb == 0)
                    v = v // nb
                # force int32: under jax_enable_x64 (refined solve)
                # asarray would keep int64 tables and Mosaic rejects
                # i64 memref slice indices ('tpu.memref_slice' operand
                # must be i32), seen at Poisson 64³ + refine
                d[k] = jnp.asarray(np.asarray(v).astype(np.int32))
            out.append(d)
        return out

    # ------------------------------------------------------------------ #
    def fwd(self, pool, x):
        return self._fwd_fn(jnp.asarray(pool, jnp.float32),
                            jnp.asarray(x, jnp.float32),
                            self._fwd_chunks)

    def bwd(self, pool, x):
        return self._bwd_fn(jnp.asarray(pool, jnp.float32),
                            jnp.asarray(x, jnp.float32),
                            self._bwd_chunks)

    def full(self, pool, x):
        return self._full_fn(jnp.asarray(pool, jnp.float32),
                             jnp.asarray(x, jnp.float32),
                             self._fwd_chunks, self._bwd_chunks)

    # ------------------------------------------------------------------ #
    def _build_refined(self, refine: int):
        """Whole refined solve as ONE device program (mirrors
        solve_scan._build_refined: f32 fwd+bwd + f64 ELL-SpMV residual)."""
        from .spmv import spmv

        full = self._full_raw
        n = self.n

        def run(pool_ext, b64, vals64, idx, fwd_chunks, bwd_chunks):
            def body(_, x64):
                r = b64[:n] - spmv(vals64, idx, x64)
                rp = jnp.concatenate(
                    [r, jnp.zeros((1, r.shape[1]), r.dtype)])
                return x64 + full(pool_ext,
                                  rp.astype(jnp.float32),
                                  fwd_chunks, bwd_chunks).astype(
                                      jnp.float64)

            return jax.lax.fori_loop(
                0, refine + 1, body,
                jnp.zeros(b64.shape, jnp.float64))

        return jax.jit(run)

    def full_refined(self, pool, b64, vals64, idx, refine: int):
        f = self._refined_fns.get(refine)
        if f is None:
            f = self._build_refined(refine)
            self._refined_fns[refine] = f
        return f(jnp.asarray(pool, jnp.float32), jnp.asarray(b64),
                 vals64, idx, self._fwd_chunks, self._bwd_chunks)
