"""Pallas fused update kernel.

Applies a batch of update micro-tasks — gather source rows, GEMM, and
accumulate into the destination tile — inside ONE kernel, replacing the
XLA gather → dot_general → scatter-add chain whose row-granular HBM
gathers and element-serialized scatters dominated the factorization.

Design (per grid step = ``group`` micro-tasks, sorted by destination):
  * the source rows feeding ONE destination tile are a contiguous
    position range of the source node's column panel (plan/factor_tasks
    builds position maps from an arange), so the row-role and col-role
    gathers each read from their own [nb, nb] window of the flat pool —
    two small DMAs per task, double-buffered across grid steps
  * position maps arrive pre-gathered RELATIVE to the window start as a
    [K, nb] int32 input (-1 = invalid slot), BlockSpec-pipelined in
    [group, nb] blocks — no map indirection inside the kernel
  * row gathers become one-hot matmuls on the MXU
    (R = onehot(relr) @ Wr), the classic TPU gather trick; with nb-row
    windows the one-hot contraction is nb³ per task instead of nb²·hmax
  * ``group`` tasks execute per grid step to amortize the per-step
    sequencing floor; destination-group boundaries are handled per
    sub-task (first → kick destination read, last → RMW writeback), and
    consecutive micro-tasks with the same destination accumulate in a
    VMEM scratch tile across sub-tasks and grid steps

Reference analogue: ``spllt_update_between`` + ``spllt_expand_buffer``
(/root/reference/src/spllt_kernels_mod.F90:2108-2237, 2010-2053).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_micro_tasks", "pallas_apply_updates"]


def _i0():
    """int32 zero for BlockSpec index maps: under jax x64 mode a literal
    ``0`` traces as int64 and Mosaic fails to legalize the index-map
    function — the refined-solve program (solve_scan._build_refined)
    runs with x64 enabled for its f64 residual."""
    import jax.numpy as jnp
    return jnp.int32(0)


def build_micro_tasks(fp, lvl_lo: int, lvl_hi: int, nb: int,
                      pool_rows: int):
    """Expand the (width-fused) updbt tasks of levels [lvl_lo, lvl_hi]
    back into per-block-column micro-tasks sorted by destination.  Each
    task carries two window bases into the flat pool [pool_rows, nb]
    (``lor`` for the row-role gather, ``loc`` for the col-role gather,
    clamped so the static nb-row window DMA stays in bounds) and two
    window-relative position-map rows ``relr``/``relc`` [nb] int32
    (-1 = invalid slot).

    Returns dict: dst, lor, loc, blkn (int32 [K]) and relr, relc
    (int32 [K, nb]).  Every task fits the nb-row windows (per-tile
    position ranges are contiguous), so there is no XLA spill path.
    """
    lo_cap = pool_rows - nb
    t0, t1 = int(fp.updbt_ptr[lvl_lo]), int(fp.updbt_ptr[lvl_hi + 1])
    empty = {
        "dst": np.empty(0, np.int32), "lor": np.empty(0, np.int32),
        "loc": np.empty(0, np.int32), "blkn": np.empty(0, np.int32),
        "relr": np.empty((0, nb), np.int32),
        "relc": np.empty((0, nb), np.int32),
    }
    if t1 <= t0:
        return empty
    # fully vectorized expansion (the per-task python loop dominated the
    # 64³ mega stream build at 16.9 s host time)
    tt = np.arange(t0, t1, dtype=np.int64)
    pr = fp.maps[fp.updbt_mr[tt]].astype(np.int64)     # [T, nb]
    pc = fp.maps[fp.updbt_mc[tt]].astype(np.int64)
    vr, vc = pr >= 0, pc >= 0
    keep = vr.any(axis=1) & vc.any(axis=1)
    tt = tt[keep]
    if len(tt) == 0:
        return empty
    pr, pc, vr, vc = pr[keep], pc[keep], vr[keep], vc[keep]
    big = np.int64(1) << 60
    pminr = np.where(vr, pr, big).min(axis=1)
    pminc = np.where(vc, pc, big).min(axis=1)
    if __debug__:
        assert int((np.where(vr, pr, -1).max(axis=1) - pminr).max()) \
            < nb, "row posns not tile-local"
        assert int((np.where(vc, pc, -1).max(axis=1) - pminc).max()) \
            < nb, "col posns not tile-local"
    cc = fp.updbt_c[tt].astype(np.int64)
    # expand each task over its kb source-column tiles
    idx = np.repeat(np.arange(len(tt), dtype=np.int64), cc)
    csum = np.concatenate([[0], np.cumsum(cc)])
    kb = np.arange(len(idx), dtype=np.int64) - csum[idx]
    base = fp.srcvec[fp.updbt_svp[tt][idx] + kb] * nb
    l0r = np.minimum(base + pminr[idx], lo_cap)
    l0c = np.minimum(base + pminc[idx], lo_cap)
    dst = fp.updbt_dst[tt][idx]
    # window-relative positions (absorb the clamp shift)
    relr = np.where(vr[idx], pr[idx] + (base - l0r)[:, None],
                    -1).astype(np.int32)
    relc = np.where(vc[idx], pc[idx] + (base - l0c)[:, None],
                    -1).astype(np.int32)
    bn = fp.blk_n[dst]
    order = np.argsort(dst, kind="stable")
    return {
        "dst": dst[order].astype(np.int32),
        "lor": l0r[order].astype(np.int32),
        "loc": l0c[order].astype(np.int32),
        "blkn": bn[order].astype(np.int32),
        "relr": relr[order],
        "relc": relc[order],
    }


def onehot_gather(pon_bool, win, group):
    """rows = onehot @ win as THREE exact bf16 MXU passes.

    A gather is data movement, so full f32 fidelity is required — but
    the one-hot operand is bf16-exact and an f32 value splits exactly
    into three bf16 terms (24 = 3x8 mantissa bits; the residuals are
    Sterbenz-exact).  Three DEFAULT-precision bf16 passes therefore
    reproduce the HIGHEST-precision f32 result at half the MXU work
    (HIGHEST splits BOTH operands: 6 passes)."""
    f32 = win.dtype
    p = pon_bool.astype(jnp.bfloat16)
    w0 = win.astype(jnp.bfloat16)
    r1 = win - w0.astype(f32)
    w1 = r1.astype(jnp.bfloat16)
    w2 = (r1 - w1.astype(f32)).astype(jnp.bfloat16)
    dn = (((2,), (1,)), ((0,), (0,)))
    out = jax.lax.dot_general(p, w0, dn, preferred_element_type=f32)
    out += jax.lax.dot_general(p, w1, dn, preferred_element_type=f32)
    out += jax.lax.dot_general(p, w2, dn, preferred_element_type=f32)
    return out


def _kernel(dst_ref, lor_ref, loc_ref, blkn_ref, relr, relc,
            poolf_hbm, out_hbm, acc, winr, winc, dtile, gstate,
            semr, semc, semd_r, semd_w, *, nb, group, ktasks,
            precision=jax.lax.Precision.HIGHEST):
    """Destination-tile pipeline: groups alternate between the two
    ``dtile`` slots.  The read of group q's tile starts at its first
    sub-task (hidden behind the group's compute); the RMW write starts
    at its last sub-task and is waited only when slot q&1 is reused two
    groups later (or at kernel end) — no synchronous DMA stalls on the
    critical path.  ``gstate`` (SMEM): [0] = groups started, [1]/[2] =
    pending-write destination row of each slot (-1 = none)."""
    t = pl.program_id(0)
    nsteps = ktasks // group
    slot = jax.lax.rem(jnp.int32(t), jnp.int32(2))
    nxt = jax.lax.rem(jnp.int32(t) + jnp.int32(1), jnp.int32(2))

    def start_wins(s, step):
        for i_ in range(group):
            gi = step * group + i_
            i = jnp.int32(i_)   # python ints trace i64 under jax x64 mode
            pltpu.make_async_copy(
                poolf_hbm.at[pl.ds(lor_ref[gi], nb)], winr.at[s, i],
                semr.at[s, i]).start()
            pltpu.make_async_copy(
                poolf_hbm.at[pl.ds(loc_ref[gi], nb)], winc.at[s, i],
                semc.at[s, i]).start()

    def wait_write(p):
        # complete a deferred destination write on dtile slot p
        p = jnp.int32(p)   # x64-safe: callers pass python ints 0/1
        pltpu.make_async_copy(
            dtile.at[p], out_hbm.at[pl.ds(gstate[1 + p], nb)],
            semd_w.at[p]).wait()
        gstate[1 + p] = jnp.int32(-1)

    @pl.when(t == 0)
    def _():
        start_wins(slot, t)
        gstate[0] = jnp.int32(0)
        gstate[1] = jnp.int32(-1)
        gstate[2] = jnp.int32(-1)

    @pl.when(t + 1 < nsteps)
    def _():
        start_wins(nxt, t + 1)

    # ---- batched compute phase: all `group` sub-tasks at once ---------- #
    # (per-sub-task VPU→MXU→VPU chains serialize; batching the one-hot
    # construction and the three contractions over the group keeps the
    # MXU pipeline full)
    for i_ in range(group):
        i = jnp.int32(i_)
        pltpu.make_async_copy(
            poolf_hbm.at[pl.ds(lor_ref[t * group + i_], nb)],
            winr.at[slot, i], semr.at[slot, i]).wait()
        pltpu.make_async_copy(
            poolf_hbm.at[pl.ds(loc_ref[t * group + i_], nb)],
            winc.at[slot, i], semc.at[slot, i]).wait()

    iot3 = jax.lax.broadcasted_iota(jnp.int32, (group, nb, nb), 2)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (group, nb, 1), 1)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (group, 1, 1), 0)
    bkv = jnp.zeros((group, 1, 1), jnp.int32)
    for i in range(group):                       # SMEM scalars → vector
        bkv = jnp.where(gidx == i, blkn_ref[t * group + i], bkv)
    rr3 = relr[...][:, :, None]                  # [G, nb, 1]
    rc3 = relc[...][:, :, None]
    ponr = (iot3 == rr3) & (rr3 >= 0)
    ponc = (iot3 == rc3) & (rc3 >= 0) & (rowi < bkv)
    r3 = onehot_gather(ponr, winr[slot], group)
    c3 = onehot_gather(ponc, winc[slot], group)
    u3 = jax.lax.dot_general(r3, c3, (((2,), (2,)), ((0,), (0,))),
                             precision=precision,
                             preferred_element_type=jnp.float32)

    # ---- sequential accumulate / destination RMW phase ------------------ #
    for i in range(group):
        gi = t * group + i
        first = jnp.logical_or(
            gi == 0, dst_ref[jnp.maximum(gi - 1, 0)] != dst_ref[gi])
        last = jnp.logical_or(
            gi == ktasks - 1,
            dst_ref[jnp.minimum(gi + 1, ktasks - 1)] != dst_ref[gi])

        @pl.when(first)
        def _():
            p = jax.lax.rem(gstate[0], jnp.int32(2))
            gstate[0] = gstate[0] + jnp.int32(1)

            # slot p last carried the write of group q-2; finish it
            @pl.when(gstate[1 + p] >= 0)
            def _():
                wait_write(p)
            # kick the destination-tile read: it completes while the
            # rest of this destination group computes
            pltpu.make_async_copy(
                poolf_hbm.at[pl.ds(dst_ref[gi] * nb, nb)], dtile.at[p],
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
                poolf_hbm.at[pl.ds(dst_ref[gi] * nb, nb)], dtile.at[p],
                semd_r.at[p]).wait()
            dtile[p] -= acc[:, :]
            drow = dst_ref[gi] * nb
            pltpu.make_async_copy(
                dtile.at[p], out_hbm.at[pl.ds(drow, nb)],
                semd_w.at[p]).start()
            gstate[1 + p] = drow

        if i == group - 1:
            @pl.when(gi == ktasks - 1)
            def _():
                # drain both slots' deferred writes before kernel exit
                for p_ in (0, 1):
                    @pl.when(gstate[1 + p_] >= 0)
                    def _(p_=p_):
                        wait_write(p_)


def pallas_apply_updates(poolf, tasks, nb: int, group: int = 8,
                         interpret: bool = False,
                         precision=jax.lax.Precision.HIGHEST):
    """Apply sorted update micro-tasks to the flat pool [R, nb].

    ``tasks`` holds int32 arrays dst/lor/loc/blkn of length K plus
    relr/relc [K, nb]; K must be a multiple of ``group`` (pad with
    dst = a scratch block id and all-invalid rel rows).  The output
    aliases the input pool; destinations not touched by any task pass
    through.
    """
    k = len(tasks["dst"])
    if k == 0:
        return poolf
    assert k % group == 0, "pad the task list to a multiple of group"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(k // group,),
        in_specs=[
            pl.BlockSpec((group, nb),
                         lambda t, dst, lor, loc, blkn: (t, _i0())),
            pl.BlockSpec((group, nb),
                         lambda t, dst, lor, loc, blkn: (t, _i0())),
            pl.BlockSpec(memory_space=pl.ANY),   # poolf (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nb, nb), jnp.float32),           # acc
            pltpu.VMEM((2, group, nb, nb), jnp.float32),  # row windows
            pltpu.VMEM((2, group, nb, nb), jnp.float32),  # col windows
            pltpu.VMEM((2, nb, nb), jnp.float32),        # dtile slots
            pltpu.SMEM((3,), jnp.int32),                 # gstate
            pltpu.SemaphoreType.DMA((2, group)),
            pltpu.SemaphoreType.DMA((2, group)),
            pltpu.SemaphoreType.DMA((2,)),               # dtile reads
            pltpu.SemaphoreType.DMA((2,)),               # dtile writes
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_kernel, nb=nb, group=group, ktasks=k,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(poolf.shape, poolf.dtype),
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    return fn(tasks["dst"], tasks["lor"], tasks["loc"], tasks["blkn"],
              tasks["relr"], tasks["relc"], poolf)
