"""Pallas fused update kernel.

Applies a batch of update micro-tasks — gather source rows, GEMM, and
accumulate into the destination tile — inside ONE kernel, replacing the
XLA gather → dot_general → scatter-add chain whose row-granular HBM
gathers and element-serialized scatters dominated the factorization.

Design (per grid step = one micro-task, tasks sorted by destination):
  * the source rows feeding ONE destination tile are a contiguous
    position range of the source node's column panel (plan/factor_tasks
    builds position maps from an arange), so the row-role and col-role
    gathers each read from their own [nb, nb] window of the flat pool —
    two small DMAs per task, double-buffered across grid steps
  * the two position-map rows arrive as BlockSpec-pipelined inputs
    indexed by scalar-prefetched map ids (no manual DMAs)
  * row gathers become one-hot matmuls on the MXU
    (R = onehot(pr-pminr) @ Wr), the classic TPU gather trick; with
    nb-row windows the one-hot contraction is nb³ instead of nb²·hmax —
    the union-window design this replaces padded every gather to the
    task's full row+col position span (up to 2048 rows)
  * consecutive micro-tasks with the same destination accumulate in a
    VMEM scratch tile; the destination tile's read DMA is kicked at
    group START (overlapping the whole group's compute) and the tile is
    read-modify-written to HBM once per group

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
    task carries two window bases into the flat pool [pool_rows, nb]:
    ``lor`` for the row-role gather and ``loc`` for the col-role gather,
    both clamped so the static nb-row window DMA stays in bounds.

    Returns dict of int32 arrays: dst, mr, mc, lor, pminr, loc, pminc,
    blkn.  Every task fits the nb-row windows (the per-tile position
    ranges are contiguous), so there is no XLA spill path.
    """
    dst, mr, mc = [], [], []
    lor, pmr, loc, pmc, bn = [], [], [], [], []
    lo_cap = pool_rows - nb
    for t in range(int(fp.updbt_ptr[lvl_lo]),
                   int(fp.updbt_ptr[lvl_hi + 1])):
        pr = fp.maps[fp.updbt_mr[t]]
        pc = fp.maps[fp.updbt_mc[t]]
        vr = pr[pr >= 0]
        vc = pc[pc >= 0]
        if len(vr) == 0 or len(vc) == 0:
            continue
        pminr, pminc = int(vr.min()), int(vc.min())
        if __debug__:
            assert int(vr.max()) - pminr < nb, "row positions not tile-local"
            assert int(vc.max()) - pminc < nb, "col positions not tile-local"
        for kb in range(int(fp.updbt_c[t])):
            base = int(fp.srcvec[fp.updbt_svp[t] + kb]) * nb
            l0r = min(base + pminr, lo_cap)
            l0c = min(base + pminc, lo_cap)
            dst.append(int(fp.updbt_dst[t]))
            mr.append(int(fp.updbt_mr[t]))
            mc.append(int(fp.updbt_mc[t]))
            lor.append(l0r)
            pmr.append(pminr - (base + pminr - l0r))
            loc.append(l0c)
            pmc.append(pminc - (base + pminc - l0c))
            bn.append(int(fp.blk_n[fp.updbt_dst[t]]))
    order = np.argsort(np.asarray(dst), kind="stable") if dst else \
        np.empty(0, np.int64)
    out = {
        "dst": np.asarray(dst, np.int32)[order],
        "mr": np.asarray(mr, np.int32)[order],
        "mc": np.asarray(mc, np.int32)[order],
        "lor": np.asarray(lor, np.int32)[order],
        "pminr": np.asarray(pmr, np.int32)[order],
        "loc": np.asarray(loc, np.int32)[order],
        "pminc": np.asarray(pmc, np.int32)[order],
        "blkn": np.asarray(bn, np.int32)[order],
    }
    return out


def _kernel(dst_ref, lor_ref, pminr_ref, loc_ref, pminc_ref, blkn_ref,
            mr_ref, mc_ref, mrow, mcrow, poolf_hbm, out_hbm,
            acc, winr, winc, dtile, sems, *, nb, ktasks):
    t = pl.program_id(0)
    slot = jax.lax.rem(jnp.int32(t), jnp.int32(2))
    nxt = jax.lax.rem(jnp.int32(t) + jnp.int32(1), jnp.int32(2))

    def win_copy(s, tt, lo_ref, win, sem0):
        return pltpu.make_async_copy(
            poolf_hbm.at[pl.ds(lo_ref[tt], nb)], win.at[s],
            sems.at[sem0 + s])

    first = jnp.logical_or(t == 0, dst_ref[jnp.maximum(t - 1, 0)]
                           != dst_ref[t])
    last = jnp.logical_or(t == ktasks - 1,
                          dst_ref[jnp.minimum(t + 1, ktasks - 1)]
                          != dst_ref[t])

    @pl.when(t == 0)
    def _():
        win_copy(slot, t, lor_ref, winr, 0).start()
        win_copy(slot, t, loc_ref, winc, 2).start()

    @pl.when(first)
    def _():
        # kick the destination-tile read: it completes while this whole
        # group computes
        pltpu.make_async_copy(
            poolf_hbm.at[pl.ds(dst_ref[t] * nb, nb)], dtile,
            sems.at[4]).start()

    @pl.when(t + 1 < ktasks)
    def _():
        win_copy(nxt, t + 1, lor_ref, winr, 0).start()
        win_copy(nxt, t + 1, loc_ref, winc, 2).start()

    win_copy(slot, t, lor_ref, winr, 0).wait()
    win_copy(slot, t, loc_ref, winc, 2).wait()

    pr = mrow[...].reshape(-1)       # [nb] int32 positions or -1
    pc = mcrow[...].reshape(-1)
    iot = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    # one-hot gather matrices (invalid slots -> all-zero rows)
    ponr = ((iot == (pr - pminr_ref[t])[:, None])
            & (pr[:, None] >= 0)).astype(winr.dtype)
    ponc = ((iot == (pc - pminc_ref[t])[:, None])
            & (pc[:, None] >= 0)).astype(winc.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    cmask = (lane < blkn_ref[t]).astype(winc.dtype)

    hi = jax.lax.Precision.HIGHEST
    r = jnp.dot(ponr, winr[slot], precision=hi,
                preferred_element_type=jnp.float32)
    c = jnp.dot(ponc, winc[slot], precision=hi,
                preferred_element_type=jnp.float32)
    c = c * cmask.reshape(nb, 1)
    u = jax.lax.dot_general(r, c, (((1,), (1,)), ((), ())), precision=hi,
                            preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        acc[:, :] = u

    @pl.when(jnp.logical_not(first))
    def _():
        acc[:, :] += u

    @pl.when(last)
    def _():
        # complete the read-modify-write of the destination tile
        pltpu.make_async_copy(
            poolf_hbm.at[pl.ds(dst_ref[t] * nb, nb)], dtile,
            sems.at[4]).wait()
        dtile[:, :] -= acc[:, :]
        cp_out = pltpu.make_async_copy(
            dtile, out_hbm.at[pl.ds(dst_ref[t] * nb, nb)], sems.at[5])
        cp_out.start()
        cp_out.wait()


def pallas_apply_updates(poolf, maps, tasks, nb: int,
                         interpret: bool = False):
    """Apply sorted update micro-tasks to the flat pool [R, nb].

    ``maps`` is [nmaps(+pad), nb] int32; ``tasks`` holds int32 arrays
    dst/mr/mc/lor/pminr/loc/pminc/blkn of length K.  The output aliases
    the input pool; destinations not touched by any task pass through.
    """
    k = len(tasks["dst"])
    if k == 0:
        return poolf
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, 1, nb),
                         lambda t, dst, lor, pminr, loc, pminc, blkn,
                         mr, mc: (mr[t], _i0(), _i0())),   # row map
            pl.BlockSpec((1, 1, nb),
                         lambda t, dst, lor, pminr, loc, pminc, blkn,
                         mr, mc: (mc[t], _i0(), _i0())),   # col map
            pl.BlockSpec(memory_space=pltpu.ANY),   # poolf (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((nb, nb), jnp.float32),       # acc
            pltpu.VMEM((2, nb, nb), jnp.float32),    # row window (dbl buf)
            pltpu.VMEM((2, nb, nb), jnp.float32),    # col window (dbl buf)
            pltpu.VMEM((nb, nb), jnp.float32),       # dtile
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_kernel, nb=nb, ktasks=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(poolf.shape, poolf.dtype),
        input_output_aliases={10: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    maps3 = maps.reshape(maps.shape[0], 1, maps.shape[1])
    return fn(tasks["dst"], tasks["lor"], tasks["pminr"], tasks["loc"],
              tasks["pminc"], tasks["blkn"], tasks["mr"], tasks["mc"],
              maps3, maps3, poolf)
