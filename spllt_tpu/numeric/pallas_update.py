"""Pallas fused update kernel (experimental, flag-gated).

Applies a batch of update micro-tasks — gather source rows, GEMM, and
accumulate into the destination tile — inside ONE kernel, replacing the
XLA gather → dot_general → scatter-add chain whose HBM temporaries and
scatter lowering dominate the factorization time.

Design (per grid step = one micro-task, tasks sorted by destination):
  * the source rows of one block column live in a contiguous panel of the
    flat pool; the panel [lo, lo+H) is DMA'd to VMEM (H = bucket size)
  * row gathers become one-hot matmuls on the MXU
    (R = onehot(pr-lo) @ S), the classic TPU gather trick
  * consecutive micro-tasks with the same destination accumulate in a
    VMEM scratch tile; the tile is read-modify-written to HBM only when
    the destination changes — duplicate-destination scatters cost one
    write instead of K

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


def build_micro_tasks(fp, lvl_lo: int, lvl_hi: int, nb: int, hmax: int,
                      pool_rows: int):
    """Expand the (width-fused) updbt tasks of levels [lvl_lo, lvl_hi]
    back into per-block-column micro-tasks sorted by destination, with
    contiguous source-panel bounds clamped so every panel DMA of ``hmax``
    rows stays in bounds of the flat pool [pool_rows, nb].

    Returns dict of int32 arrays: dst, mr, mc, lo, pmin, blkn.  Tasks
    whose span exceeds hmax are returned separately in ``spill`` (to be
    executed by the XLA path).
    """
    dst, mr, mc, lo, pm, bn, spn = [], [], [], [], [], [], []
    spill = []
    for t in range(int(fp.updbt_ptr[lvl_lo]),
                   int(fp.updbt_ptr[lvl_hi + 1])):
        pr = fp.maps[fp.updbt_mr[t]]
        pc = fp.maps[fp.updbt_mc[t]]
        valid = np.concatenate([pr[pr >= 0], pc[pc >= 0]])
        if len(valid) == 0:
            continue
        pmin, pmax = int(valid.min()), int(valid.max())
        if pmax - pmin + 1 > hmax:
            spill.append(t)
            continue
        for kb in range(int(fp.updbt_c[t])):
            base = int(fp.srcvec[fp.updbt_svp[t] + kb])
            l0 = base * nb + pmin
            l2 = min(l0, pool_rows - hmax)
            dst.append(int(fp.updbt_dst[t]))
            mr.append(int(fp.updbt_mr[t]))
            mc.append(int(fp.updbt_mc[t]))
            lo.append(l2)
            pm.append(pmin - (l0 - l2))
            bn.append(int(fp.blk_n[fp.updbt_dst[t]]))
            spn.append(pmax - pmin + 1)
    order = np.argsort(np.asarray(dst), kind="stable") if dst else \
        np.empty(0, np.int64)
    out = {
        "dst": np.asarray(dst, np.int32)[order],
        "mr": np.asarray(mr, np.int32)[order],
        "mc": np.asarray(mc, np.int32)[order],
        "lo": np.asarray(lo, np.int32)[order],
        "pmin": np.asarray(pm, np.int32)[order],
        "blkn": np.asarray(bn, np.int32)[order],
        "span": np.asarray(spn, np.int32)[order],
    }
    return out, spill


def _start_task_dmas(slot, t, lo_ref, mr_ref, mc_ref, maps_hbm, poolf_hbm,
                     panel, mrow, mcrow, sems, hmax):
    """Kick off the input DMAs of task t into buffer `slot` (double
    buffering: the next task's panel streams while this one computes)."""
    pltpu.make_async_copy(maps_hbm.at[pl.ds(mr_ref[t], 1)],
                          mrow.at[slot], sems.at[3 * slot + 0]).start()
    pltpu.make_async_copy(maps_hbm.at[pl.ds(mc_ref[t], 1)],
                          mcrow.at[slot], sems.at[3 * slot + 1]).start()
    pltpu.make_async_copy(poolf_hbm.at[pl.ds(lo_ref[t], hmax)],
                          panel.at[slot], sems.at[3 * slot + 2]).start()


def _wait_task_dmas(slot, t, lo_ref, mr_ref, mc_ref, maps_hbm, poolf_hbm,
                    panel, mrow, mcrow, sems, hmax):
    pltpu.make_async_copy(maps_hbm.at[pl.ds(mr_ref[t], 1)],
                          mrow.at[slot], sems.at[3 * slot + 0]).wait()
    pltpu.make_async_copy(maps_hbm.at[pl.ds(mc_ref[t], 1)],
                          mcrow.at[slot], sems.at[3 * slot + 1]).wait()
    pltpu.make_async_copy(poolf_hbm.at[pl.ds(lo_ref[t], hmax)],
                          panel.at[slot], sems.at[3 * slot + 2]).wait()


def _kernel(dst_ref, lo_ref, pmin_ref, mr_ref, mc_ref, blkn_ref,
            maps_hbm, poolf_hbm, out_hbm,
            acc, panel, mrow, mcrow, dtile, sems, *, nb, hmax, ktasks):
    t = pl.program_id(0)
    slot = jax.lax.rem(jnp.int32(t), jnp.int32(2))
    nxt = jax.lax.rem(jnp.int32(t) + jnp.int32(1), jnp.int32(2))
    args = (lo_ref, mr_ref, mc_ref, maps_hbm, poolf_hbm, panel, mrow,
            mcrow, sems, hmax)

    @pl.when(t == 0)
    def _():
        _start_task_dmas(slot, t, *args)

    @pl.when(t + 1 < ktasks)
    def _():
        _start_task_dmas(nxt, t + 1, *args)

    _wait_task_dmas(slot, t, *args)

    pmin = pmin_ref[t]
    pan = panel[slot]                # [hmax, nb]
    pr = mrow[slot].reshape(-1)      # [nb] int32 positions or -1
    pc = mcrow[slot].reshape(-1)
    iot_h = jax.lax.broadcasted_iota(jnp.int32, (nb, hmax), 1)
    # one-hot gather matrices (invalid slots -> all-zero rows)
    pr_rel = (pr - pmin)[:, None]
    pc_rel = (pc - pmin)[:, None]
    ponr = ((iot_h == pr_rel) & (pr[:, None] >= 0)).astype(panel.dtype)
    ponc = ((iot_h == pc_rel) & (pc[:, None] >= 0)).astype(panel.dtype)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    cmask = (slot < blkn_ref[t]).astype(panel.dtype)

    hi = jax.lax.Precision.HIGHEST
    r = jnp.dot(ponr, pan, precision=hi,
                preferred_element_type=jnp.float32)
    c = jnp.dot(ponc, pan, precision=hi,
                preferred_element_type=jnp.float32)
    c = c * cmask.reshape(nb, 1)
    u = jax.lax.dot_general(r, c, (((1,), (1,)), ((), ())), precision=hi,
                            preferred_element_type=jnp.float32)

    first = t == 0
    prev_differs = jnp.logical_or(first, dst_ref[jnp.maximum(t - 1, 0)]
                                  != dst_ref[t])
    last = t == ktasks - 1
    next_differs = jnp.logical_or(last, dst_ref[jnp.minimum(t + 1,
                                                            ktasks - 1)]
                                  != dst_ref[t])

    @pl.when(prev_differs)
    def _():
        acc[:, :] = jnp.zeros((acc.shape[0], acc.shape[1]),
                              dtype=acc.dtype)

    acc[:, :] += u

    @pl.when(next_differs)
    def _():
        # read-modify-write the destination tile
        cp_in = pltpu.make_async_copy(
            poolf_hbm.at[pl.ds(dst_ref[t] * nb, nb)], dtile, sems.at[6])
        cp_in.start()
        cp_in.wait()
        dtile[:, :] -= acc[:, :]
        cp_out = pltpu.make_async_copy(
            dtile, out_hbm.at[pl.ds(dst_ref[t] * nb, nb)], sems.at[7])
        cp_out.start()
        cp_out.wait()


def pallas_apply_updates(poolf, maps, tasks, nb: int, hmax: int,
                         interpret: bool = False):
    """Apply sorted update micro-tasks to the flat pool [R, nb].

    NOTE: out aliases the input pool; destinations not touched by any
    task must be copied through — we use input_output_aliases so the
    buffer is shared and only RMW'd tiles change.
    """
    k = len(tasks["dst"])
    if k == 0:
        return poolf
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # maps (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # poolf (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nb, nb), jnp.float32),       # acc
            pltpu.VMEM((2, hmax, nb), jnp.float32),  # panel (dbl buffer)
            pltpu.VMEM((2, 1, nb), jnp.int32),       # mrow
            pltpu.VMEM((2, 1, nb), jnp.int32),       # mcrow
            pltpu.VMEM((nb, nb), jnp.float32),       # dtile
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_kernel, nb=nb, hmax=hmax, ktasks=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(poolf.shape, poolf.dtype),
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    return fn(tasks["dst"], tasks["lo"], tasks["pmin"], tasks["mr"],
              tasks["mc"], tasks["blkn"], maps, poolf)
