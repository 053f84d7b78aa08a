"""Pallas fused update kernel.

Applies a batch of update micro-tasks — gather source rows, GEMM, and
accumulate into the destination tile — inside ONE kernel, replacing the
XLA gather → dot_general → scatter-add chain whose row-granular HBM
gathers and element-serialized scatters dominated the factorization.

Design (per grid step = one micro-task, tasks sorted by destination):
  * the source rows of one block column live in a contiguous panel of
    the flat pool; the panel [lo, lo+H) is DMA'd to VMEM (H = per-bucket
    size), double-buffered across grid steps
  * the two position-map rows arrive as BlockSpec-pipelined inputs
    indexed by scalar-prefetched map ids (no manual DMAs)
  * row gathers become one-hot matmuls on the MXU
    (R = onehot(pr-lo) @ S), the classic TPU gather trick
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


def build_micro_tasks(fp, lvl_lo: int, lvl_hi: int, nb: int, hmax: int,
                      pool_rows: int):
    """Expand the (width-fused) updbt tasks of levels [lvl_lo, lvl_hi]
    back into per-block-column micro-tasks sorted by destination, with
    contiguous source-panel bounds clamped so every panel DMA of ``hmax``
    rows stays in bounds of the flat pool [pool_rows, nb].

    Returns dict of int32 arrays: dst, mr, mc, lo, pmin, blkn, span.
    Tasks whose span exceeds hmax are returned separately in ``spill``
    (to be executed by the XLA path).
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


def _kernel(dst_ref, lo_ref, pmin_ref, blkn_ref, mr_ref, mc_ref,
            mrow, mcrow, poolf_hbm, out_hbm,
            acc, panel, dtile, sems, *, nb, hmax, ktasks):
    t = pl.program_id(0)
    slot = jax.lax.rem(jnp.int32(t), jnp.int32(2))
    nxt = jax.lax.rem(jnp.int32(t) + jnp.int32(1), jnp.int32(2))

    def start_panel(s, tt):
        pltpu.make_async_copy(poolf_hbm.at[pl.ds(lo_ref[tt], hmax)],
                              panel.at[s], sems.at[s]).start()

    def wait_panel(s, tt):
        pltpu.make_async_copy(poolf_hbm.at[pl.ds(lo_ref[tt], hmax)],
                              panel.at[s], sems.at[s]).wait()

    first = jnp.logical_or(t == 0, dst_ref[jnp.maximum(t - 1, 0)]
                           != dst_ref[t])
    last = jnp.logical_or(t == ktasks - 1,
                          dst_ref[jnp.minimum(t + 1, ktasks - 1)]
                          != dst_ref[t])

    @pl.when(t == 0)
    def _():
        start_panel(slot, t)

    @pl.when(first)
    def _():
        # kick the destination-tile read: it completes while this whole
        # group computes
        pltpu.make_async_copy(
            poolf_hbm.at[pl.ds(dst_ref[t] * nb, nb)], dtile,
            sems.at[2]).start()

    @pl.when(t + 1 < ktasks)
    def _():
        start_panel(nxt, t + 1)

    wait_panel(slot, t)

    pmin = pmin_ref[t]
    pan = panel[slot]                # [hmax, nb]
    pr = mrow[...].reshape(-1)       # [nb] int32 positions or -1
    pc = mcrow[...].reshape(-1)
    iot_h = jax.lax.broadcasted_iota(jnp.int32, (nb, hmax), 1)
    # one-hot gather matrices (invalid slots -> all-zero rows)
    pr_rel = (pr - pmin)[:, None]
    pc_rel = (pc - pmin)[:, None]
    ponr = ((iot_h == pr_rel) & (pr[:, None] >= 0)).astype(panel.dtype)
    ponc = ((iot_h == pc_rel) & (pc[:, None] >= 0)).astype(panel.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    cmask = (lane < blkn_ref[t]).astype(panel.dtype)

    hi = jax.lax.Precision.HIGHEST
    r = jnp.dot(ponr, pan, precision=hi,
                preferred_element_type=jnp.float32)
    c = jnp.dot(ponc, pan, precision=hi,
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
            sems.at[2]).wait()
        dtile[:, :] -= acc[:, :]
        cp_out = pltpu.make_async_copy(
            dtile, out_hbm.at[pl.ds(dst_ref[t] * nb, nb)], sems.at[3])
        cp_out.start()
        cp_out.wait()


def pallas_apply_updates(poolf, maps, tasks, nb: int, hmax: int,
                         interpret: bool = False):
    """Apply sorted update micro-tasks to the flat pool [R, nb].

    ``maps`` is [nmaps(+pad), nb] int32; ``tasks`` holds int32 arrays
    dst/mr/mc/lo/pmin/blkn of length K.  The output aliases the input
    pool; destinations not touched by any task pass through.
    """
    k = len(tasks["dst"])
    if k == 0:
        return poolf
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, 1, nb),
                         lambda t, dst, lo, pmin, blkn, mr, mc:
                         (mr[t], _i0(), _i0())),          # row map (pipelined)
            pl.BlockSpec((1, 1, nb),
                         lambda t, dst, lo, pmin, blkn, mr, mc:
                         (mc[t], _i0(), _i0())),          # col map (pipelined)
            pl.BlockSpec(memory_space=pltpu.ANY),   # poolf (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((nb, nb), jnp.float32),       # acc
            pltpu.VMEM((2, hmax, nb), jnp.float32),  # panel (dbl buffer)
            pltpu.VMEM((nb, nb), jnp.float32),       # dtile
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_kernel, nb=nb, hmax=hmax, ktasks=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(poolf.shape, poolf.dtype),
        input_output_aliases={8: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    maps3 = maps.reshape(maps.shape[0], 1, maps.shape[1])
    return fn(tasks["dst"], tasks["lo"], tasks["pmin"], tasks["blkn"],
              tasks["mr"], tasks["mc"], maps3, maps3, poolf)
