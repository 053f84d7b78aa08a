"""Pallas batched trsm: dst ← dst · L^{-T} (masked columns).

XLA's ``lax.linalg.triangular_solve`` lowers to a serialized
block-inversion loop costing ~1-2 ms per call site; one call per level
put it on the factorization's critical path.  This kernel solves a
whole batch in VMEM: it computes R = L^{-1}·dstᵀ by 8-row forward
substitution panels — one full-width MXU contraction eliminates the
finished rows, eight unrolled scalar steps solve within the panel — and
returns Rᵀ.  Lane addressing is done with iota masks and static sublane
slices only (TPU lanes cannot be sliced).

Semantics match :func:`spllt_tpu.numeric.factor._trsm_batch`: the diag
tile holds [[L, 0], [B·L^{-T}, 0]] from potrf (rows >= kvec of the
lower triangle are junk for the solve; columns >= kvec of the output
are zeroed, so the junk never propagates — same argument as the XLA
path's pad_eye).

Reference analogue: ``spllt_solve_block`` (dtrsm,
/root/reference/src/spllt_kernels_mod.F90:1217-1229).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_trsm_batch"]


def _i0():
    """int32 zero for BlockSpec index maps: under jax x64 mode a literal
    ``0`` traces as int64 and Mosaic fails to legalize the index-map
    function — the refined-solve program (solve_scan._build_refined)
    runs with x64 enabled for its f64 residual."""
    import jax.numpy as jnp
    return jnp.int32(0)


def trsm_tiles_body(r_ref, lmat, y, kv, kvmax, *, nb, pb, group,
                    precision=jax.lax.Precision.HIGHEST):
    """Solve R = L^{-1}·y by pb-row forward-substitution panels.

    ``lmat`` [G, nb, nb] diag tiles, ``y`` [G, nb, nb] = dstᵀ, ``kv``
    [G, 1, 1] int32 column counts, ``kvmax`` scalar group max, ``r_ref``
    a [G, nb, nb] VMEM scratch.  Returns Rᵀ (columns >= kv zeroed)."""
    coli = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (1, pb, 1), 1)
    f32 = lmat.dtype
    r_ref[...] = jnp.zeros_like(lmat)
    hi = precision
    for p0 in range(0, nb, pb):
        # panels past the group's widest kv produce all-zero rows (valid
        # mask) and r_ref is zero-initialized — skip them entirely
        @pl.when(p0 < kvmax)
        def _(p0=p0):
            lp = lmat[:, p0:p0 + pb, :]          # [G, pb, nb] L row panel
            # eliminate the finished rows: acc = yᵀ_panel − L[p,:]·R
            acc = (y[:, p0:p0 + pb, :]
                   - jax.lax.dot_general(lp, r_ref[...],
                                         (((2,), (1,)), ((0,), (0,))),
                                         precision=hi,
                                         preferred_element_type=f32))
            for jj in range(pb):
                j = p0 + jj
                lrow = lp[:, jj:jj + 1, :]       # [G, 1, nb]
                piv = jnp.sum(lrow * (coli == j).astype(f32), axis=2,
                              keepdims=True)     # [G, 1, 1]
                valid = (j < kv).astype(f32)
                inv = 1.0 / jnp.where(j < kv, piv, jnp.ones((), f32))
                row = acc[:, jj:jj + 1, :] * inv * valid
                # multipliers of the remaining panel rows: L[p0+i, j]
                lcol = jnp.sum(lp * (coli == j).astype(f32), axis=2,
                               keepdims=True)    # [G, pb, 1]
                acc = (acc * (1.0 - (sub8 == jj).astype(f32))
                       + row * (sub8 == jj).astype(f32)
                       - lcol * row * (sub8 > jj).astype(f32))
            r_ref[:, p0:p0 + pb, :] = acc
    return jnp.swapaxes(r_ref[...], 1, 2)


def _kernel(kv_ref, d_ref, x_ref, o_ref, r_ref, *, nb, pb=8, group,
            precision=jax.lax.Precision.HIGHEST):
    from .pallas_potrf import scalars_to_vec

    g0 = pl.program_id(0) * group
    kv = scalars_to_vec([kv_ref[g0 + i] for i in range(group)], group)
    kvmax = kv_ref[g0]                           # scalar group max: rows
    for i in range(1, group):                    # past it solve to zero
        kvmax = jnp.maximum(kvmax, kv_ref[g0 + i])
    o_ref[...] = trsm_tiles_body(
        r_ref, d_ref[...], jnp.swapaxes(x_ref[...], 1, 2), kv, kvmax,
        nb=nb, pb=pb, group=group, precision=precision)


def pallas_trsm_batch(diag_tiles, dst_tiles, kvec, nb: int, group: int = 4,
                      pb: int | None = None, interpret: bool = False,
                      precision=jax.lax.Precision.HIGHEST):
    """Batched dst·L^{-T} with columns >= kvec zeroed.

    K must be a multiple of ``group`` (pad with kvec=0 → zero output,
    the bucketed executors' padding convention).
    """
    k = dst_tiles.shape[0]
    assert k % group == 0, "pad the batch to a multiple of group"
    if pb is None:
        # same panel-width tuning as pallas_potrf (measured on v5e)
        pb = next((c for c in (32, 16, 8) if nb % c == 0), nb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k // group,),
        in_specs=[
            pl.BlockSpec((group, nb, nb), lambda g, kv: (g, _i0(), _i0())),
            pl.BlockSpec((group, nb, nb), lambda g, kv: (g, _i0(), _i0())),
        ],
        out_specs=pl.BlockSpec((group, nb, nb), lambda g, kv: (g, _i0(), _i0())),
        scratch_shapes=[pltpu.VMEM((group, nb, nb), jnp.float32)],
    )
    fn = pl.pallas_call(
        functools.partial(_kernel, nb=nb, group=group, pb=pb,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(dst_tiles.shape, dst_tiles.dtype),
        interpret=interpret,
    )
    return fn(kvec.astype(jnp.int32), diag_tiles, dst_tiles)
