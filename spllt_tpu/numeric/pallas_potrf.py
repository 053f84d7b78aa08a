"""Pallas batched potrf (masked, with in-tile below-rows solve).

XLA's ``lax.linalg.cholesky`` lowers to a serialized blocked loop whose
per-call latency (~3-4 ms for [K, 128, 128] regardless of K) dominated
the factorization's critical path — one call per level.  This kernel
factors a whole batch of tiles in VMEM with an unblocked right-looking
elimination fully vectorized over the batch: each step extracts the
pivot column/row by masked reductions (no dynamic lane indexing, which
TPU lanes forbid) and applies a rank-1 outer-product update on the VPU.

Semantics match :func:`spllt_tpu.numeric.factor._potrf_batch` exactly:
given tiles [K, nb, nb] whose leading ``kvec`` columns hold the (lower)
diagonal block D and whose rows >= kvec hold boundary rows B, returns
[[chol(D), 0], [B·chol(D)^{-T}, 0]].  The below-rows solve falls out of
the same elimination by seeding the tile as the symmetric bordered
matrix [[sym(D), Bᵀ], [B, I]] — the rank-1 updates of columns j < kvec
perform the trsm of B in passing.

Reference analogue: ``spllt_factor_diag_block`` (dpotrf + trailing
dtrsm, /root/reference/src/spllt_kernels_mod.F90:1168-1189).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_potrf_batch"]


def _i0():
    """int32 zero for BlockSpec index maps: under jax x64 mode a literal
    ``0`` traces as int64 and Mosaic fails to legalize the index-map
    function — the refined-solve program (solve_scan._build_refined)
    runs with x64 enabled for its f64 residual."""
    import jax.numpy as jnp
    return jnp.int32(0)


def scalars_to_vec(vals, group):
    """[G, 1, 1] int32 vector from ``group`` SMEM scalars (1D→3D vector
    reshapes are unsupported in Mosaic, so build by masked selects)."""
    gi = jax.lax.broadcasted_iota(jnp.int32, (group, 1, 1), 0)
    kv = jnp.zeros((group, 1, 1), jnp.int32)
    for i, v in enumerate(vals):
        kv = jnp.where(gi == i, v, kv)
    return kv


def potrf_tiles_body(s_ref, s0, kv, kvmax, *, nb, pb, group,
                     precision=jax.lax.Precision.HIGHEST):
    """Row-oriented (upper/Uᵀ) panel elimination, fully static.

    ``s0`` [G, nb, nb] input tiles, ``kv`` [G, 1, 1] int32 column counts,
    ``kvmax`` scalar max over the group, ``s_ref`` a [G, nb, nb] VMEM
    scratch.  Returns the masked lower output [[L, 0], [B·L^{-T}, 0]].

    Per pb-row panel: pb scalar elimination steps touching only the
    [G, pb, nb] panel slice (static sublane slices, lane masks from
    iota — TPU lanes cannot be sliced dynamically), then ONE rank-pb
    MXU contraction updates the trailing rows.  Final transpose + mask
    emits the lower form.
    """
    rowi = jax.lax.broadcasted_iota(jnp.int32, (1, nb, nb), 1)
    coli = jax.lax.broadcasted_iota(jnp.int32, (1, nb, nb), 2)
    st = jnp.swapaxes(s0, 1, 2)
    in_d = (rowi < kv) & (coli < kv)
    f32 = s0.dtype
    zero = jnp.zeros((), f32)
    # bordered symmetric seed [[sym(D), Bᵀ], [B, I]]
    s_ref[...] = (jnp.where(in_d & (rowi >= coli), s0, zero)
                  + jnp.where(in_d & (rowi < coli), st, zero)
                  + jnp.where((rowi >= kv) & (coli < kv), s0, zero)
                  + jnp.where((rowi < kv) & (coli >= kv), st, zero)
                  + ((rowi == coli) & (rowi >= kv)).astype(f32))

    lane = coli[:, :1, :]                        # [1, 1, nb]
    qb = 8 if pb % 8 == 0 else pb                # shrink granularity
    for p0 in range(0, nb, pb):
        # panels past the group's widest column count do nothing: rows
        # j >= kv are zeroed by the valid mask and the output mask reads
        # only s_ref rows < kv <= kvmax, all produced by earlier panels.
        # Leaf supernodes (kv << nb) skip most of the elimination.
        @pl.when(p0 < kvmax)
        def _(p0=p0):
            # triangular shrink: eliminated rows are final — write them
            # back in qb-row groups and drop them from the live panel,
            # so the per-step elementwise/reduce work shrinks from
            # [G, pb, nb] to the remaining height (static shapes only)
            live = s_ref[:, p0:p0 + pb, :]       # [G, h, nb], h shrinks
            for q0 in range(0, pb, qb):
                h = pb - q0
                subh = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1), 1)
                for jj in range(qb):
                    j = p0 + q0 + jj
                    rowjj = live[:, jj:jj + 1, :]    # [G, 1, nb]
                    dj = jnp.sum(rowjj * (lane == j).astype(f32),
                                 axis=2, keepdims=True)  # [G, 1, 1]
                    valid = (j < kv).astype(f32)
                    inv = jax.lax.rsqrt(
                        jnp.where(j < kv, dj, jnp.ones((), f32)))
                    urow = rowjj * inv * (lane >= j).astype(f32) * valid
                    # multipliers of the live rows (col-j entry)
                    mult = jnp.sum(live * (lane == j).astype(f32),
                                   axis=2, keepdims=True) * inv
                    below = (subh > jj).astype(f32)
                    live = (live * (1.0 - (subh == jj).astype(f32))
                            + urow * (subh == jj).astype(f32)
                            - mult * urow * below)
                s_ref[:, p0 + q0:p0 + q0 + qb, :] = live[:, :qb, :]
                if q0 + qb < pb:
                    live = live[:, qb:, :]
            # trailing rows: S -= Upanelᵀ·Upanel restricted to rows
            # below the panel (static sublane slice)
            if p0 + pb < nb:
                panel = s_ref[:, p0:p0 + pb, :]
                upd = jax.lax.dot_general(
                    panel, panel, (((1,), (1,)), ((0,), (0,))),
                    precision=precision,
                    preferred_element_type=f32)  # [G, nb, nb]
                q = p0 + pb
                s_ref[:, q:, :] = s_ref[:, q:, :] - upd[:, q:, :]
    # lower output [[L, 0], [B·L^{-T}, 0]]
    out = jnp.swapaxes(s_ref[...], 1, 2)
    return out * ((coli < kv) & (rowi >= coli)).astype(f32)


def _kernel(kv_ref, t_ref, o_ref, s_ref, *, nb, pb=8, group,
            precision=jax.lax.Precision.HIGHEST):
    g0 = pl.program_id(0) * group
    kv = scalars_to_vec([kv_ref[g0 + i] for i in range(group)], group)
    kvmax = kv_ref[g0]                           # scalar group max: panels
    for i in range(1, group):                    # past it are skipped
        kvmax = jnp.maximum(kvmax, kv_ref[g0 + i])
    o_ref[...] = potrf_tiles_body(s_ref, t_ref[...], kv, kvmax, nb=nb,
                                  pb=pb, group=group, precision=precision)


def pallas_potrf_batch(tiles, kvec, nb: int, group: int = 32,
                       pb: int | None = None, interpret: bool = False,
                       precision=jax.lax.Precision.HIGHEST):
    """Batched masked potrf of tiles [K, nb, nb]; kvec [K] column counts.

    K must be a multiple of ``group`` (pad with kvec=0 tiles — their
    output is all zeros, matching ``_potrf_batch`` padding semantics).
    """
    k = tiles.shape[0]
    assert k % group == 0, "pad the batch to a multiple of group"
    if pb is None:
        # measured on v5e at nb=128: pb=32 beats 8/16/64 (fewer panel
        # slices/trailing updates without bloating the per-scalar-step
        # working set); must divide nb
        pb = next((c for c in (32, 16, 8) if nb % c == 0), nb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k // group,),
        in_specs=[
            pl.BlockSpec((group, nb, nb), lambda g, kv: (g, _i0(), _i0())),
        ],
        out_specs=pl.BlockSpec((group, nb, nb), lambda g, kv: (g, _i0(), _i0())),
        scratch_shapes=[pltpu.VMEM((group, nb, nb), jnp.float32)],
    )
    fn = pl.pallas_call(
        functools.partial(_kernel, nb=nb, group=group, pb=pb,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(tiles.shape, tiles.dtype),
        interpret=interpret,
    )
    return fn(kvec.astype(jnp.int32), tiles)
