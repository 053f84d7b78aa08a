"""Pallas batched left triangular solve for the solve phase.

The solve executor's per-level ``lax.linalg.triangular_solve`` call
sites cost ~2 ms each (serialized XLA lowering) and made up 116 of the
128 ms forward+backward solve at nrhs=1.  This kernel solves a whole
level's tiles in VMEM with 8-row substitution panels (one full-width
MXU elimination per panel) — the same scheme as pallas_trsm, but
left-sided against an rhs panel [G, nb, nrhs].

Semantics match the executor's XLA path exactly (solve_scan.sol_op):
``m = tile + I on rows >= kvec`` solved against the gathered rhs —
for the forward sweep the below-diagonal rows of the tile carry real
B·L^{-T} values, so the "solve" also applies the below-row updates;
for the backward sweep (transpose) columns >= kvec are zero, so those
rhs rows pass through unchanged.

Reference analogue: ``slv_solve`` (dtrsv/dtrsm,
/root/reference/src/spllt_solve_kernels_mod.F90:11-47).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_left_solve", "solve_tiles_body"]


def _i0():
    """int32 zero for BlockSpec index maps: under jax x64 mode a literal
    ``0`` traces as int64 and Mosaic fails to legalize the index-map
    function — the refined-solve program (solve_scan._build_refined)
    runs with x64 enabled for its f64 residual."""
    import jax.numpy as jnp
    return jnp.int32(0)


def solve_tiles_body(y_ref, lmat, z, kv, *, nb, nrhs, transpose, group,
                     pb=8, kvmax=None):
    """8-row substitution panels over [G, nb, nrhs] right-hand sides.

    ``lmat`` [G, nb, nb] lower tiles, ``z`` [G, nb, nrhs], ``kv``
    [G, 1, 1] int32 column counts (rows >= kv act as identity),
    ``y_ref`` a [G, nb, nrhs] VMEM scratch.  Returns y solving
    (L + I_pad) y = z, or its transpose.  Shared by the standalone
    level kernel below and the solve megakernel's SOL/SOLT bodies.

    ``kvmax`` (optional scalar = max(kv) over the group): panels whose
    rows all lie at or beyond kvmax only need the rank-pb MXU update
    (the [B, I] rows carry no pivots — their per-row elimination steps
    are exact no-ops), so the serialized row loop is skipped for them.
    Leaf tiles (kv << nb) then run ~kv/pb row loops instead of nb/pb —
    the same trick as the factor potrf's panel skipping
    (pallas_potrf.potrf_tiles_body).
    """
    if transpose:
        lmat = jnp.swapaxes(lmat, 1, 2)          # solve Lᵀy = z by rows
    coli = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (1, pb, 1), 1)
    f32 = lmat.dtype
    hi = jax.lax.Precision.HIGHEST
    y_ref[...] = jnp.zeros((group, nb, nrhs), f32)
    panels = range(nb - pb, -1, -pb) if transpose else range(0, nb, pb)
    for p0 in panels:
        lp = lmat[:, p0:p0 + pb, :]              # [G, pb, nb]
        acc0 = (z[:, p0:p0 + pb, :]
                - jax.lax.dot_general(lp, y_ref[...],
                                      (((2,), (1,)), ((0,), (0,))),
                                      precision=hi,
                                      preferred_element_type=f32))
        y_ref[:, p0:p0 + pb, :] = acc0           # final for rows >= kv

        def row_loop(p0=p0, lp=lp, acc0=acc0):
            acc = acc0
            steps = range(pb - 1, -1, -1) if transpose else range(pb)
            for jj in steps:
                j = p0 + jj
                lrow = lp[:, jj:jj + 1, :]
                piv = jnp.sum(lrow * (coli == j).astype(f32), axis=2,
                              keepdims=True)
                inv = 1.0 / jnp.where(j < kv, piv, jnp.ones((), f32))
                row = acc[:, jj:jj + 1, :] * inv     # [G, 1, nrhs]
                lcol = jnp.sum(lp * (coli == j).astype(f32), axis=2,
                               keepdims=True)        # [G, pb, 1]
                rem = (sub8 < jj) if transpose else (sub8 > jj)
                acc = (acc * (1.0 - (sub8 == jj).astype(f32))
                       + row * (sub8 == jj).astype(f32)
                       - lcol * row * rem.astype(f32))
            y_ref[:, p0:p0 + pb, :] = acc

        if kvmax is None:
            row_loop()
        else:
            pl.when(p0 < kvmax)(row_loop)
    return y_ref[...]


def _kernel(kv_ref, t_ref, z_ref, o_ref, y_ref, *, nb, nrhs, transpose,
            group, pb=8):
    g0 = pl.program_id(0) * group
    gi = jax.lax.broadcasted_iota(jnp.int32, (group, 1, 1), 0)
    kv = jnp.zeros((group, 1, 1), jnp.int32)
    kvmax = kv_ref[g0]
    for i in range(group):
        kv = jnp.where(gi == i, kv_ref[g0 + i], kv)
        kvmax = jnp.maximum(kvmax, kv_ref[g0 + i])
    o_ref[...] = solve_tiles_body(y_ref, t_ref[...], z_ref[...], kv,
                                  nb=nb, nrhs=nrhs, transpose=transpose,
                                  group=group, pb=pb, kvmax=kvmax)


def pallas_left_solve(tiles, z, kvec, nb: int, transpose: bool,
                      group: int = 8, interpret: bool = False):
    """Solve (L+I_pad) y = z (or its transpose) per tile.

    tiles [K, nb, nb], z [K, nb, nrhs], kvec [K]; K must be a multiple
    of ``group``.
    """
    k, _, nrhs = z.shape
    assert k % group == 0, "pad the batch to a multiple of group"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k // group,),
        in_specs=[
            pl.BlockSpec((group, nb, nb), lambda g, kv: (g, _i0(), _i0())),
            pl.BlockSpec((group, nb, nrhs), lambda g, kv: (g, _i0(), _i0())),
        ],
        out_specs=pl.BlockSpec((group, nb, nrhs), lambda g, kv: (g, _i0(), _i0())),
        scratch_shapes=[pltpu.VMEM((group, nb, nrhs), jnp.float32)],
    )
    fn = pl.pallas_call(
        functools.partial(_kernel, nb=nb, nrhs=nrhs, transpose=transpose,
                          group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(z.shape, z.dtype),
        interpret=interpret,
    )
    return fn(kvec.astype(jnp.int32), tiles, z)
