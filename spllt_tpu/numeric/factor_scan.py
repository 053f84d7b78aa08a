"""Scan-based factorization executor (bucketed level schedule).

Functionally identical to :mod:`spllt_tpu.numeric.factor` but executes the
level schedule as a handful of ``lax.scan`` loops over level buckets (see
plan/buckets.py), giving O(#buckets) XLA call sites instead of
O(#levels) — compile time becomes independent of tree depth.  This is the
production executor for TPU; the unrolled one remains for debugging.

The pool carries one extra scratch block (id = nblocks) absorbing padded
no-op tasks.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..plan.buckets import make_buckets, pad_tables
from .factor import _potrf_batch, _trsm_batch

__all__ = ["ScanFactorExecutor"]

_I32MAX = np.int64(2**31 - 1)


class ScanFactorExecutor:
    """Compiles the bucketed level schedule for one FactorPlan."""

    def __init__(self, fp, dtype=jnp.float32, matmul_precision="highest",
                 alpha: float = 1.6):
        self.fp = fp
        self.nb = fp.nb
        self.dtype = dtype
        self.precision = matmul_precision
        self.scratch = fp.nblocks           # extra block id
        counts = {
            "potrf": np.diff(fp.potrf_ptr)[:fp.nlevels + 1],
            "trsm": np.diff(fp.trsm_ptr)[:fp.nlevels + 1],
            "syrk": np.diff(fp.syrk_ptr)[:fp.nlevels + 1],
            "updbt": np.diff(fp.updbt_ptr)[:fp.nlevels + 1],
        }
        spans = make_buckets(counts, fp.nlevels, alpha=alpha)
        fields = {
            "potrf": {"blk": fp.potrf_blk, "k": fp.potrf_k},
            "trsm": {"diag": fp.trsm_diag, "dst": fp.trsm_dst,
                     "k": fp.trsm_k},
            "syrk": {"i": fp.syrk_src_i, "j": fp.syrk_src_j,
                     "dst": fp.syrk_dst},
            "updbt": {"dst": fp.updbt_dst, "mr": fp.updbt_mr,
                      "mc": fp.updbt_mc, "thr": fp.updbt_kthr,
                      "sb": fp.updbt_srcbase},
        }
        ptrs = {"potrf": fp.potrf_ptr, "trsm": fp.trsm_ptr,
                "syrk": fp.syrk_ptr, "updbt": fp.updbt_ptr}
        s = self.scratch
        pad_values = {
            "potrf": {"blk": s, "k": 0},
            "trsm": {"diag": s, "dst": s, "k": 0},
            "syrk": {"i": s, "j": s, "dst": s},
            "updbt": {"dst": s, "mr": 0, "mc": 0, "thr": _I32MAX, "sb": 0},
        }
        self.buckets = [pad_tables(sp, fields, ptrs, pad_values)
                        for sp in spans]
        self._bucket_tables = [
            {k: jnp.asarray(np.minimum(v, _I32MAX), dtype=jnp.int32)
             for k, v in b.tables.items()}
            for b in self.buckets
        ]
        self.maps = jnp.asarray(fp.maps, dtype=jnp.int32)
        blk_n_ext = np.concatenate([fp.blk_n, [fp.nb]])
        self.blk_n = jnp.asarray(blk_n_ext, dtype=jnp.int32)
        self._fn = jax.jit(self._build(), donate_argnums=(0,))

    # ------------------------------------------------------------------ #
    def _build(self):
        nb = self.nb
        prec = self.precision
        nblk1 = self.fp.nblocks + 1

        def bmm_nt(a, b):
            return jax.lax.dot_general(
                a, b, (((2,), (2,)), ((0,), (0,))),
                precision=prec, preferred_element_type=a.dtype)

        def level_body(carry, tb):
            pool, maps, blk_n = carry
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
            # ---- updbt ----
            if "updbt_dst" in tb and tb["updbt_dst"].shape[0] > 0:
                dst = tb["updbt_dst"]
                pr = maps[tb["updbt_mr"]]
                pc = maps[tb["updbt_mc"]]
                thr = tb["updbt_thr"][:, None]
                base = tb["updbt_sb"][:, None] * nb
                vr = pr >= thr
                vc = (pc >= thr) & (iota < blk_n[dst][:, None])
                poolf = pool.reshape(-1, nb)
                r = poolf[jnp.where(vr, base + pr, 0)]
                r = r * vr[..., None].astype(pool.dtype)
                c = poolf[jnp.where(vc, base + pc, 0)]
                c = c * vc[..., None].astype(pool.dtype)
                pool = pool.at[dst].add(-bmm_nt(r, c))
            # ---- syrk ----
            if "syrk_i" in tb and tb["syrk_i"].shape[0] > 0:
                u = bmm_nt(pool[tb["syrk_i"]], pool[tb["syrk_j"]])
                pool = pool.at[tb["syrk_dst"]].add(-u)
            # ---- potrf ----
            if "potrf_blk" in tb and tb["potrf_blk"].shape[0] > 0:
                blk = tb["potrf_blk"]
                out = _potrf_batch(pool[blk], tb["potrf_k"], nb)
                pool = pool.at[blk].set(out)
            # ---- trsm ----
            if "trsm_diag" in tb and tb["trsm_diag"].shape[0] > 0:
                out = _trsm_batch(pool[tb["trsm_diag"]],
                                  pool[tb["trsm_dst"]], tb["trsm_k"], nb)
                pool = pool.at[tb["trsm_dst"]].set(out)
            return (pool, maps, blk_n), None

        def run(pool_ext, maps, blk_n, bucket_tables):
            carry = (pool_ext, maps, blk_n)
            for bt in bucket_tables:
                # drop zero-width kinds for this bucket (static)
                tb = {k: v for k, v in bt.items() if v.shape[1] > 0}
                carry, _ = jax.lax.scan(
                    lambda c, t: level_body(c, t), carry, tb)
            return carry[0]

        return run

    # ------------------------------------------------------------------ #
    def __call__(self, pool):
        nb = self.nb
        pool = jnp.asarray(pool, dtype=self.dtype)
        pool_ext = jnp.concatenate(
            [pool, jnp.zeros((1, nb, nb), dtype=self.dtype)], axis=0)
        out = self._fn(pool_ext, self.maps, self.blk_n,
                       self._bucket_tables)
        return out[:-1]
