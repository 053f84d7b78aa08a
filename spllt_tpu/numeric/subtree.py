"""Batched dense subtree factorization (coarse-leaf phase).

Executes the plan's dense phase (plan/factor_tasks._build_dense_phase):
per spad bucket, assemble the fronts from the user values, run ONE batched
partial Cholesky (`_potrf_batch` — chol of the leading |V| columns plus
the boundary-row solve), and scatter the factored columns back into the
block pool.  Replaces the reference's per-subtree sequential
``spllt_subtree_factorize`` tasks (SURVEY §2.5) with a single MXU op per
size bucket.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla

import jax
import jax.numpy as jnp

from ..errors import NotPositiveDefiniteError
from .factor import _potrf_batch_blocked
from .factor_scan import _on_cpu
from .pallas_potrf import pallas_potrf_batch

__all__ = ["subtree_np", "DenseSubtreeExecutor"]


# ===================================================================== #
# NumPy oracle
# ===================================================================== #
def subtree_np(pool: np.ndarray, values: np.ndarray, fp) -> np.ndarray:
    nb = fp.nb
    for b in fp.dense or []:
        sp = b["spad"]
        ns = b["nsub"]
        f = np.zeros((ns, sp, sp))
        np.add.at(f, (b["asm_sub"], b["asm_r"], b["asm_c"]),
                  values[b["asm_vidx"]])
        for i in range(ns):
            k = int(b["kvec"][i])
            d = f[i][:k, :k]
            d = np.tril(d) + np.tril(d, -1).T
            try:
                ld = np.linalg.cholesky(d)
            except np.linalg.LinAlgError as e:
                raise NotPositiveDefiniteError(
                    f"dense front {i} not positive definite") from e
            below = f[i][k:, :k]
            out = np.zeros((sp, sp))
            out[:k, :k] = ld
            out[k:, :k] = sla.solve_triangular(ld, below.T, lower=True).T
            f[i] = out
        for j in range(len(b["sc_blk"])):
            rp, rv = b["sc_rpos"][j], b["sc_rval"][j]
            cp, cv = b["sc_cpos"][j], b["sc_cval"][j]
            tile = np.zeros((nb, nb))
            tile[np.ix_(rv, cv)] = f[b["sc_sub"][j]][rp[rv]][:, cp[cv]]
            pool[b["sc_blk"][j]] = tile
    return pool


# ===================================================================== #
# JAX batched executor
# ===================================================================== #
class DenseSubtreeExecutor:
    def __init__(self, fp, dtype=jnp.float32):
        self.fp = fp
        self.nb = fp.nb
        self.dtype = dtype
        i32 = lambda x: jnp.asarray(x, dtype=jnp.int32)
        self._tabs = []
        for b in fp.dense or []:
            # gather-based assembly: front slot -> value index (or nval =
            # zero pad).  TPU scatters are element-serialized; the
            # equivalent gather streams at full bandwidth.
            ns, sp = int(b["nsub"]), int(b["spad"])
            self._interpret = _on_cpu()
            # route EVERY bucket through the pallas potrf body on TPU by
            # padding fronts up to the 128-lane multiple (the round-3
            # XLA batched-cholesky fallback was the compile-time sink
            # that kept coarsening off in production; padded rows/cols
            # are zero with a unit diagonal supplied by kvec masking)
            if (np.dtype(dtype) == np.float32 and not self._interpret
                    and sp % 128 != 0):
                sp = -(-sp // 128) * 128
            use_pallas = (np.dtype(dtype) == np.float32
                          and (sp % 128 == 0 or self._interpret))
            group = (max(1, min(ns, (8 * 128 * 128) // (sp * sp)))
                     if use_pallas else 0)
            if group and ns % group:
                ns = ns + (group - ns % group)   # pad fronts (kvec=0)
            idx = np.full((ns, sp, sp), -1, dtype=np.int64)
            idx[b["asm_sub"], b["asm_r"], b["asm_c"]] = b["asm_vidx"]
            kvec = np.zeros(ns, dtype=np.int64)
            kvec[:int(b["nsub"])] = b["kvec"]
            b = dict(b, kvec=kvec)
            self._tabs.append(dict(
                spad=sp, nsub=ns, group=group,
                kvec=i32(b["kvec"]),
                asm_idx=i32(np.where(idx < 0, 2**31 - 1, idx)),
                sc_blk=i32(b["sc_blk"]), sc_sub=i32(b["sc_sub"]),
                sc_rpos=i32(b["sc_rpos"]),
                sc_rval=jnp.asarray(b["sc_rval"]),
                sc_cpos=i32(b["sc_cpos"]),
                sc_cval=jnp.asarray(b["sc_cval"]),
            ))
        self._fn = jax.jit(self._build(), donate_argnums=(0,))

    def _build(self):
        nb = self.nb
        metas = [(t["spad"], t["nsub"], t["group"]) for t in self._tabs]

        def run(pool, values, tabs):
            vext = jnp.concatenate(
                [values, jnp.zeros((1,), dtype=values.dtype)])
            nval = values.shape[0]
            for (sp, ns, grp), t in zip(metas, tabs):
                f = vext[jnp.minimum(t["asm_idx"], nval)]
                if grp:
                    f = pallas_potrf_batch(f, t["kvec"], sp, group=grp,
                                           interpret=self._interpret)
                else:
                    f = _potrf_batch_blocked(f, t["kvec"], sp)
                rp = jnp.where(t["sc_rval"], t["sc_rpos"], 0)
                cp = jnp.where(t["sc_cval"], t["sc_cpos"], 0)
                vals = f[t["sc_sub"][:, None, None],
                         rp[:, :, None], cp[:, None, :]]
                mask = (t["sc_rval"][:, :, None]
                        & t["sc_cval"][:, None, :]).astype(pool.dtype)
                pool = pool.at[t["sc_blk"]].set(vals * mask)
            return pool

        return run

    def __call__(self, pool, values):
        if not self._tabs:
            return pool
        return self._fn(jnp.asarray(pool, self.dtype),
                        jnp.asarray(values, self.dtype), self._tabs)
