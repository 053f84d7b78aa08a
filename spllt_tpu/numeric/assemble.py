"""Pool assembly: scatter user values into the block pool.

Analogue of ``spllt_init_node`` (zero + scatter ``val`` via the lmap,
/root/reference/src/spllt_kernels_mod.F90:2301-2364) — here a single
scatter-add over the flat pool, executed once per factorization.
"""

from __future__ import annotations

import numpy as np

__all__ = ["assemble_np", "assemble_jax"]


def assemble_np(plan, values: np.ndarray, dtype=np.float64) -> np.ndarray:
    """NumPy pool assembly → pool[nblocks+1, nb, nb].

    The pool carries one extra scratch block (id = nblocks) that absorbs
    padded no-op tasks of the bucketed executors; it stays zero."""
    nb = plan.nb
    poolf = np.zeros(((plan.nblocks + 1) * nb, nb), dtype=dtype)
    np.add.at(poolf, (plan.asm_rowflat, plan.asm_col),
              values.astype(dtype))
    return poolf.reshape(plan.nblocks + 1, nb, nb)


def assemble_jax(plan, values, dtype):
    """JAX pool assembly (device scatter-add) → pool[nblocks+1, nb, nb]."""
    import jax.numpy as jnp

    nb = plan.nb
    poolf = jnp.zeros(((plan.nblocks + 1) * nb, nb), dtype=dtype)
    poolf = poolf.at[plan.asm_rowflat, plan.asm_col].add(
        jnp.asarray(values, dtype=dtype))
    return poolf.reshape(plan.nblocks + 1, nb, nb)
