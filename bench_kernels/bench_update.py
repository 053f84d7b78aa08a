"""Pallas fused update kernel vs the XLA gather/GEMM/scatter path.

Honest timing (chained executions + forced fetch; see memory notes on the
axon relay).  Synthetic workload shaped like a real wide factorization
level: K update micro-tasks, nb tile, per-task nb-row gather windows.

    python bench_kernels/bench_update.py [--k 2000] [--nb 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=2000)
    ap.add_argument("--nb", type=int, default=128)
    ap.add_argument("--nblk", type=int, default=4000)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--precision", default="highest")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from spllt_tpu.numeric.pallas_update import pallas_apply_updates

    k = -(-args.k // args.group) * args.group
    nb, nblk = args.nb, args.nblk
    rows = nblk * nb
    rng = np.random.default_rng(0)
    poolf = rng.standard_normal((rows, nb)).astype(np.float32) * 0.01
    nmaps = 400
    maps = np.full((nmaps, nb), -1, dtype=np.int32)
    for m in range(nmaps):
        cnt = rng.integers(nb // 2, nb + 1)
        maps[m, :cnt] = np.sort(rng.choice(nb, size=cnt, replace=False))
    maps = maps.astype(np.int32)
    dst = np.sort(rng.choice(nblk - 1, size=k, replace=True)).astype(
        np.int32)
    mr = rng.integers(0, nmaps, size=k).astype(np.int32)
    mc = rng.integers(0, nmaps, size=k).astype(np.int32)
    tasks = {
        "dst": dst,
        "lor": rng.integers(0, rows - nb, size=k).astype(np.int32),
        "loc": rng.integers(0, rows - nb, size=k).astype(np.int32),
        "blkn": np.full(k, nb, dtype=np.int32),
        "relr": maps[mr],
        "relc": maps[mc],
    }
    jmaps = jnp.asarray(maps)
    jt = {"mr": jnp.asarray(mr), "mc": jnp.asarray(mc),
          "lor": jnp.asarray(tasks["lor"]), "loc": jnp.asarray(tasks["loc"]),
          "dst": jnp.asarray(dst)}
    jt_np = tasks

    # ---------------- pallas path ---------------------------------------- #
    def pal(pf):
        return pallas_apply_updates(pf, jt_np, nb=nb, group=args.group,
                                    precision=args.precision)

    pal_j = jax.jit(pal, donate_argnums=(0,))

    # ---------------- XLA path (mirrors the executor's level body) ------- #
    def xla(pf):
        pr = jmaps[jt["mr"]]
        pc = jmaps[jt["mc"]]
        vr = pr >= 0
        vc = pc >= 0
        r = pf[jnp.where(vr, jt["lor"][:, None] + pr, 0)]
        r = r * vr[..., None].astype(pf.dtype)
        c = pf[jnp.where(vc, jt["loc"][:, None] + pc, 0)]
        c = c * vc[..., None].astype(pf.dtype)
        u = jax.lax.dot_general(r, c, (((2,), (2,)), ((0,), (0,))),
                                precision="highest",
                                preferred_element_type=pf.dtype)
        pool = pf.reshape(nblk, nb, nb)
        pool = pool.at[jt["dst"]].add(-u)
        return pool.reshape(rows, nb)

    xla_j = jax.jit(xla, donate_argnums=(0,))

    for name, fn in (("xla", xla_j), ("pallas", pal_j)):
        pf = jnp.asarray(poolf)
        pf = fn(pf)
        float(np.asarray(pf[0, 0]))   # compile + first real exec
        t0 = time.perf_counter()
        for _ in range(args.reps):
            pf = fn(pf)
        float(np.asarray(pf[0, 0]))
        per = (time.perf_counter() - t0) / args.reps
        print(f"{name:7s}: {per*1e3:8.2f} ms/apply   "
              f"{per/k*1e6:6.2f} us/task   "
              f"{2*k*nb*nb*nb/per/1e9:8.1f} GF/s   "
              f"(K={k}, nb={nb})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
