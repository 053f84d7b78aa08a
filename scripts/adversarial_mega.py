"""On-device adversarial megakernel streams (VERDICT round-2 item 10).

tests/test_mega_adversarial.py proves the chunk-seam / drain-boundary
semantics in interpret mode on tiny grids; this driver runs the SAME
hazard construction on real TPU hardware, where the deferred-RMW
writebacks are actual DMAs whose ordering Mosaic must get right.  A
tiny ``kmax`` forces a chunk boundary every couple of grid steps and
splits destination groups across seams — the worst case for the
kernels' drain logic (double-buffered windows + deferred dest commits,
numeric/megakernel.py / numeric/solve_mega.py).

Device constraints differ from the interpret tests: nb must be a
multiple of 128 and the group at least 8 (Mosaic sublane rule), so the
problem is a 48x48 2-D Poisson grid at nb=128 rather than the unit
tests' 12x12 at nb=8.

    python scripts/adversarial_mega.py          # exits 0 iff all pass
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


_CACHE = {}


def _problem(nb=128):
    # mode='stf': the factorization oracle runs as sequential NumPy on
    # the HOST (numeric/stf.py) — compiling the scan executor on TPU
    # just to produce a reference pool costs ~10+ min of device compile
    # for zero extra coverage.
    if nb in _CACHE:
        return _CACHE[nb]
    from spllt_tpu import Options, analyse, factor, poisson2d

    mat = poisson2d(48)
    options = Options(mode="stf", dtype="float32", refine=0,
                      ordering="amd", nb=nb, nemin=32,
                      prune_tree=False)
    symb = analyse(mat, options)
    num = factor(symb)
    _CACHE[nb] = (mat, symb, num)
    return _CACHE[nb]


def factor_adversarial(kmax, group):
    import jax.numpy as jnp

    from spllt_tpu.numeric.assemble import assemble_jax
    from spllt_tpu.numeric.megakernel import (build_mega_stream,
                                              mega_factorize)

    mat, symb, num = _problem()
    fp = num.fplan
    pool_rows = (fp.nblocks + 1) * fp.nb
    chunks = build_mega_stream(fp, group, pool_rows, kmax=kmax)
    assert len(chunks) > 3, f"kmax={kmax} did not force chunk seams"
    pool0 = assemble_jax(num.plan, num.values_perm, jnp.float32)
    poolf = mega_factorize(pool0.reshape(-1, fp.nb), chunks, fp.nb,
                           group, interpret=False)
    got = np.asarray(poolf).reshape(fp.nblocks + 1, fp.nb, fp.nb)
    ref = np.asarray(num.pool)
    return len(chunks), float(
        np.max(np.abs(got[:fp.nblocks] - ref[:fp.nblocks])))


def solve_adversarial(kmax, group):
    import spllt_tpu.numeric.solve_mega as sm
    from spllt_tpu.numeric.solve import solve_bwd_np, solve_fwd_np
    from spllt_tpu.numeric.solve_mega import MegaSolveExecutor

    mat, symb, num = _problem()
    orig = sm.chunk_solve_runs

    def tiny(runs, group_, nb_, ws, ps, kmax_=16384):
        return orig(runs, group_, nb_, ws, ps, kmax=kmax)

    sm.chunk_solve_runs = tiny
    try:
        ex = MegaSolveExecutor(symb, num.plan, nrhs=2,
                               interpret=False, group=group)
    finally:
        sm.chunk_solve_runs = orig
    assert len(ex._fwd_chunks) > 3, \
        f"kmax={kmax} did not force chunk seams"

    n = symb.n
    rng = np.random.default_rng(9)
    b = rng.standard_normal((n, 2))
    x0 = np.zeros((n + 1, 2), np.float32)
    x0[:n] = b[symb.perm]
    pool = np.asarray(num.pool)
    z = np.asarray(ex.full(pool, x0.copy()))
    zr = solve_bwd_np(np.float64(pool), num.splan,
                      solve_fwd_np(np.float64(pool), num.splan,
                                   np.float64(x0)))
    return len(ex._fwd_chunks), float(
        np.max(np.abs(z[:n] - zr[:n]) / (np.abs(zr[:n]) + 1e-3)))


def main() -> int:
    import jax

    backend = jax.default_backend()
    ok = True
    for kmax in (16, 24):
        nch, err = factor_adversarial(kmax, group=8)
        good = err < 1e-4
        ok &= good
        print(json.dumps({"check": "factor_mega_seams", "kmax": kmax,
                          "chunks": nch, "max_abs_err": err,
                          "backend": backend, "pass": good}), flush=True)
    nch, err = solve_adversarial(kmax=16, group=8)
    good = err < 1e-3
    ok &= good
    print(json.dumps({"check": "solve_mega_seams", "kmax": 16,
                      "chunks": nch, "max_rel_err": err,
                      "backend": backend, "pass": good}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
