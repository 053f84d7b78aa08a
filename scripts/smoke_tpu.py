#!/usr/bin/env python
"""TPU smoke lane: compile + run the PRODUCTION kernels on the real chip.

The CPU test suite runs every pallas kernel in interpret mode, so Mosaic
lowering/legalization errors (e.g. i64 indices under jax x64 mode) are
structurally invisible to it — exactly the class of bug that cost round 3
its benchmark (VERDICT round 3, weak #1/#2).  This script drives a tiny
nb=128 problem through

  (a) the factor megakernel,
  (b) the solve megakernel fwd/bwd/full,
  (c) the refined device solve (which flips on jax_enable_x64),

in a subprocess per x64 mode (the x64 flag must be set before kernels
trace), asserting backward error each time.  Run before every snapshot:

    python scripts/smoke_tpu.py            # both x64 modes, ~2-4 min
    python scripts/smoke_tpu.py --x64 0    # single mode (in-process)

Reference bar: the registered test covers the shipping runtime
(/root/reference/CMakeLists.txt:769-771, test/test_solve_phasis.F90).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(x64: bool) -> None:
    import numpy as np

    import jax

    from spllt_tpu.utils.jaxconfig import enable_compilation_cache

    enable_compilation_cache()
    if x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from spllt_tpu import Options, analyse, factor, make_rhs, poisson3d, solve
    from spllt_tpu.numeric.solve_mega import MegaSolveExecutor

    assert jax.default_backend() != "cpu", \
        "smoke_tpu must run on an accelerator backend"

    m = 8
    a = poisson3d(m)
    opts = Options(ordering="nd-grid", grid_shape=(m, m, m), nb=128,
                   nemin=64, mode="batched", dtype="float32",
                   schedule="mega", refine=2, refine_device=True)
    symb = analyse(a, opts)

    # (a) factor megakernel (api route asserts positive-definiteness)
    num = factor(symb)
    print(f"[x64={int(x64)}] factor mega: ok (n={symb.n}, "
          f"levels={num.fplan.nlevels})")

    xt, b = make_rhs(a, nrhs=2)

    # (b) solve megakernel fwd / bwd / full, unrefined f32
    sex = MegaSolveExecutor(symb, num.plan, nrhs=2)
    xp = np.zeros((symb.n + 1, 2), np.float32)
    xp[:symb.n] = b[symb.perm]
    y = sex.fwd(num.pool, xp)
    x_p = np.asarray(sex.bwd(num.pool, y))[:symb.n]
    x = np.empty_like(x_p)
    x[symb.perm] = x_p
    bwd_raw = float(np.linalg.norm(a.matvec(x.astype(np.float64)) - b)
                    / np.linalg.norm(b))
    assert bwd_raw < 1e-4, f"fwd+bwd mega bwd_err {bwd_raw}"
    x_full_p = np.asarray(sex.full(num.pool, xp))[:symb.n]
    np.testing.assert_allclose(x_full_p, x_p, rtol=1e-5, atol=1e-5)
    print(f"[x64={int(x64)}] solve mega fwd/bwd/full: bwd_err {bwd_raw:.2e}")

    # (c) refined device solve — the production default path
    #     (flips jax_enable_x64 on via ensure_x64)
    x_ref = solve(num, b)
    bwd_ref = float(np.linalg.norm(a.matvec(x_ref) - b) / np.linalg.norm(b))
    assert bwd_ref < 1e-12, f"refined solve bwd_err {bwd_ref}"
    print(f"[x64={int(x64)}] refined device solve: bwd_err {bwd_ref:.2e}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--x64", type=int, choices=(0, 1), default=None,
                    help="run one mode in-process (default: both, "
                         "subprocess each)")
    args = ap.parse_args()
    if args.x64 is not None:
        run_mode(bool(args.x64))
        return 0
    for mode in (0, 1):
        r = subprocess.run([sys.executable, __file__, "--x64", str(mode)])
        if r.returncode != 0:
            print(f"SMOKE FAILED at x64={mode}", file=sys.stderr)
            return 1
    print("SMOKE OK (both x64 modes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
