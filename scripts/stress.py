"""Stress loop (reference scripts/stress_test.sh analogue): repeated
factorize/solve over randomized problems and option grids, asserting the
backward error every iteration.

    python scripts/stress.py [--iters 20] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mode", default="stf", choices=["stf", "batched"])
    args = ap.parse_args(argv)

    from spllt_tpu import (Options, analyse, factor, make_rhs, poisson2d,
                           poisson3d, random_spd, solve)

    rng = np.random.default_rng(args.seed)
    fails = 0
    for it in range(args.iters):
        kind = rng.integers(0, 3)
        if kind == 0:
            m = int(rng.integers(6, 20))
            a, gs = poisson2d(m), (m, m)
        elif kind == 1:
            m = int(rng.integers(4, 9))
            a, gs = poisson3d(m), (m, m, m)
        else:
            n = int(rng.integers(30, 120))
            a, gs = random_spd(n, 0.05, seed=int(rng.integers(1 << 30))), \
                None
        nb = int(rng.choice([4, 8, 16, 32]))
        nemin = int(rng.choice([1, 4, 16, 32]))
        nrhs = int(rng.choice([1, 3, 8]))
        coarse = bool(rng.integers(0, 2))
        opts = Options(
            nb=nb, nemin=nemin,
            ordering="nd-grid" if gs else "amd", grid_shape=gs,
            mode=args.mode, dtype="float64" if args.mode == "batched"
            else "float32", refine=0, prune_tree=False,
            coarse_subtrees=coarse, coarse_span=96, coarse_waste=30.0)
        try:
            num = factor(analyse(a, opts))
            xt, b = make_rhs(a, nrhs)
            x = solve(num, b)
            bwd = np.linalg.norm(a.matvec(x) - b) / np.linalg.norm(b)
            ok = bwd < 1e-10
        except Exception as e:  # noqa: BLE001
            print(f"iter {it}: EXCEPTION {type(e).__name__}: {e}")
            ok = False
            bwd = float("nan")
        status = "ok" if ok else "FAIL"
        print(f"iter {it:3d}: n={a.n:6d} nb={nb:3d} nemin={nemin:3d} "
              f"nrhs={nrhs} coarse={int(coarse)} bwd={bwd:.2e} {status}",
              flush=True)
        fails += not ok
    print(f"{args.iters - fails}/{args.iters} passed")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
