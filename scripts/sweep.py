"""Benchmark sweep driver.

Analogue of the reference's sweep harnesses: ``run_tests.sh`` (matrix ×
ncpu × nb × nemin grids), ``aux/run_tests_poisson3d.sh`` and
``drivers/spllt_omp_bench.F90`` (--nb-range / --nrhs-range with geometric
or linear steps).  Emits one JSON line per configuration.

    python scripts/sweep.py --poisson3d 16,24,32 --nb 128,256 --nrhs 1,16
    python scripts/sweep.py --matrices a.mtx,b.mtx --nb-range 64:512:g2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_range(spec: str) -> list[int]:
    """'64:512:g2' geometric, '64:512:64' linear, or comma list."""
    if ":" in spec:
        lo, hi, step = spec.split(":")
        lo, hi = int(lo), int(hi)
        out = []
        if step.startswith("g"):
            f = int(step[1:])
            v = lo
            while v <= hi:
                out.append(v)
                v *= f
        else:
            out = list(range(lo, hi + 1, int(step)))
        return out
    return [int(x) for x in spec.split(",")]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--poisson3d", help="comma list of grid edges")
    src.add_argument("--poisson2d", help="comma list of grid edges")
    src.add_argument("--matrices", help="comma list of matrix files")
    ap.add_argument("--nb", "--nb-range", dest="nb", default="128")
    ap.add_argument("--nemin", default="64")
    ap.add_argument("--nrhs", "--nrhs-range", dest="nrhs", default="1")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    from spllt_tpu import Options, analyse, factor, make_rhs, solve
    from spllt_tpu.sparse.generators import poisson2d, poisson3d
    from spllt_tpu.sparse.io import read_matrix
    from spllt_tpu.utils.jaxconfig import enable_compilation_cache

    enable_compilation_cache()

    problems = []
    if args.poisson3d:
        for m in parse_range(args.poisson3d):
            problems.append((f"poisson3d-{m}", poisson3d(m), (m,) * 3))
    elif args.poisson2d:
        for m in parse_range(args.poisson2d):
            problems.append((f"poisson2d-{m}", poisson2d(m), (m,) * 2))
    else:
        for path in args.matrices.split(","):
            problems.append((path, read_matrix(path), None))

    for name, a, gs in problems:
        for nb in parse_range(args.nb):
            for nemin in parse_range(args.nemin):
                opts = Options(
                    nb=nb, nemin=nemin,
                    ordering="nd-grid" if gs else "amd", grid_shape=gs,
                    dtype=args.dtype, precision=args.precision,
                    prune_tree=False)
                t0 = time.perf_counter()
                symb = analyse(a, opts)
                t_an = time.perf_counter() - t0
                tf = []
                num = None
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    num = factor(symb)
                    tf.append(time.perf_counter() - t0)
                for nrhs in parse_range(args.nrhs):
                    xt, b = make_rhs(a, nrhs)
                    ts = []
                    x = None
                    for _ in range(args.reps):
                        t0 = time.perf_counter()
                        x = solve(num, b)
                        ts.append(time.perf_counter() - t0)
                    bwd = float(np.linalg.norm(a.matvec(x) - b)
                                / np.linalg.norm(b))
                    print(json.dumps({
                        "matrix": name, "n": symb.n, "nb": nb,
                        "nemin": nemin, "nrhs": nrhs,
                        "nnz_L": symb.inform.num_factor,
                        "flops": symb.inform.num_flops,
                        "t_analyse": round(t_an, 4),
                        "t_factor": round(min(tf), 5),
                        "gflops": round(symb.inform.num_flops
                                        / min(tf) / 1e9, 1),
                        "t_solve": round(min(ts), 5),
                        "bwd_err": bwd,
                    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
