"""Factor-phase time split via phase skipping.

Times the scan executor with each phase (pallas-updbt / xla-updbt / syrk /
potrf / trsm) dropped in turn; the delta against the full run attributes
wall time per phase.  Timing is honest on the axon relay: reps chain
device-side through a carry scalar (data-dependent on the factored pool)
and ONE final fetch bounds the chain — a per-rep fetch costs ~60 ms of
relay latency.

    python scripts/profile_factor.py [--m 32] [--nb 128] [--nemin 128]
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
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--nb", type=int, default=128)
    ap.add_argument("--nemin", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--pallas", default="auto")
    ap.add_argument("--group", type=int, default=None)
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--full-only", action="store_true")
    ap.add_argument("--mega", action="store_true")
    ap.add_argument("--ablate", default="",
                    help="comma list of megakernel ablations "
                         "(dma,gather,main,rmw,potrf,trsm) — single "
                         "config, wrong results, timing only")
    ap.add_argument("--ablate-sweep", action="store_true",
                    help="mega cost attribution: time each ablation")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from spllt_tpu import Options, analyse, poisson3d
    from spllt_tpu.api import _plans
    from spllt_tpu.numeric.assemble import assemble_jax
    from spllt_tpu.numeric.factor_scan import ScanFactorExecutor
    from spllt_tpu.utils.jaxconfig import enable_compilation_cache

    enable_compilation_cache()
    m = args.m
    a = poisson3d(m)
    opts = Options(ordering="nd-grid", grid_shape=(m,) * 3, nb=args.nb,
                   nemin=args.nemin, mode="batched", dtype="float32",
                   refine=2, precision=args.precision, prune_tree=False)
    symb = analyse(a, opts)
    plan, fplan, _ = _plans(symb, opts)
    print(f"# n={symb.n} nnzL={symb.inform.num_factor} "
          f"flops={symb.inform.num_flops:.3e} levels={fplan.nlevels} "
          f"tasks={fplan.num_tasks}", file=sys.stderr)
    values = jnp.asarray(symb.a_perm.values)

    def timed(skip, ablate=frozenset()):
        if args.mega:
            from spllt_tpu.numeric.megakernel import MegaFactorExecutor

            ex = MegaFactorExecutor(fplan, dtype=jnp.float32,
                                    matmul_precision=args.precision,
                                    group=args.group, ablate=ablate)
            nsteps = sum(len(c["kind"]) for c in ex.chunks)
            print(f"# mega: chunks={len(ex.chunks)} steps={nsteps}",
                  file=sys.stderr)

            @jax.jit
            def chain_impl(v, s, chunks):
                pool = assemble_jax(plan, v * (1.0 + 1e-7 * s),
                                    jnp.float32)
                pool, notpos = ex._run(pool, chunks)
                return (s + 1.0 + notpos.astype(jnp.float32)
                        + pool[0, 0, 0] * jnp.float32(1e-30))

            def chain_step(v, s):
                return chain_impl(v, s, ex.chunks_dev)
        else:
            ex = ScanFactorExecutor(fplan, dtype=jnp.float32,
                                    matmul_precision=args.precision,
                                    pallas_updates=args.pallas,
                                    upd_group=args.group,
                                    _skip=frozenset(skip))

            @jax.jit
            def chain_step(v, s):
                pool = assemble_jax(plan, v * (1.0 + 1e-7 * s),
                                    jnp.float32)
                pool, notpos = ex._fn(pool, ex.maps, ex.blk_n, ex.srcvec,
                                      ex._bucket_tables)
                return (s + 1.0 + notpos.astype(jnp.float32)
                        + pool[0, 0, 0] * jnp.float32(1e-30))

        s = chain_step(values, jnp.float32(0.0))
        float(s)  # compile + first exec
        t0 = time.perf_counter()
        for _ in range(args.reps):
            s = chain_step(values, s)
        float(s)
        return (time.perf_counter() - t0) / args.reps

    base_abl = frozenset(x for x in args.ablate.split(",") if x)
    t_full = timed((), base_abl)
    print(f"full: {t_full*1e3:8.1f} ms "
          f"({symb.inform.num_flops/t_full/1e9:.1f} GFLOP/s)"
          + (f"  [ablate={sorted(base_abl)}]" if base_abl else ""))
    if args.ablate_sweep:
        # cumulative: each row removes one more cost component; the
        # deltas attribute per-step time (results are WRONG on purpose)
        cum = set()
        for abl in ("main", "gather", "rmw", "dma"):
            cum.add(abl)
            t = timed((), frozenset(cum))
            print(f"-{'-'.join(sorted(cum)):28s}: {t*1e3:8.1f} ms",
                  flush=True)
        return 0
    if args.full_only:
        return 0
    for ph in ("pallas", "updbt", "syrk", "potrf", "trsm"):
        t = timed((ph,))
        print(f"w/o {ph:7s}: {t*1e3:8.1f} ms   -> {ph} ~ "
              f"{(t_full-t)*1e3:7.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
