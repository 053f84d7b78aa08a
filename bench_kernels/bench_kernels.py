"""Standalone dense block-kernel benchmarks (GFLOP/s, CSV).

Analogue of the reference's ``bench_kernels/`` (dpotrf/dtrsm/dsyrk/dgemm
GFLOP/s vs MKL/MAGMA/cuSOLVER, N-sweep → CSV,
/root/reference/bench_kernels/bench_potrf/bench_MKL_potrf.cu:153-227).
Measures the four batched block kernels the factorization is built from —
potrf / trsm / syrk(gemm-NT) / gathered update — on the current JAX
backend, sweeping tile size nb and batch size B.

    python bench_kernels/bench_kernels.py [--csv out.csv]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _fetch(x):
    """Force TRUE completion: on the axon relay block_until_ready returns
    at dispatch, so fetch one element device->host (executions run in
    dispatch order, so fetching the last bounds the whole batch)."""
    while isinstance(x, (tuple, list)):
        x = x[0]
    return float(np.asarray(x)[(0,) * x.ndim])


def bench_op(fn, args):
    """Time executions chained DEVICE-SIDE in one jit via a dynamic-length
    fori_loop: each rep's float operands are perturbed by a value derived
    from the previous rep's output, which (a) serializes real executions,
    (b) defeats memoization, and (c) costs ONE dispatch + ONE fetch.  The
    kernels here are micro- to milli-second scale while an axon-relay
    dispatch+fetch costs ~100-150 ms, so even a chained call stays
    overhead-dominated; the reported time is the DIFFERENCE between a
    2*reps-chain call and a reps-chain call (same compiled program,
    dynamic trip count), which cancels the constant relay overhead."""
    import jax
    import jax.numpy as jnp

    def chained(n, *a):
        def body(_, a):
            out = fn(*a)
            first = out[0] if isinstance(out, (tuple, list)) else out
            probe = jnp.ravel(first)[0] * 1e-30
            return tuple(
                x + probe.astype(x.dtype)
                if hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.floating) else x
                for x in a)
        a = jax.lax.fori_loop(0, n, body, tuple(a))
        for x in a:
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                      jnp.floating):
                return jnp.ravel(x)[0]
        raise AssertionError("no float operand to fetch")

    def timed(n):
        t0 = time.perf_counter()
        _fetch(cf(n, *args))
        return time.perf_counter() - t0

    cf = jax.jit(chained)
    _fetch(cf(8, *args))             # compile + first exec
    # pilot: pick reps so the measured window holds ~1.5 s of real kernel
    # work (bounded), whatever the kernel's speed
    est = max((timed(8) - 0.10) / 8, 2e-5)
    reps = int(min(max(1.5 / est, 8), 2000))
    # paired samples: interleave (t2-t1) measurements so the relay
    # overhead cancels per pair, and take the MEDIAN of the paired
    # differences — differencing two independent minima biases low and
    # previously over-reported GFLOP/s (ADVICE round 3)
    diffs = sorted(timed(2 * reps) - timed(reps) for _ in range(3))
    d = diffs[len(diffs) // 2]
    if d <= 0:
        raise RuntimeError(
            f"non-positive paired timing difference {diffs}: noise "
            f"exceeds kernel cost; rerun on an idle device")
    return d / reps


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "default"])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from spllt_tpu.numeric.factor import _potrf_batch, _trsm_batch
    from spllt_tpu.numeric.pallas_potrf import pallas_potrf_batch
    from spllt_tpu.numeric.pallas_trsm import pallas_trsm_batch

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    prec = args.precision
    rng = np.random.default_rng(0)
    rows = ["kernel,nb,batch,ms,gflops,status"]
    print(f"# backend={jax.default_backend()} dtype={args.dtype} "
          f"precision={prec}", file=sys.stderr)

    def record(name, nb, B, fn, fargs, fl):
        """Bench one kernel; a compile failure (e.g. VMEM OOM at large
        nb) records an 'oom' row instead of killing the sweep, and the
        CSV is rewritten after every row so a crash loses nothing."""
        try:
            t = bench_op(fn, fargs)
            rows.append(f"{name},{nb},{B},{t*1e3:.3f},{fl/t/1e9:.1f},ok")
        except Exception as e:  # noqa: BLE001 - surface and continue
            # numeric columns stay parseable (empty ms / 0 gflops); the
            # status column carries the exception type (ADVICE round 3:
            # 'oom' mislabeled non-OOM failures and broke CSV parsing)
            rows.append(f"{name},{nb},{B},,0,{type(e).__name__}")
            print(f"# {name},{nb},{B}: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
        print(rows[-1], file=sys.stderr)
        if args.csv:
            with open(args.csv, "w") as f:
                f.write("\n".join(rows) + "\n")

    for nb in (128, 256, 512):
        for B in (8, 64, 256):
            if B * nb * nb * 4 > 2 ** 30:
                continue
            a_np = rng.standard_normal((B, nb, nb)).astype(np.float32)
            spd = a_np @ a_np.transpose(0, 2, 1) + nb * np.eye(
                nb, dtype=np.float32)
            a = jnp.asarray(a_np, dtype)
            b = jnp.asarray(
                rng.standard_normal((B, nb, nb)).astype(np.float32), dtype)
            spd_d = jnp.asarray(spd, dtype)
            k = jnp.full((B,), nb, dtype=jnp.int32)

            gemm = jax.jit(lambda x, y: jax.lax.dot_general(
                x, y, (((2,), (2,)), ((0,), (0,))), precision=prec,
                preferred_element_type=x.dtype))
            record("gemm_nt", nb, B, gemm, (a, b), 2 * B * nb ** 3)

            potrf = jax.jit(lambda x, kk: _potrf_batch(x, kk, nb))
            record("potrf", nb, B, potrf, (spd_d, k), B * nb ** 3 / 3)

            trsm = jax.jit(lambda d, x, kk: _trsm_batch(d, x, kk, nb))
            chol = jax.jit(lambda x: jax.lax.linalg.cholesky(x))(spd_d)
            record("trsm", nb, B, trsm, (chol, b, k), B * nb ** 3)

            if nb % 128 == 0 and args.dtype == "float32":
                # cap the group so the kernels' (group, nb, nb) window
                # sets stay within the ~16 MB/core VMEM budget (nb=512
                # at group=2 measured 16.04M > 16M: OOM)
                gp = max(1, min(8, B, 1024 // nb,
                                (8 * 2 ** 20) // (6 * nb * nb * 4)))
                if B % gp == 0:
                    pp = jax.jit(lambda x, kk: pallas_potrf_batch(
                        x, kk, nb, group=gp))
                    record("potrf_pallas", nb, B, pp, (spd_d, k),
                           B * nb ** 3 / 3)
                    pt = jax.jit(lambda d, x, kk: pallas_trsm_batch(
                        d, x, kk, nb, group=gp))
                    record("trsm_pallas", nb, B, pt, (chol, b, k),
                           B * nb ** 3)

    if not args.csv:
        print("\n".join(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
