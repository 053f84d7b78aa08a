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
from .factor import _potrf_batch_blocked, _trsm_batch
from .pallas_potrf import pallas_potrf_batch
from .pallas_trsm import pallas_trsm_batch
from .pallas_update import build_micro_tasks, pallas_apply_updates

__all__ = ["ScanFactorExecutor"]

_I32MAX = np.int64(2**31 - 1)


def _on_cpu() -> bool:
    """True when computation will run on the CPU backend (tests force
    jax_default_device to a CPU device; axon keeps the TPU backend
    registered, so default_backend alone is not reliable)."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", "") == "cpu"
    return jax.default_backend() == "cpu"


class ScanFactorExecutor:
    """Compiles the bucketed level schedule for one FactorPlan.

    ``pallas_updates``: 'off' | 'auto' | 'on' — route the between-update
    (updbt) tasks of suitable buckets through the fused Pallas
    gather-GEMM-accumulate kernel (numeric/pallas_update.py) instead of
    the XLA gather → dot_general → scatter-add chain.  'auto' enables the
    kernel for buckets that are wide enough for the per-task grid-step
    cost to win and whose padding stays bounded.  ``hmax`` is accepted
    for API compatibility and ignored: the kernel's gather windows are
    nb rows (per-tile position ranges are contiguous), so every task
    fits and nothing spills to XLA.
    """

    def __init__(self, fp, dtype=jnp.float32, matmul_precision="highest",
                 alpha: float = 1.6, pallas_updates: str = "auto",
                 hmax: int = 2048, upd_group: int | None = None,
                 _skip: frozenset = frozenset()):
        self._skip = _skip      # phase names to drop (timing diagnostics)
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
                      "mc": fp.updbt_mc, "svp": fp.updbt_svp,
                      "c": fp.updbt_c},
        }
        ptrs = {"potrf": fp.potrf_ptr, "trsm": fp.trsm_ptr,
                "syrk": fp.syrk_ptr, "updbt": fp.updbt_ptr}
        s = self.scratch
        pad_values = {
            "potrf": {"blk": s, "k": 0},
            "trsm": {"diag": s, "dst": s, "k": 0},
            "syrk": {"i": s, "j": s, "dst": s},
            "updbt": {"dst": s, "mr": 0, "mc": 0, "svp": 0, "c": 0},
        }
        self.buckets = [pad_tables(sp, fields, ptrs, pad_values)
                        for sp in spans]

        # ---- pallas fused-update routing (per-bucket static choice) ---- #
        self.pool_rows = (fp.nblocks + 1) * fp.nb
        if np.dtype(dtype) != np.float32 \
                or matmul_precision not in ("highest", "high"):
            pallas_updates = "off"   # kernels are f32 only; 'default'
            # (single bf16 pass) is too lossy for the one-hot gathers
        # MXU pass count inside the pallas kernels: 'high' = bf16x3
        # (~f32 accuracy, half the passes of 'highest') pairs with
        # iterative refinement for the mixed-precision factorization
        self._prec_enum = (jax.lax.Precision.HIGHEST
                           if matmul_precision == "highest"
                           else jax.lax.Precision.HIGH)
        self._interpret = _on_cpu()
        if not self._interpret and fp.nb % 128 != 0:
            # Mosaic lane tiling: the (1, nb) map-row DMA slices must be
            # 128-aligned on real TPUs; sub-MXU tiles keep the XLA path
            # (interpret mode on CPU accepts any nb, used by tests)
            pallas_updates = "off"
        self.pallas_mode = pallas_updates
        # micro-tasks per grid step (amortizes the per-step sequencing
        # floor); interpret mode unrolls the group per call — keep small
        if upd_group is None:
            upd_group = 2 if self._interpret else 8
        self._upd_group = upd_group
        nmaps = fp.maps.shape[0]
        maps_ext = np.concatenate(
            [fp.maps, np.full((1, fp.nb), -1, fp.maps.dtype)], axis=0)
        if pallas_updates != "off":
            self._route_updates_to_pallas(spans, nmaps)
        # pallas batched potrf (XLA cholesky's serialized lowering costs
        # ~1.6 ms per call site; the pallas panel kernel ~0.4 ms)
        self._pallas_potrf = pallas_updates != "off"
        self._potrf_group = max(1, (8 * 128 * 128) // (fp.nb * fp.nb))
        self._trsm_group = max(1, (4 * 128 * 128) // (fp.nb * fp.nb))
        if self._pallas_potrf:
            for b in self.buckets:
                for g, names in (
                        (self._potrf_group,
                         (("potrf_blk", self.scratch), ("potrf_k", 0))),
                        (self._trsm_group,
                         (("trsm_diag", self.scratch),
                          ("trsm_dst", self.scratch), ("trsm_k", 0)))):
                    tbl = b.tables.get(names[0][0])
                    if tbl is None or tbl.shape[1] == 0:
                        continue
                    k = tbl.shape[1]
                    kp = -(-k // g) * g
                    if kp != k:
                        nlev = tbl.shape[0]
                        for nm, pv in names:
                            ext = np.full((nlev, kp - k), pv, np.int64)
                            b.tables[nm] = np.concatenate(
                                [b.tables[nm], ext], axis=1)
        self._bucket_tables = [
            {k: jnp.asarray(np.minimum(v, _I32MAX), dtype=jnp.int32)
             for k, v in b.tables.items()}
            for b in self.buckets
        ]
        self.maps = jnp.asarray(maps_ext, dtype=jnp.int32)
        blk_n_ext = np.concatenate([fp.blk_n, [fp.nb]])
        self.blk_n = jnp.asarray(blk_n_ext, dtype=jnp.int32)
        self.srcvec = jnp.asarray(fp.srcvec, dtype=jnp.int32)
        # static per-bucket max source width for the fused updbt kernel
        self._bucket_cmax = [
            int(b.tables["updbt_c"].max()) if "updbt_c" in b.tables
            and b.tables["updbt_c"].size else 0
            for b in self.buckets
        ]
        self._fn = jax.jit(self._build(), donate_argnums=(0,))

    # ------------------------------------------------------------------ #
    def _route_updates_to_pallas(self, spans, nmaps: int) -> None:
        """For each bucket, expand updbt tasks into destination-sorted
        micro-tasks for the fused Pallas kernel.  Every task fits the
        kernel's nb-row gather windows, so a routed bucket's XLA updbt
        tables shrink to zero width.  A bucket keeps the XLA path only
        when it is too narrow for the per-grid-step cost to win (padding
        to the bucket width blows up)."""
        fp = self.fp
        g = self._upd_group
        for bi, (b, (s_, e_, _w)) in enumerate(zip(self.buckets, spans)):
            nlev = e_ - s_ + 1
            per_level = [build_micro_tasks(fp, lvl, lvl, self.nb,
                                           self.pool_rows)
                         for lvl in range(s_, e_ + 1)]
            kpu = max((len(mt["dst"]) for mt in per_level), default=0)
            real = sum(len(mt["dst"]) for mt in per_level)
            if real == 0:
                continue
            kpu = -(-kpu // g) * g      # pad to the grid-step group size
            # cost model (measured on v5e): a padded pallas sub-task costs
            # ~0.5 us (grid step ~3 us covers `group` tasks); the XLA
            # row-granular gather/GEMM/scatter path ~25 us/task.  Route
            # unless padding loses.
            if self.pallas_mode == "auto" and kpu * nlev * 0.5 > real * 25:
                continue
            padv = {"dst": self.scratch, "lor": 0, "loc": 0, "blkn": 0}
            for name in padv:
                buf = np.full((nlev, kpu), padv[name], np.int32)
                for li, mt in enumerate(per_level):
                    kk = len(mt["dst"])
                    if kk:
                        buf[li, :kk] = mt[name]
                b.tables[f"pu_{name}"] = buf
            for name in ("relr", "relc"):
                buf = np.full((nlev, kpu, self.nb), -1, np.int32)
                for li, mt in enumerate(per_level):
                    kk = len(mt["dst"])
                    if kk:
                        buf[li, :kk] = mt[name]
                b.tables[f"pu_{name}"] = buf
            # the XLA updbt tables of a routed bucket are empty
            for nm in ("updbt_dst", "updbt_mr", "updbt_mc",
                       "updbt_svp", "updbt_c"):
                b.tables[nm] = np.empty((nlev, 0), np.int64)

    # ------------------------------------------------------------------ #
    def _build(self):
        nb = self.nb
        prec = self.precision
        nblk1 = self.fp.nblocks + 1
        interp = self._interpret

        def bmm_nt(a, b):
            return jax.lax.dot_general(
                a, b, (((2,), (2,)), ((0,), (0,))),
                precision=prec, preferred_element_type=a.dtype)

        def level_body(carry, tb, cmax):
            pool, maps, blk_n, srcvec = carry
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
            # ---- updbt (pallas fused gather-GEMM-accumulate) ----
            if "pu_dst" in tb and "pallas" not in self._skip:
                # chunk: the 4 scalar-prefetch arrays live in SMEM (1 MB);
                # destination groups split across chunks still RMW
                # correctly (partial sums commute)
                kmax = 16384
                kk = tb["pu_dst"].shape[0]
                poolf = pool.reshape(-1, nb)
                for c0 in range(0, kk, kmax):
                    c1 = min(kk, c0 + kmax)
                    pt = {nm: tb[f"pu_{nm}"][c0:c1]
                          for nm in ("dst", "lor", "loc", "blkn",
                                     "relr", "relc")}
                    poolf = pallas_apply_updates(
                        poolf, pt, nb=nb, group=self._upd_group,
                        interpret=interp, precision=self._prec_enum)
                pool = poolf.reshape(pool.shape)
            # ---- updbt (width-fused) ----
            if "updbt_dst" in tb and tb["updbt_dst"].shape[0] > 0 \
                    and cmax > 0 and "updbt" not in self._skip:
                dst = tb["updbt_dst"]
                pr = maps[tb["updbt_mr"]]
                pc = maps[tb["updbt_mc"]]
                svp = tb["updbt_svp"]
                cv = tb["updbt_c"]
                iot_c = jax.lax.broadcasted_iota(jnp.int32, (1, cmax), 1)
                svi = jnp.minimum(svp[:, None] + iot_c,
                                  srcvec.shape[0] - 1)
                sv = srcvec[svi]                      # [K, cmax]
                kbm = iot_c < cv[:, None]
                vr = pr >= 0
                vc = (pc >= 0) & (iota < blk_n[dst][:, None])
                poolf = pool.reshape(-1, nb)

                def gathw(p, v):
                    val = v[:, :, None] & kbm[:, None, :]
                    fr = jnp.where(val,
                                   sv[:, None, :] * nb + p[:, :, None], 0)
                    g = poolf[fr] * val[..., None].astype(pool.dtype)
                    return g.reshape(g.shape[0], nb, cmax * nb)

                pool = pool.at[dst].add(
                    -bmm_nt(gathw(pr, vr), gathw(pc, vc)))
            # ---- syrk ----
            if "syrk_i" in tb and tb["syrk_i"].shape[0] > 0 \
                    and "syrk" not in self._skip:
                u = bmm_nt(pool[tb["syrk_i"]], pool[tb["syrk_j"]])
                pool = pool.at[tb["syrk_dst"]].add(-u)
            # ---- potrf ----
            if "potrf_blk" in tb and tb["potrf_blk"].shape[0] > 0 \
                    and "potrf" not in self._skip:
                blk = tb["potrf_blk"]
                if self._pallas_potrf:
                    out = pallas_potrf_batch(pool[blk], tb["potrf_k"], nb,
                                             group=self._potrf_group,
                                             interpret=interp,
                                             precision=self._prec_enum)
                else:
                    out = _potrf_batch_blocked(pool[blk], tb["potrf_k"],
                                               nb, precision=prec)
                pool = pool.at[blk].set(out)
            # ---- trsm ----
            if "trsm_diag" in tb and tb["trsm_diag"].shape[0] > 0 \
                    and "trsm" not in self._skip:
                if self._pallas_potrf:
                    out = pallas_trsm_batch(
                        pool[tb["trsm_diag"]], pool[tb["trsm_dst"]],
                        tb["trsm_k"], nb, group=self._trsm_group,
                        interpret=interp, precision=self._prec_enum)
                else:
                    out = _trsm_batch(pool[tb["trsm_diag"]],
                                      pool[tb["trsm_dst"]],
                                      tb["trsm_k"], nb)
                pool = pool.at[tb["trsm_dst"]].set(out)
            return (pool, maps, blk_n, srcvec), None

        def run(pool_ext, maps, blk_n, srcvec, bucket_tables):
            carry = (pool_ext, maps, blk_n, srcvec)
            for bi, bt in enumerate(bucket_tables):
                # drop zero-width kinds for this bucket (static)
                tb = {k: v for k, v in bt.items() if v.shape[1] > 0}
                if not tb:
                    continue  # bucket fully absorbed (e.g. by coarse phase)
                cmax = self._bucket_cmax[bi]
                carry, _ = jax.lax.scan(
                    lambda c, t, _cm=cmax: level_body(c, t, _cm),
                    carry, tb)
            pool = carry[0]
            # in-graph positive-definiteness flag (NaNs appear on failure);
            # an eager post-hoc check on the big pool is host-round-trip
            # heavy, so compute the tiny flag here
            notpos = jnp.isnan(jnp.sum(pool[:, 0, 0]))
            return pool, notpos

        return run

    # ------------------------------------------------------------------ #
    def __call__(self, pool):
        """pool: [nblocks+1, nb, nb] with trailing scratch block (see
        assemble_*); factored in place, scratch kept zero.  Returns
        (pool, not_posdef_flag)."""
        pool = jnp.asarray(pool, dtype=self.dtype)
        assert pool.shape[0] == self.fp.nblocks + 1, \
            "pool must include the trailing scratch block"
        return self._fn(pool, self.maps, self.blk_n, self.srcvec,
                        self._bucket_tables)
