"""Multi-device forest-parallel factorization (shard_map + collectives).

TPU-native replacement for the reference's distributed-memory path.  SpLLT
distributes blocks over MPI ranks via PaRSEC's ``blk_rank_of`` map and lets
the dataflow runtime generate point-to-point block transfers
(/root/reference/src/PaRSEC/spllt_parsec_blk_data.c:33-64, factorize.jdf).
Here the elimination forest itself is partitioned: the flop-balanced L0
layer from the tree pruning (``spllt_prune_tree`` analogue) assigns whole
subtrees to devices; each device factors its subtrees locally with the same
level-scheduled batched program (SPMD over a ``tree`` mesh axis, per-device
task tables padded to common shapes), ancestor contribution blocks are
reduced with one ``psum`` over ICI, and the (small) top of the tree is
factored replicated.  Communication is a single deterministic collective —
no runtime scheduler, no point-to-point messaging, and bitwise-reproducible
results for a fixed configuration (the reference's STARPU_COMMUTE updates
are run-to-run non-deterministic; SURVEY §7 'hard parts').

Phases:
  A. local: assemble + factor the device's subtrees; ``update_between``
     contributions into top ancestors accumulate in a zero-initialized
     replica of the top blocks.
  B. reduce: top = assembled_top + psum(contributions, 'tree').
  C. replicated: factor the top subforest (identical on every device).
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["ForestPartition", "partition_forest", "MultiDeviceFactor",
           "dryrun"]


@dataclasses.dataclass
class ForestPartition:
    ndev: int
    part_of_node: np.ndarray    # device id per node, -1 = top (replicated)
    ntop: int                   # top blocks (local ids 0..ntop-1)
    ppart: int                  # padded per-device subtree block count
    nlocal: int                 # ntop + ppart + 1 (scratch)
    blk_local: np.ndarray       # global blk -> local id (within its region)
    blk_dev: np.ndarray         # global blk -> device id or -1 (top)


def partition_forest(symb, plan, ndev: int) -> ForestPartition:
    """Assign pruned subtrees to devices (LPT bin packing on flop weight)."""
    from ..analyse.prune import prune_tree, subtree_list

    nnodes = plan.nnodes
    small = prune_tree(symb.forest, symb.weight, ndev)
    subtrees = subtree_list(symb.forest, small)
    part_of_node = np.full(nnodes, -1, dtype=np.int64)
    # LPT: heaviest subtree first onto least-loaded device
    loads = np.zeros(ndev)
    order = np.argsort([-symb.weight[t[-1]] for t in subtrees])
    for si in order:
        t = subtrees[si]
        d = int(np.argmin(loads))
        loads[d] += float(symb.weight[t[-1]])
        part_of_node[t] = d

    blk_dev = part_of_node[plan.blk_node]
    ntop = int(np.sum(blk_dev == -1))
    blk_local = np.empty(plan.nblocks, dtype=np.int64)
    top_sel = blk_dev == -1
    blk_local[top_sel] = np.arange(ntop)
    per_dev = np.zeros(ndev, dtype=np.int64)
    ppart = 0
    for d in range(ndev):
        sel = blk_dev == d
        cnt = int(np.sum(sel))
        blk_local[sel] = ntop + np.arange(cnt)
        per_dev[d] = cnt
        ppart = max(ppart, cnt)
    return ForestPartition(
        ndev=ndev, part_of_node=part_of_node, ntop=ntop, ppart=ppart,
        nlocal=ntop + ppart + 1, blk_local=blk_local, blk_dev=blk_dev)


# ------------------------------------------------------------------------- #
def _pad_bucket(tasks_by_dev, nlevels, ndev, nfields, pad_task):
    """Bucket per-device tasks by level with common padded per-level counts.

    tasks_by_dev: list over devices of lists of (lvl, f0, f1, ...).
    Returns (ptr[nlevels+2], fields: list of [ndev, total] arrays).
    """
    counts = np.zeros((ndev, nlevels + 2), dtype=np.int64)
    for d in range(ndev):
        for t in tasks_by_dev[d]:
            counts[d, t[0] + 1] += 1
    per_level = counts.max(axis=0)
    ptr = np.cumsum(per_level)
    total = int(ptr[-1])
    fields = [np.empty((ndev, total), dtype=np.int64) for _ in range(nfields)]
    for d in range(ndev):
        buckets: dict[int, list] = {}
        for t in tasks_by_dev[d]:
            buckets.setdefault(t[0], []).append(t[1:])
        for lvl in range(nlevels + 1):
            s = int(ptr[lvl])
            e = int(ptr[lvl + 1])
            got = buckets.get(lvl, [])
            for i in range(e - s):
                src = got[i] if i < len(got) else pad_task
                for f in range(nfields):
                    fields[f][d, s + i] = src[f]
    return ptr, fields


@dataclasses.dataclass
class MultiDeviceFactor:
    """Compiled multi-device factorization for one (symb, plan, ndev)."""

    part: ForestPartition
    nlevels: int
    # phase A (sharded [ndev, ...]) and phase C (replicated) task tables
    tables: dict
    # assembly
    asm_rowflat: np.ndarray      # [ndev, max_asm]
    asm_col: np.ndarray
    asm_val_idx: np.ndarray      # index into permuted values, -1 pad
    top_rowflat: np.ndarray      # top assembly (host, replicated)
    top_col: np.ndarray
    top_val_idx: np.ndarray
    maps: np.ndarray
    nb: int

    def local_pools(self, values: np.ndarray, dtype=np.float32):
        """Host-side assembly of the sharded local pools [ndev, nlocal*nb, nb]
        (subtree blocks only; top region zero) and the replicated assembled
        top [ntop*nb, nb]."""
        p = self.part
        nb = self.nb
        ndev = p.ndev
        pools = np.zeros((ndev, p.nlocal * nb, nb), dtype=dtype)
        vals = values.astype(dtype)
        for d in range(ndev):
            sel = self.asm_val_idx[d] >= 0
            np.add.at(pools[d], (self.asm_rowflat[d][sel],
                                 self.asm_col[d][sel]),
                      vals[self.asm_val_idx[d][sel]])
        top = np.zeros((max(1, p.ntop) * nb, nb), dtype=dtype)
        np.add.at(top, (self.top_rowflat, self.top_col),
                  vals[self.top_val_idx])
        return pools, top


def build_multidevice_factor(symb, plan, fplan, ndev: int
                             ) -> MultiDeviceFactor:
    """Partition the global factor plan into per-device phase-A tables and a
    replicated phase-C table, with padded SPMD-uniform shapes."""
    part = partition_forest(symb, plan, ndev)
    nb = plan.nb
    L = part.blk_local
    shift_scratch = part.nlocal - 1  # local scratch block id

    node_dev = part.part_of_node
    # per-node local-id shift (all blocks of a node share one shift)
    node_shift = (L[plan.node_blk_ptr[:-1]]
                  - plan.node_blk_ptr[:-1]).astype(np.int64)

    def owner_of_blk(b):
        return int(node_dev[plan.blk_node[b]])

    # split the flat global task lists back out with their levels
    def unbucket(ptr, *fields):
        out = []
        nlev = len(ptr) - 2
        for lvl in range(nlev + 1):
            for t in range(int(ptr[lvl]), int(ptr[lvl + 1])):
                out.append((lvl,) + tuple(int(f[t]) for f in fields))
        return out

    potrf = unbucket(fplan.potrf_ptr, fplan.potrf_blk, fplan.potrf_k)
    trsm = unbucket(fplan.trsm_ptr, fplan.trsm_diag, fplan.trsm_dst,
                    fplan.trsm_k)
    syrk = unbucket(fplan.syrk_ptr, fplan.syrk_src_i, fplan.syrk_src_j,
                    fplan.syrk_dst)
    updbt = unbucket(fplan.updbt_ptr, fplan.updbt_dst, fplan.updbt_mr,
                     fplan.updbt_mc, fplan.updbt_svp, fplan.updbt_c)

    nlevels = fplan.nlevels
    a_potrf = [[] for _ in range(ndev)]
    c_potrf = []
    for lvl, blk, k in potrf:
        d = owner_of_blk(blk)
        if d == -1:
            c_potrf.append((lvl, int(L[blk]), k))
        else:
            a_potrf[d].append((lvl, int(L[blk]), k))
    a_trsm = [[] for _ in range(ndev)]
    c_trsm = []
    for lvl, diag, dst, k in trsm:
        d = owner_of_blk(diag)
        tt = (lvl, int(L[diag]), int(L[dst]), k)
        (c_trsm if d == -1 else a_trsm[d]).append(tt)
    a_syrk = [[] for _ in range(ndev)]
    c_syrk = []
    for lvl, si, sj, dst in syrk:
        d = owner_of_blk(si)
        tt = (lvl, int(L[si]), int(L[sj]), int(L[dst]))
        (c_syrk if d == -1 else a_syrk[d]).append(tt)
    a_updbt = [[] for _ in range(ndev)]
    c_updbt = []
    for lvl, dst, mr, mc, svp, cw in updbt:
        src_node = int(fplan.srcvec_node[svp])
        d = int(node_dev[src_node])
        tt = (lvl, int(L[dst]), mr, mc, svp, cw)
        (c_updbt if d == -1 else a_updbt[d]).append(tt)
    # srcvec with local shifts (replicated table works for phase C too:
    # top-node entries get the top mapping on every device)
    srcvec_local = (fplan.srcvec
                    + node_shift[fplan.srcvec_node]).astype(np.int64)

    # phase C tables (replicated, standard bucketing)
    def bucket_flat(tl, nfields):
        ptr = np.zeros(nlevels + 2, dtype=np.int64)
        for t in tl:
            ptr[t[0] + 1] += 1
        ptr = np.cumsum(ptr)
        fields = [np.empty(len(tl), dtype=np.int64) for _ in range(nfields)]
        fill = np.zeros(nlevels + 2, dtype=np.int64)
        for t in tl:
            pos = int(ptr[t[0]] + fill[t[0]])
            fill[t[0]] += 1
            for f in range(nfields):
                fields[f][pos] = t[1 + f]
        return ptr, fields

    cp_ptr, cp_f = bucket_flat(c_potrf, 2)
    ct_ptr, ct_f = bucket_flat(c_trsm, 3)
    cs_ptr, cs_f = bucket_flat(c_syrk, 3)
    cu_ptr, cu_f = bucket_flat(c_updbt, 5)

    # phase A tables (sharded, padded)
    scratch = shift_scratch
    ap_ptr, ap_f = _pad_bucket(a_potrf, nlevels, ndev, 2, (scratch, 0))
    at_ptr, at_f = _pad_bucket(a_trsm, nlevels, ndev, 3,
                               (scratch, scratch, 0))
    as_ptr, as_f = _pad_bucket(a_syrk, nlevels, ndev, 3,
                               (scratch, scratch, scratch))
    au_ptr, au_f = _pad_bucket(a_updbt, nlevels, ndev, 5,
                               (scratch, 0, 0, 0, 0))

    # local blk_n per device (for updbt col masks); scratch gets nb
    blk_n_local = np.full((ndev, part.nlocal), nb, dtype=np.int64)
    for b in range(plan.nblocks):
        d = owner_of_blk(b)
        if d == -1:
            blk_n_local[:, L[b]] = plan.blk_n[b]
        else:
            blk_n_local[d, L[b]] = plan.blk_n[b]

    # assembly split: per-device entries + top entries
    asm_blk = plan.asm_rowflat.astype(np.int64) // nb
    asm_r = plan.asm_rowflat.astype(np.int64) % nb
    asm_dev = np.array([owner_of_blk(int(b)) for b in asm_blk])
    top_sel = asm_dev == -1
    top_rowflat = (L[asm_blk[top_sel]] * nb + asm_r[top_sel]).astype(np.int64)
    top_col = plan.asm_col[top_sel].astype(np.int64)
    top_val_idx = np.nonzero(top_sel)[0]
    max_asm = max((int(np.sum(asm_dev == d)) for d in range(ndev)),
                  default=0)
    max_asm = max(max_asm, 1)
    asm_rowflat = np.full((ndev, max_asm), shift_scratch * nb,
                          dtype=np.int64)
    asm_col = np.zeros((ndev, max_asm), dtype=np.int64)
    asm_val_idx = np.full((ndev, max_asm), -1, dtype=np.int64)
    for d in range(ndev):
        sel = np.nonzero(asm_dev == d)[0]
        asm_rowflat[d, :len(sel)] = L[asm_blk[sel]] * nb + asm_r[sel]
        asm_col[d, :len(sel)] = plan.asm_col[sel]
        asm_val_idx[d, :len(sel)] = sel

    tables = dict(
        ap_ptr=ap_ptr, ap_blk=ap_f[0], ap_k=ap_f[1],
        at_ptr=at_ptr, at_diag=at_f[0], at_dst=at_f[1], at_k=at_f[2],
        as_ptr=as_ptr, as_i=as_f[0], as_j=as_f[1], as_dst=as_f[2],
        au_ptr=au_ptr, au_dst=au_f[0], au_mr=au_f[1], au_mc=au_f[2],
        au_svp=au_f[3], au_c=au_f[4],
        cp_ptr=cp_ptr, cp_blk=np.asarray(cp_f[0]), cp_k=np.asarray(cp_f[1]),
        ct_ptr=ct_ptr, ct_diag=np.asarray(ct_f[0]),
        ct_dst=np.asarray(ct_f[1]), ct_k=np.asarray(ct_f[2]),
        cs_ptr=cs_ptr, cs_i=np.asarray(cs_f[0]), cs_j=np.asarray(cs_f[1]),
        cs_dst=np.asarray(cs_f[2]),
        cu_ptr=cu_ptr, cu_dst=np.asarray(cu_f[0]),
        cu_mr=np.asarray(cu_f[1]), cu_mc=np.asarray(cu_f[2]),
        cu_svp=np.asarray(cu_f[3]), cu_c=np.asarray(cu_f[4]),
        blk_n_local=blk_n_local,
        srcvec_local=srcvec_local,
        cmax=int(fplan.updbt_c.max()) if len(fplan.updbt_c) else 0,
    )
    return MultiDeviceFactor(
        part=part, nlevels=nlevels, tables=tables,
        asm_rowflat=asm_rowflat, asm_col=asm_col, asm_val_idx=asm_val_idx,
        top_rowflat=top_rowflat, top_col=top_col, top_val_idx=top_val_idx,
        maps=fplan.maps, nb=nb,
    )


# ------------------------------------------------------------------------- #
def make_sharded_factorize(md: MultiDeviceFactor, mesh, dtype):
    """Build the jittable SPMD factorization step over mesh axis 'tree'."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    nb = md.nb
    part = md.part
    nlev = md.nlevels
    t = {k: jnp.asarray(v, dtype=jnp.int32)
         for k, v in md.tables.items() if isinstance(v, np.ndarray)}
    maps = jnp.asarray(md.maps, dtype=jnp.int32)
    cmax = max(1, int(md.tables["cmax"]))

    from ..numeric.factor import _potrf_batch, _trsm_batch

    def bmm_nt(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (2,)), ((0,), (0,))),
            precision="highest", preferred_element_type=a.dtype)

    srcvec = t["srcvec_local"]

    def run_levels(pool, blk_n, ptrs, arrs, prefix):
        """Shared level loop for phase A (sharded) and C (replicated)."""
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
        p_ptr, t_ptr, s_ptr, u_ptr = ptrs
        for lvl in range(0, nlev + 1):
            s, e = int(u_ptr[lvl]), int(u_ptr[lvl + 1])
            if e > s:
                dst = arrs[prefix + "u_dst"][s:e]
                pr = maps[arrs[prefix + "u_mr"][s:e]]
                pc = maps[arrs[prefix + "u_mc"][s:e]]
                svp = arrs[prefix + "u_svp"][s:e]
                cv = arrs[prefix + "u_c"][s:e]
                iot_c = jax.lax.broadcasted_iota(jnp.int32, (1, cmax), 1)
                svi = jnp.minimum(svp[:, None] + iot_c,
                                  srcvec.shape[0] - 1)
                sv = srcvec[svi]
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
            s, e = int(s_ptr[lvl]), int(s_ptr[lvl + 1])
            if e > s:
                si = arrs[prefix + "s_i"][s:e]
                sj = arrs[prefix + "s_j"][s:e]
                dst = arrs[prefix + "s_dst"][s:e]
                pool = pool.at[dst].add(-bmm_nt(pool[si], pool[sj]))
            s, e = int(p_ptr[lvl]), int(p_ptr[lvl + 1])
            if e > s:
                blk = arrs[prefix + "p_blk"][s:e]
                out = _potrf_batch(pool[blk], arrs[prefix + "p_k"][s:e], nb)
                pool = pool.at[blk].set(out)
            s, e = int(t_ptr[lvl]), int(t_ptr[lvl + 1])
            if e > s:
                diag = arrs[prefix + "t_diag"][s:e]
                dst = arrs[prefix + "t_dst"][s:e]
                out = _trsm_batch(pool[diag], pool[dst],
                                  arrs[prefix + "t_k"][s:e], nb)
                pool = pool.at[dst].set(out)
        return pool

    ntop = part.ntop
    # per-device (sharded) phase-A tables, keyed "a<type>_<field>"
    a_sharded = {k: v for k, v in t.items()
                 if k.startswith("a") and not k.endswith("_ptr")}
    a_names = sorted(a_sharded.keys())

    def step(pools, top_init):
        """pools: [ndev, nlocal*nb, nb] sharded on 'tree'; top_init
        replicated [ntop*nb, nb].  Returns factored pools (sharded)."""

        def inner(pool_shard, top_init, blk_n_shard, *a_tabs):
            arrs = {n[1:]: a_tabs[i][0] for i, n in enumerate(a_names)}
            pool = pool_shard[0].reshape(part.nlocal, nb, nb)
            bn = blk_n_shard[0]
            pool = run_levels(
                pool, bn,
                (md.tables["ap_ptr"], md.tables["at_ptr"],
                 md.tables["as_ptr"], md.tables["au_ptr"]),
                arrs, "")
            # phase B: reduce top contributions, add assembled top values
            contrib = pool[:ntop] if ntop else pool[:0]
            top = jax.lax.psum(contrib, "tree")
            top = top + top_init.reshape(max(1, ntop), nb, nb)[:ntop]
            pool = pool.at[:ntop].set(top)
            # phase C: replicated top factorization
            carrs = {k[1:]: v for k, v in t.items() if k.startswith("c")}
            pool = run_levels(
                pool, bn,
                (md.tables["cp_ptr"], md.tables["ct_ptr"],
                 md.tables["cs_ptr"], md.tables["cu_ptr"]),
                carrs, "")
            return pool.reshape(1, part.nlocal * nb, nb)

        in_specs = ([P("tree"), P(), P("tree")] +
                    [P("tree")] * len(a_names))
        fn = shard_map(inner, mesh=mesh,
                       in_specs=tuple(in_specs), out_specs=P("tree"),
                       check_rep=False)
        return fn(pools, top_init, t["blk_n_local"],
                  *[a_sharded[k] for k in a_names])

    return step, t, a_sharded


def reconstruct_global_pool(md: MultiDeviceFactor, pools, plan):
    """Gather the sharded factored pools back into the global block pool
    layout (host side; the gather.jdf analogue)."""
    nb = md.nb
    part = md.part
    pools = np.asarray(pools)
    out = np.zeros((plan.nblocks, nb, nb), dtype=pools.dtype)
    for b in range(plan.nblocks):
        d = part.blk_dev[b]
        lb = int(part.blk_local[b])
        src = pools[0 if d == -1 else d].reshape(part.nlocal, nb, nb)
        out[b] = src[lb]
    return out


# ------------------------------------------------------------------------- #
def dryrun(n_devices: int) -> None:
    """Create an n-device mesh, jit the full multi-device factorization
    step with real tree shardings, run one step on tiny shapes, and check
    the result against the sequential oracle."""
    import os

    # ensure enough virtual host devices exist before the CPU backend
    # initialises (no-op if it is already up)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            f"{max(8, n_devices)}").strip()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from .. import Options, analyse, poisson2d
    from ..numeric.assemble import assemble_np
    from ..numeric.stf import factorize_np
    from ..plan.blocking import build_block_plan
    from ..plan.factor_tasks import build_factor_plan

    devs = jax.devices()
    if len(devs) < n_devices:
        devs = jax.devices("cpu")  # virtual host devices for dry runs
    devs = devs[:n_devices]
    assert len(devs) == n_devices, (
        f"need {n_devices} devices, have {len(devs)}")
    mesh = Mesh(np.array(devs), ("tree",))

    a = poisson2d(16)
    opts = Options(ordering="nd-grid", grid_shape=(16, 16), nb=8, nemin=4,
                   ndevices=n_devices, prune_tree=True)
    symb = analyse(a, opts)
    plan = build_block_plan(symb, opts.nb)
    fplan = build_factor_plan(symb, plan)
    md = build_multidevice_factor(symb, plan, fplan, n_devices)

    dtype = np.float32
    pools_np, top_np = md.local_pools(symb.a_perm.values, dtype=dtype)
    step, t, a_sharded = make_sharded_factorize(md, mesh, dtype)

    pools = jax.device_put(
        jnp.asarray(pools_np), NamedSharding(mesh, P("tree")))
    top_init = jax.device_put(
        jnp.asarray(top_np), NamedSharding(mesh, P()))
    jstep = jax.jit(step)
    out = jstep(pools, top_init)
    out.block_until_ready()

    # verify against the sequential float64 oracle
    g = reconstruct_global_pool(md, out, plan)
    pool_ref = assemble_np(plan, symb.a_perm.values, dtype=np.float64)
    pool_ref = factorize_np(pool_ref, fplan)
    err = float(np.max(np.abs(g - pool_ref[:plan.nblocks])))
    assert err < 1e-3, f"multi-device factor mismatch: {err}"
    print(f"dryrun_multichip({n_devices}): max |Δpool| = {err:.2e} ok")
