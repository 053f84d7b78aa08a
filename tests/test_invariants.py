"""Verification invariants from the reference's test strategy (SURVEY §4):
(a) backward/forward error — covered across the suite;
(b) analyse-phase predicted num_factor/num_flops vs factual;
(c) dependency statistics as structural sanity checks."""

import numpy as np

from spllt_tpu import Options, analyse, factor, poisson2d, poisson3d
from spllt_tpu.utils.stats import factor_plan_stats
from spllt_tpu.utils.tracing import TraceLog


def test_predicted_nnz_matches_factual():
    mat = poisson2d(16)
    opts = Options(ordering="nd-grid", grid_shape=(16, 16), nb=8,
                   nemin=4, mode="stf", prune_tree=False)
    symb = analyse(mat, opts)
    num = factor(symb)
    # count factual stored entries of L inside the supernodal structure:
    # per node, per column j: (m - jlocal) entries
    factual = 0
    f = symb.forest
    for nd in range(f.nnodes):
        m = int(f.rptr[nd + 1] - f.rptr[nd])
        w = f.ncols(nd)
        factual += sum(m - j for j in range(w))
    assert factual == symb.inform.num_factor
    # the pool's nonzero count never exceeds the prediction and the
    # diagonal blocks are fully populated
    pool = np.asarray(num.pool)
    assert np.count_nonzero(pool) <= symb.inform.num_factor
    # flops prediction matches the spllt_symbolic formula recomputed here
    flops = 0
    for nd in range(f.nnodes):
        m = int(f.rptr[nd + 1] - f.rptr[nd])
        w = f.ncols(nd)
        flops += sum((m - j) ** 2 for j in range(w))
    assert flops == symb.inform.num_flops


def test_plan_stats_sanity():
    mat = poisson3d(6)
    opts = Options(ordering="nd-grid", grid_shape=(6, 6, 6), nb=16,
                   nemin=8, prune_tree=False)
    symb = analyse(mat, opts)
    from spllt_tpu.api import _plans

    plan, fp, sp = _plans(symb, opts)
    st = factor_plan_stats(fp)
    assert st["num_tasks"] == fp.num_tasks
    assert st["nlevels"] == fp.nlevels
    assert st["tasks_per_kind"]["potrf"] >= symb.nnodes  # >= 1 per node
    assert st["map_bytes"] > 0


def test_paje_dump(tmp_path):
    log = TraceLog()
    with log.event("factor"):
        with log.event("potrf"):
            pass
    p = tmp_path / "t.paje"
    log.dump_paje(str(p))
    text = p.read_text()
    assert "PajeSetState" in text and "ST_ThreadState" in text
    assert "'factor'" in text and "'potrf'" in text
