"""CLI smoke tests (reference drivers analogue) — run in-process."""

import json

import numpy as np
import pytest

from spllt_tpu.cli import main


def test_cli_poisson2d_stf(capsys):
    rc = main(["--poisson2d", "10", "--nb", "8", "--mode", "stf",
               "--nrhs", "2", "--json", "--stats"])
    out = capsys.readouterr().out
    assert rc == 0
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["bwd_err"] < 1e-12
    assert rec["nnz_L"] > 0
    assert "num_tasks" in out


def test_cli_batched_with_timers_and_trace(tmp_path, capsys):
    trace = str(tmp_path / "trace.json")
    rc = main(["--poisson2d", "12", "--nb", "16", "--mode", "batched",
               "--dtype", "float64", "--refine", "0", "--timers",
               "--trace", trace])
    out = capsys.readouterr().out
    assert rc == 0
    assert "factor" in out
    data = json.load(open(trace))
    assert len(data["traceEvents"]) >= 2


def test_cli_random_amd(capsys):
    rc = main(["--random", "60", "--nb", "8", "--mode", "stf"])
    assert rc == 0


def test_cli_matrix_market(tmp_path, capsys):
    p = tmp_path / "t.mtx"
    p.write_text("""%%MatrixMarket matrix coordinate real symmetric
4 4 7
1 1 4.0
2 2 4.0
3 3 4.0
4 4 4.0
2 1 -1.0
3 2 -1.0
4 3 -1.0
""")
    rc = main(["--mm", str(p), "--nb", "4", "--mode", "stf"])
    assert rc == 0
