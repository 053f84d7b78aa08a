"""Pattern-reuse example: analyse once, factor repeatedly with new values
(the reference's akeep-reuse workflow, doc/source/subroutines.rst), plus
checkpoint/resume via utils.persist.
"""

import tempfile

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from spllt_tpu import CscMatrix, Options, analyse, factor, make_rhs, \
    poisson2d, solve
from spllt_tpu.utils.persist import load_factor, save_factor

a = poisson2d(12)
opts = Options(nb=16, nemin=8, ordering="nd-grid", grid_shape=(12, 12),
               mode="stf")
symb = analyse(a, opts)              # symbolic work done once

for scale in (1.0, 2.5, 10.0):       # time-stepping-style refactorization
    a2 = CscMatrix(a.n, a.colptr, a.rowind, a.values * scale)
    num = factor(symb, a=a2)
    xt, b = make_rhs(a2, nrhs=2)
    x = solve(num, b)
    r = np.linalg.norm(a2.matvec(x) - b) / np.linalg.norm(b)
    print(f"scale={scale:5.1f}  backward error = {r:.2e}")
    assert r < 1e-13

with tempfile.TemporaryDirectory() as d:
    save_factor(f"{d}/ck.npz", num)
    num2 = load_factor(f"{d}/ck.npz")
    x2 = solve(num2, b)
    print("resumed solve matches:", np.allclose(x2, x))
