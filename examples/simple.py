"""Minimal usage example (reference example/C/simple.c analogue).

Solves the 4x4 SPD system from the reference's C example through the
three-phase API.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from spllt_tpu import CscMatrix, Options, analyse, factor, solve

# lower-triangle CSC of a small SPD matrix (diagonal first per column)
n = 5
colptr = np.array([0, 2, 5, 7, 8, 9])
rowind = np.array([0, 1,   1, 2, 4,   2, 3,   3,   4])
values = np.array([2.0, 1.0,   4.0, 1.0, 1.0,   3.0, 2.0,   3.0,   2.0])

a = CscMatrix(n=n, colptr=colptr, rowind=rowind, values=values)
a.verify()

symb = analyse(a, Options(nb=4, nemin=2, ordering="amd", mode="stf"))
num = factor(symb)

b = a.matvec(np.ones(n))
x = solve(num, b)

print("x        =", x)
print("residual =", np.linalg.norm(a.matvec(x) - b))
assert np.allclose(x, 1.0)
print("ok")
