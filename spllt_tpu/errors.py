"""Error flags and exceptions.

Mirrors the reference's error propagation (``spllt_inform%flag`` codes,
/root/reference/src/spllt_data_mod.F90:31-35 and spllt_error_mod.F90).
"""

from __future__ import annotations

SPLLT_SUCCESS = 0
SPLLT_ERROR_ALLOCATION = -1
SPLLT_ERROR_MATRIX = -2
SPLLT_ERROR_NOT_POSDEF = -3
SPLLT_ERROR_UNKNOWN = -99
SPLLT_WARNING_PRECISION = 1


class SpLLTError(RuntimeError):
    def __init__(self, flag: int, message: str):
        super().__init__(f"[flag {flag}] {message}")
        self.flag = flag


class NotPositiveDefiniteError(SpLLTError):
    def __init__(self, message: str = "matrix is not positive definite"):
        super().__init__(SPLLT_ERROR_NOT_POSDEF, message)
