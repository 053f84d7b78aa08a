"""Host-side NumPy simulator of the factor-megakernel stream semantics.

Executes the chunk tables exactly as the pallas kernel does — per-step
segmented Hillis-Steele scan over the group axis, slot-indexed segment
completions, the cross-step carry accumulator, chunk-seam partial RMWs —
but in NumPy f64, against the STF oracle.  This validates the HOST table
construction (``build_mega_stream``/``_upd_slot_tables``/the balanced
chunk cuts) for every group size and seam configuration in seconds,
where interpret-mode pallas takes minutes per config on this host; the
Mosaic-side lowering is covered by tests/test_mega_adversarial.py and
scripts/smoke_tpu.py.
"""

import numpy as np
import pytest

from spllt_tpu import Options, analyse, poisson2d
from spllt_tpu.api import _plans
from spllt_tpu.numeric.assemble import assemble_np
from spllt_tpu.numeric.megakernel import (
    KIND_NOOP, KIND_POTRF, KIND_UPD, _BLKN_BITS, _KEEP_BIT, _META_C2_BIT,
    _SACT_BIT, _SEG_BITS, build_mega_stream)
from spllt_tpu.numeric.stf import factorize_np


def simulate(poolf, chunks, nb, G):
    pool = poolf.copy()
    for ch in chunks:
        kind, meta = ch["kind"], ch["segmeta"]
        wr, wc, dst, aux = ch["wr"], ch["wc"], ch["dst"], ch["aux"]
        relr, relc = ch["relr"], ch["relc"]
        acc = np.zeros((nb, nb))
        for t in range(len(kind)):
            if kind[t] == KIND_NOOP:
                continue
            if kind[t] == KIND_UPD:
                u3 = np.zeros((G, nb, nb))
                for i in range(G):
                    s = t * G + i
                    blkn = aux[s] & ((1 << _BLKN_BITS) - 1)
                    wrow = pool[wr[s]:wr[s] + nb]
                    wcol = pool[wc[s]:wc[s] + nb]
                    rr, rc = relr[s], relc[s]
                    r3 = np.zeros((nb, nb))
                    c3 = np.zeros((nb, nb))
                    vr = np.nonzero(rr >= 0)[0]
                    vc = np.nonzero(rc >= 0)[0]
                    r3[vr] = wrow[rr[vr]]
                    c3[vc] = wcol[rc[vc]]
                    c3[blkn:] = 0.0
                    u3[i] = r3 @ c3.T
                x = u3.copy()
                p = np.array([(aux[t * G + i] >> _KEEP_BIT) & 1
                              for i in range(G)], dtype=np.float64)
                sh = 1
                while sh < G:
                    xs = np.concatenate(
                        [np.zeros((sh, nb, nb)), x[:G - sh]])
                    ps = np.concatenate([np.zeros(sh), p[:G - sh]])
                    x = x + xs * p[:, None, None]
                    p = p * ps
                    sh *= 2
                cin = meta[t] & 1
                for s_ in range(G):
                    s = t * G + s_
                    if (aux[s] >> _SACT_BIT) & 1:
                        segz = ((aux[s] >> _SEG_BITS) & 15) == 0
                        d = pool[dst[s]:dst[s] + nb] - x[s_]
                        if cin and segz:
                            d = d - acc
                        pool[dst[s]:dst[s] + nb] = d
                c2 = (meta[t] >> _META_C2_BIT) & 1
                acc = x[G - 1] + acc * c2
            else:
                for i in range(G):
                    s = t * G + i
                    kv = int(aux[s])
                    if kv == 0:
                        continue
                    if kind[t] == KIND_POTRF:
                        tile = pool[wr[s]:wr[s] + nb]
                        L = np.linalg.cholesky(tile[:kv, :kv])
                        B = tile[kv:, :kv]
                        out = np.zeros((nb, nb))
                        out[:kv, :kv] = np.tril(L)
                        out[kv:, :kv] = B @ np.linalg.inv(np.tril(L)).T
                        pool[dst[s]:dst[s] + nb] = out
                    else:
                        diag = pool[wr[s]:wr[s] + nb]
                        L = np.tril(diag[:kv, :kv])
                        Bt = pool[wc[s]:wc[s] + nb]
                        out = np.zeros((nb, nb))
                        out[:, :kv] = Bt[:, :kv] @ np.linalg.inv(L).T
                        pool[dst[s]:dst[s] + nb] = out
    return pool


@pytest.mark.parametrize("G,kmax", [
    (2, 10**9), (2, 40), (2, 24), (4, 64),
    (8, 10**9), (8, 160), (16, 10**9), (16, 320),
])
def test_mega_stream_simulator_matches_oracle(G, kmax):
    mat = poisson2d(12)
    options = Options(mode="batched", dtype="float64", refine=0,
                      schedule="scan", ordering="amd", nb=8, nemin=8,
                      prune_tree=False)
    symb = analyse(mat, options)
    plan, fp, _sp = _plans(symb, options)
    pool0 = assemble_np(plan, symb.a_perm.values, dtype=np.float64)
    ref = factorize_np(pool0.copy(), fp)
    nb = fp.nb
    chunks = build_mega_stream(fp, G, (fp.nblocks + 1) * nb, kmax=kmax)
    got = simulate(pool0.reshape(-1, nb), chunks, nb, G)
    got = got.reshape(fp.nblocks + 1, nb, nb)
    err = float(np.max(np.abs(got[:fp.nblocks] - ref[:fp.nblocks])))
    assert err < 1e-12


def test_balanced_chunks_have_minimal_noop_padding():
    mat = poisson2d(12)
    options = Options(mode="batched", dtype="float64", refine=0,
                      schedule="scan", ordering="amd", nb=8, nemin=8,
                      prune_tree=False)
    symb = analyse(mat, options)
    _plan, fp, _sp = _plans(symb, options)
    chunks = build_mega_stream(fp, 2, (fp.nblocks + 1) * fp.nb, kmax=40)
    noop = sum(int((c["kind"] == KIND_NOOP).sum()) for c in chunks)
    # exact balanced cuts: padding < one step per chunk
    assert noop < len(chunks)
