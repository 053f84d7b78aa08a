"""Assembly-tree pruning / subtree coarsening.

Analogue of ``spllt_prune_tree`` (/root/reference/src/spllt_analyse_mod.F90:
806-987, qr_mumps L0-layer algorithm): choose a layer L0 of the tree such
that the forest below L0 splits into subtrees whose flop weights can be
round-robin bin-packed over ``nparts`` workers with ≥90 % load balance;
every subtree hanging below the layer is coarsened.  The threshold starts at
1 % of total flops and is halved while balance fails.

Returns ``small``: small[nd] = 1 if nd is the root of a coarsened subtree,
-1 if nd lies strictly inside one, 0 otherwise (the reference encodes the
same three states with node ids, spllt_analyse_mod.F90:960-985).
"""

from __future__ import annotations

import numpy as np

__all__ = ["prune_tree", "subtree_list"]


def _balance(weights: list[float], nparts: int) -> float:
    """Load balance of greedy (LPT) bin packing of weights over nparts."""
    if not weights:
        return 1.0
    bins = np.zeros(nparts)
    for w in sorted(weights, reverse=True):
        bins[np.argmin(bins)] += w
    total = bins.sum()
    if total == 0:
        return 1.0
    return total / (nparts * bins.max())


def prune_tree(forest, weight: np.ndarray, nparts: int,
               target_balance: float = 0.9) -> np.ndarray:
    """Compute coarsening marks for the supernode forest."""
    nnodes = forest.nnodes
    small = np.zeros(nnodes, dtype=np.int64)
    if nnodes == 0:
        return small
    children: list[list[int]] = [[] for _ in range(nnodes)]
    roots: list[int] = []
    for nd in range(nnodes):
        p = forest.sparent[nd]
        if p == -1:
            roots.append(nd)
        else:
            children[p].append(nd)

    total = float(weight[roots].sum()) if roots else 0.0
    if total == 0.0:
        return small
    nparts = max(1, nparts)

    # L0 layer: refine until bin-packing the layer subtrees balances, while
    # keeping every layer subtree below the (shrinking) threshold.
    layer = list(roots)
    threshold = 0.01 * total
    for _ in range(64):
        # split any layer node that is heavier than the threshold
        changed = True
        while changed:
            changed = False
            nxt: list[int] = []
            for nd in layer:
                if weight[nd] > threshold * nparts and children[nd]:
                    nxt.extend(children[nd])
                    changed = True
                else:
                    nxt.append(nd)
            layer = nxt
        if _balance([float(weight[nd]) for nd in layer], nparts) \
                >= target_balance:
            break
        threshold *= 0.5
        if threshold * nparts < total / max(1, nnodes):
            break

    # everything at/below the layer is a coarsened subtree — but only mark
    # subtrees that are proper (non-root-of-tree) or leave large singleton
    # layer nodes unmarked when they have no children (nothing to fuse).
    for nd in layer:
        small[nd] = 1
        stack = list(children[nd])
        while stack:
            c = stack.pop()
            small[c] = -1
            stack.extend(children[c])
    return small


def subtree_list(forest, small: np.ndarray) -> list[np.ndarray]:
    """Contiguous node ranges of the coarsened subtrees (``spllt_tree_t``
    analogue, /root/reference/src/spllt_data_mod.F90:288-296).  Postorder
    guarantees each subtree occupies nodes [least_desc(r) .. r]."""
    ndesc = np.zeros(forest.nnodes, dtype=np.int64)
    for nd in range(forest.nnodes):
        p = forest.sparent[nd]
        if p != -1:
            ndesc[p] += ndesc[nd] + 1
    out = []
    for r in np.nonzero(small == 1)[0]:
        out.append(np.arange(r - ndesc[r], r + 1))
    return out
