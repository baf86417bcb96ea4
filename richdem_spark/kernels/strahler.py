"""Strahler stream order from D8 flow directions (vectorized Kahn).

The reference ships the operator surface but left the implementation
commented out (``include/richdem/methods/strahler.hpp:5-46``; only the
MSB-cleanup helper is active).  This is a clean re-derivation of the
standard Strahler (1957) semantics rather than a transcription:

* a cell with no inflows has order 1;
* a cell whose inflows have maximum order ``m`` has order ``m`` if
  exactly one inflow attains ``m``, else ``m + 1``.

The sweep is the same level-synchronous Kahn frontier as
:func:`..d8.d8_flow_accum`, but the carried state is the
(max-inflow-order, count-at-max) pair instead of a sum — the
(max, count) semiring is what makes Strahler non-linear and forces the
tiled operator (``ops/strahler.py``) to iterate seam rounds instead of
reusing the two-round linear-accumulation trick.

``ext_m``/``ext_k`` inject already-finalized external inflows (cross-
tile edges): per cell, the maximum external inflow order and how many
external inflows attain it.
"""

from __future__ import annotations

import numpy as np

from ..constants import FLOWDIR_NO_DATA
from .d8 import _neighbor_flat


def strahler_order(
    dirs: np.ndarray,
    ext_m: np.ndarray | None = None,
    ext_k: np.ndarray | None = None,
) -> np.ndarray:
    """Strahler order per cell (int32); NoData cells get -1.

    ``dirs``: D8 codes 0..8 / 255.  Flow into NoData or off-grid is
    absorbed (matches ``d8_flow_accum``'s bookkeeping).
    """
    h, w = dirs.shape
    n = h * w
    valid = dirs.ravel() != FLOWDIR_NO_DATA
    ds, ok = _neighbor_flat(h, w, dirs)
    ok = ok & valid & valid[np.where(ds >= 0, ds, 0)]
    ds = np.where(ok, ds, -1)
    indeg = np.bincount(ds[ok], minlength=n)

    m = np.zeros(n, np.int64)
    k = np.zeros(n, np.int64)
    if ext_m is not None:
        em = ext_m.ravel().astype(np.int64)
        ek = (np.zeros(n, np.int64) if ext_k is None
              else ext_k.ravel().astype(np.int64))
        has = ek > 0
        m[has] = em[has]
        k[has] = ek[has]
    ext_in = k > 0

    order = np.zeros(n, np.int64)
    deps = indeg.copy()
    frontier = np.flatnonzero(valid & (deps == 0))
    while frontier.size:
        f = frontier
        has_in = (indeg[f] > 0) | ext_in[f]
        order[f] = np.where(has_in, m[f] + (k[f] >= 2), 1)
        fl = f[ok[f]]
        if fl.size:
            t = ds[fl]
            o = order[fl]
            # per-target (max, count-at-max) over this batch: sort by
            # (target, order); each segment's last element is its max
            sel = np.lexsort((o, t))
            ts, os_ = t[sel], o[sel]
            starts = np.flatnonzero(np.r_[True, ts[1:] != ts[:-1]])
            seg_len = np.diff(np.r_[starts, len(ts)])
            tg = ts[starts]
            bmax = os_[starts + seg_len - 1]
            bcnt = np.add.reduceat(
                (os_ == np.repeat(bmax, seg_len)).astype(np.int64), starts)
            better = bmax > m[tg]
            equal = bmax == m[tg]
            k[tg] = np.where(better, bcnt, k[tg] + np.where(equal, bcnt, 0))
            m[tg] = np.where(better, bmax, m[tg])
            np.subtract.at(deps, t, 1)
            frontier = np.unique(t[deps[t] == 0])
        else:
            frontier = np.empty(0, np.int64)
    out = order.astype(np.int32).reshape(h, w)
    out[~valid.reshape(h, w)] = -1
    return out
