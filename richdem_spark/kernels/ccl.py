"""Vectorized binary flood fill and connected-component labelling on
grids, with 8-connectivity — no scipy, pure NumPy.

Core primitive: per-row/per-column *segmented minimum* via
``np.minimum.reduceat`` (each maskless cell is a barrier), alternated
with one 8-neighbour min-dilation step for diagonal connectivity.  Long
corridors collapse in one sweep, so convergence is proportional to the
number of bends in the region geometry, not its diameter.
"""

from __future__ import annotations

import numpy as np

_INF = np.iinfo(np.int64).max


def _row_segmin(vals: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Per row: every masked cell takes the min of `vals` over its
    contiguous masked run.  vals must be _INF where ~mask."""
    h, w = vals.shape
    flat = np.where(mask, vals, _INF).ravel()
    m = mask.ravel()
    # segment starts: first cell, or a masked cell after a barrier/row edge
    prev = np.empty_like(m)
    prev[0] = False
    prev[1:] = m[:-1]
    # row boundaries break segments
    prev[::w] = False
    starts = np.flatnonzero(m & ~prev)
    if starts.size == 0:
        return vals
    # segment id per masked cell
    seg_of = np.cumsum(m & ~prev) - 1
    mins = np.minimum.reduceat(flat, starts)
    out = flat.copy()
    mm = np.flatnonzero(m)
    out[mm] = mins[seg_of[mm]]
    return np.where(mask, out.reshape(h, w), _INF)


def _min_dilate8(vals: np.ndarray, mask: np.ndarray,
                 connectivity: int = 8) -> np.ndarray:
    """One step of 8- (or 4-) neighbour min propagation within mask."""
    h, w = vals.shape
    out = vals.copy()
    v = np.where(mask, vals, _INF)
    offs = (
        ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
         (1, -1), (1, 0), (1, 1))
        if connectivity == 8
        else ((-1, 0), (0, -1), (0, 1), (1, 0))
    )
    for dy, dx in offs:
        shifted = np.full((h, w), _INF, dtype=np.int64)
        ys_d = slice(max(0, -dy), h - max(0, dy))
        xs_d = slice(max(0, -dx), w - max(0, dx))
        ys_s = slice(max(0, dy), h + min(0, dy))
        xs_s = slice(max(0, dx), w + min(0, dx))
        shifted[ys_d, xs_d] = v[ys_s, xs_s]
        out = np.minimum(out, shifted)
    return np.where(mask, out, _INF)


def label_components(mask: np.ndarray, connectivity: int = 8) -> np.ndarray:
    """8- (or 4-) connected component ids for True cells (0 for False
    cells).  Ids are 1 + the min flat index within each component."""
    h, w = mask.shape
    vals = np.where(mask, np.arange(h * w, dtype=np.int64).reshape(h, w),
                    _INF)
    while True:
        prev = vals
        vals = _row_segmin(vals, mask)
        vals = _row_segmin(vals.T, mask.T).T
        vals = _min_dilate8(vals, mask, connectivity)
        if np.array_equal(vals, prev):
            break
    out = np.where(mask, vals + 1, 0)
    return out


def flood(seeds: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Cells 8-connected to a seed through mask (seeds must be masked)."""
    if not seeds.any():
        return np.zeros_like(mask)
    comp = label_components(mask)
    hit = np.unique(comp[seeds & mask])
    hit = hit[hit > 0]
    return np.isin(comp, hit) & mask
