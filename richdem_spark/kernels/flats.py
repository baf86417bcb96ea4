"""Flat resolution — Barnes 2014a "An efficient assignment of drainage
direction over flat surfaces".

Re-derivation of ``include/richdem/flats/flat_resolution.hpp``:
* ``find_flat_edges`` (:381-418) — vectorized neighbour scans
* ``label_this`` flood fill (:331-355) — vectorized min-label propagation
  over equal-elevation components (label *ids* differ from the
  reference's scan order; geometry is identical)
* ``BuildAwayGradient`` / ``BuildTowardsCombinedGradient`` (:152-298) —
  level-synchronous BFS (the reference's iteration markers ARE BFS
  levels, so per-level vectorization is exact)
* ``d8_flow_flats`` / ``d8_masked_FlowDir`` (:42-116) with the same
  even/odd tie quirk as d8_FlowDir
* ``d8_flats_alter_dem`` (:545-582) — repeated ``np.nextafter`` bumps
"""

from __future__ import annotations

import numpy as np

from ..constants import D8X, D8Y, FLOWDIR_NO_DATA, NO_FLOW


def _shifts(h, w):
    out = []
    for n in range(1, 9):
        dx, dy = int(D8X[n]), int(D8Y[n])
        dst = (slice(max(0, -dy), h - max(0, dy)),
               slice(max(0, -dx), w - max(0, dx)))
        src = (slice(max(0, dy), h + min(0, dy)),
               slice(max(0, dx), w + min(0, dx)))
        out.append((n, dst, src))
    return out


def find_flat_edges(elev: np.ndarray, dirs: np.ndarray):
    """(low_edges, high_edges) boolean masks
    (flat_resolution.hpp:381-418)."""
    h, w = elev.shape
    valid = dirs != FLOWDIR_NO_DATA
    low = np.zeros((h, w), bool)
    high = np.zeros((h, w), bool)
    for n, dst, src in _shifts(h, w):
        nb_valid = valid[src]
        low[dst] |= (
            (dirs[dst] != NO_FLOW) & valid[dst] & nb_valid
            & (dirs[src] == NO_FLOW) & (elev[src] == elev[dst])
        )
        high[dst] |= (
            (dirs[dst] == NO_FLOW) & valid[dst] & nb_valid
            & (elev[dst] < elev[src])
        )
    return low, high


def label_flats(elev: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Label equal-elevation connected components containing seed cells
    (label_this, :331-355).  Min-label propagation until fixpoint."""
    h, w = elev.shape
    labels = np.zeros((h, w), dtype=np.int64)
    sy, sx = np.nonzero(seeds)
    labels[sy, sx] = np.arange(1, len(sy) + 1)
    shifts = _shifts(h, w)
    while True:
        changed = False
        for n, dst, src in shifts:
            same = elev[dst] == elev[src]
            cand = np.where(same & (labels[src] > 0), labels[src],
                            np.iinfo(np.int64).max)
            cur = np.where(labels[dst] > 0, labels[dst],
                           np.iinfo(np.int64).max)
            new = np.minimum(cur, cand)
            upd = new < cur
            if upd.any():
                block = labels[dst]
                block[upd] = new[upd]
                labels[dst] = block
                changed = True
        if not changed:
            break
    # compact label ids
    uniq = np.unique(labels[labels > 0])
    remap = np.zeros(int(uniq.max()) + 1 if uniq.size else 1,
                     dtype=np.int64)
    remap[uniq] = np.arange(1, uniq.size + 1)
    labels[labels > 0] = remap[labels[labels > 0]]
    return labels


def _bfs_levels(start: np.ndarray, allowed: np.ndarray,
                labels: np.ndarray) -> np.ndarray:
    """Level-synchronous BFS from `start` through same-label `allowed`
    cells; returns level per cell (0 = unreached, seeds = 1)."""
    h, w = labels.shape
    level = np.zeros((h, w), dtype=np.int64)
    frontier = start.copy()
    level[frontier] = 1
    k = 1
    shifts = _shifts(h, w)
    while frontier.any():
        k += 1
        nxt = np.zeros((h, w), bool)
        for n, dst, src in shifts:
            nxt[src] |= (
                frontier[dst] & allowed[src]
                & (labels[src] == labels[dst]) & (level[src] == 0)
            )
        nxt &= level == 0
        level[nxt] = k
        frontier = nxt
    return level


def resolve_flats(elev: np.ndarray, dirs: np.ndarray,
                  nodata: float | None = None):
    """(flat_mask, labels) per resolve_flats_barnes
    (flat_resolution.hpp:447-517)."""
    h, w = elev.shape
    d = dirs.copy()
    if nodata is not None:
        d[elev == nodata] = FLOWDIR_NO_DATA
    low, high = find_flat_edges(elev, d)
    flat_mask = np.zeros((h, w), dtype=np.int64)
    if not low.any():
        return flat_mask, np.zeros((h, w), dtype=np.int64)
    labels = label_flats(elev, low)
    # drop high edges in flats without outlets (labels == 0)
    high = high & (labels > 0)

    no_flow = (d == NO_FLOW)
    away = _bfs_levels(high, no_flow, labels)
    # flat_height[label] = max away level per flat
    nlab = int(labels.max())
    flat_height = np.zeros(nlab + 1, dtype=np.int64)
    lm = labels > 0
    if away.any():
        np.maximum.at(flat_height, labels[away > 0], away[away > 0])

    towards = _bfs_levels(low, no_flow, labels)
    fh = flat_height[np.clip(labels, 0, nlab)]
    flat_mask = np.where(
        towards > 0,
        np.where(away > 0, fh - away + 2 * towards, 2 * towards),
        away,  # cells only reached by the away gradient keep it
    )
    flat_mask[~lm & ~low] = 0
    if nodata is not None:
        flat_mask[elev == nodata] = -1
    return flat_mask, labels


def d8_flow_flats(flat_mask: np.ndarray, labels: np.ndarray,
                  dirs: np.ndarray) -> np.ndarray:
    """Fill NO_FLOW directions inside resolved flats
    (flat_resolution.hpp:96-116 + d8_masked_FlowDir :42-65)."""
    h, w = dirs.shape
    out = dirs.copy()
    if h < 3 or w < 3:
        return out
    core = np.s_[1:-1, 1:-1]
    best = flat_mask[core].copy()
    fd = np.zeros(best.shape, dtype=np.int64)
    for n in range(1, 9):
        src = (slice(1 + int(D8Y[n]), h - 1 + int(D8Y[n])),
               slice(1 + int(D8X[n]), w - 1 + int(D8X[n])))
        same = labels[src] == labels[core]
        nb = flat_mask[src]
        lower = same & (nb < best)
        tie = same & (nb == best) & (fd > 0) & (fd % 2 == 0) & (n % 2 == 1)
        take = lower | tie
        best = np.where(take, nb, best)
        fd = np.where(take, n, fd)
    sel = (out[core] == NO_FLOW) & (flat_mask[core] != -1)
    res = out[core]
    res[sel] = fd[sel].astype(out.dtype)
    out[core] = res
    return out


def nextafter_k(values: np.ndarray, k: np.ndarray) -> np.ndarray:
    """``np.nextafter(x, +inf)`` applied ``k`` times, in ONE pass:
    stepping a finite IEEE-754 double toward +inf is +1 on its
    sign-magnitude bit pattern, so k steps are one add on the monotone
    uint64 mapping (positive: set sign bit; negative: invert all bits).
    The flat-mask levels grow with the flat's cell diameter, so the
    repeated-masking loop was O(diameter x cells) — quadratic on the
    big flats the webtext DEMs produce.  -0.0 is normalized to +0.0
    first (numerically identical; avoids the one-ulp corner where the
    mapping would skip -0.0 on the way up)."""
    v = values.astype(np.float64, copy=True)
    v[v == 0.0] = 0.0
    u = v.view(np.uint64)
    sign = np.uint64(1 << 63)
    mono = np.where(u & sign == 0, u | sign, ~u)
    mono = mono + k.astype(np.uint64)
    back = np.where(mono & sign != 0, mono ^ sign, ~mono)
    return back.view(np.float64)


def d8_flats_alter_dem(flat_mask: np.ndarray, labels: np.ndarray,
                       elev: np.ndarray) -> np.ndarray:
    """Apply flat_mask as nextafter increments
    (flat_resolution.hpp:545-582); interior cells only."""
    out = elev.astype(np.float64).copy()
    todo = flat_mask.copy()
    todo[labels == 0] = 0
    todo[todo < 0] = 0
    todo[0, :] = 0
    todo[-1, :] = 0
    todo[:, 0] = 0
    todo[:, -1] = 0
    sel = todo > 0
    if sel.any():
        out[sel] = nextafter_k(out[sel], todo[sel])
    return out


def resolve_flats_pipeline(elev: np.ndarray, nodata: float | None = None,
                           alter: bool = False):
    """barnes_flat_resolution_d8 (flat_resolution.hpp:587-605)."""
    from .d8 import d8_flow_directions

    dirs = d8_flow_directions(elev, nodata)
    flat_mask, labels = resolve_flats(elev, dirs, nodata)
    if alter:
        new_elev = d8_flats_alter_dem(flat_mask, labels, elev)
        return d8_flow_directions(new_elev, nodata), new_elev
    return d8_flow_flats(flat_mask, labels, dirs), elev.astype(np.float64)
