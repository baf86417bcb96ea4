"""Priority-Flood depression-filling kernels — vectorized.

The per-cell heapq flood of round 1 is replaced by an exact, fully
vectorized decomposition (NumPy array ops only, no per-cell Python):

1. **Steepest-descent basins.** Every data cell points at its lowest
   neighbour (strictly lower); plateau cells (no strictly-lower
   neighbour) are resolved per connected component to an equal-elevation
   exit cell, bottom plateaus become basin roots.  Pointer doubling
   (log₂ rounds of ``parent = parent[parent]``) resolves each cell's
   basin root.  Basins have the *monotone-path property*: every cell has
   an in-basin grid path to its root along which elevation never rises
   above the cell's own — the same property Barnes 2016 uses to prove
   the tile-graph contraction exact (``programs/parallel_priority_flood/
   main.cpp:498-545``); we apply it one level down, at cell→basin
   granularity inside a tile.
2. **Basin-graph Priority-Flood.** Adjacent-basin saddles
   (``min over boundary pairs of max(elev_a, elev_b)``) and drain edges
   (tile-perimeter cells and NoData-adjacent cells drain at their own
   elevation, Barnes2014.hpp:33-36) feed a tiny heapq Priority-Flood
   over the basin graph — O(basins log basins), not O(cells log cells).
3. ``filled = max(elev, level[basin])`` — exact because the contraction
   preserves minimax distances (see step 1).

Public kernels:

* ``priority_flood_fill`` — single-grid fill, semantics of
  ``PriorityFlood_Barnes2014`` (reference
  ``include/richdem/depressions/Barnes2014.hpp:230-304``).
* ``priority_flood_fill_epsilon`` — ``np.nextafter`` ascending gradient
  so every cell drains (``Barnes2014.hpp:335-420``); path-length
  dependent, so it stays on the sequential PQ kernel.
* ``fill_tile_labels`` — round 1 of the tiled two-pass fill (Barnes
  2016; ``programs/parallel_priority_flood/main.cpp:276-313``):
  per-tile fill + watershed labels (one per perimeter watershed = the
  terminal basin on each basin's drain path) + spillover graph
  ``(label_a, label_b, min saddle elev)`` with ocean label 1 for
  off-DEM / NoData drainage.
* ``graph_priority_flood`` — the aggregated Priority-Flood over the
  merged label graph (``main.cpp:498-545``), run driver-side.

Labels: 1 = ocean (drains off the DEM), >=2 = watershed labels local to
the tile (callers offset them into a global namespace).
"""

from __future__ import annotations

import heapq
from typing import Iterable

import numpy as np

from ..constants import (
    D8X,
    D8Y,
    GRID_BOTTOM,
    GRID_LEFT,
    GRID_RIGHT,
    GRID_TOP,
    TOPO_D8,
)

OCEAN = 1
_BIG = np.iinfo(np.int64).max


def _neigh_slots(topology: str):
    if topology == TOPO_D8:
        return range(1, 9)
    return (1, 3, 5, 7)  # D4 = W,N,E,S slots of the D8 numbering


def _shift(a: np.ndarray, dy: int, dx: int, fill) -> np.ndarray:
    """out[y, x] = a[y + dy, x + dx], `fill` outside the grid."""
    h, w = a.shape
    out = np.full_like(a, fill)
    ys_d = slice(max(0, -dy), h - max(0, dy))
    xs_d = slice(max(0, -dx), w - max(0, dx))
    ys_s = slice(max(0, dy), h - max(0, -dy))
    xs_s = slice(max(0, dx), w - max(0, -dx))
    out[ys_d, xs_d] = a[ys_s, xs_s]
    return out


def _group_min(keys: np.ndarray, vals: np.ndarray):
    """(unique_keys, min val per key) via sort + reduceat (no .at)."""
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    vs = vals[order]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    return ks[starts], np.minimum.reduceat(vs, starts)


def _cross_min_edges(lbl: np.ndarray, vals: np.ndarray, data: np.ndarray,
                     topology: str):
    """For each unordered pair of adjacent different labels, the min over
    boundary cell pairs of max(vals_a, vals_b) — the watershed saddle
    (``HandleEdge``, parallel_priority_flood/main.cpp:344-372)."""
    h, w = lbl.shape
    n = h * w
    slots_f = (5, 6, 7, 8) if topology == TOPO_D8 else (5, 7)  # E,SE,S,SW
    keys = []
    zs = []
    for nslot in slots_f:
        dy, dx = int(D8Y[nslot]), int(D8X[nslot])
        sl = _shift(lbl, dy, dx, np.int64(-1))
        sv = _shift(vals, dy, dx, np.nan)
        sd = _shift(data, dy, dx, False)
        m = data & sd & (sl != lbl)
        if not m.any():
            continue
        a = lbl[m]
        b = sl[m]
        z = np.maximum(vals[m], sv[m])
        keys.append(np.minimum(a, b) * n + np.maximum(a, b))
        zs.append(z)
    if not keys:
        e = np.empty(0, dtype=np.int64)
        return e, e, np.empty(0, dtype=np.float64)
    uk, zm = _group_min(np.concatenate(keys), np.concatenate(zs))
    return uk // n, uk % n, zm


def _graph_pf(edges: Iterable[tuple], ocean):
    """Priority-Flood over a label graph seeded at `ocean` (-inf).
    Returns (level, terminal): level[l] = water level l fills to before
    draining; terminal[l] = the first non-ocean label on l's drain path
    (main.cpp:498-545)."""
    adj: dict = {}
    for a, b, z in edges:
        adj.setdefault(a, []).append((b, z))
        adj.setdefault(b, []).append((a, z))
    level: dict = {}
    term: dict = {}
    pq = [(-np.inf, ocean, ocean)]
    while pq:
        z, l, t = heapq.heappop(pq)
        if l in level:
            continue
        level[l] = z
        term[l] = t
        for l2, saddle in adj.get(l, ()):
            if l2 not in level:
                heapq.heappush(
                    pq,
                    (z if saddle <= z else saddle, l2,
                     l2 if l == ocean else t),
                )
    return level, term


class _BasinSolve:
    __slots__ = ("filled", "term", "nd_mask", "data", "roots_nd")

    def __init__(self, filled, term, nd_mask, data, roots_nd):
        self.filled = filled          # (h,w) float64; nodata kept verbatim
        self.term = term              # flat int64 terminal basin root; -2 @nd
        self.nd_mask = nd_mask
        self.data = data
        self.roots_nd = roots_nd      # data cells adjacent to NoData


def _basin_solve(
    elev: np.ndarray, nodata: float | None, topology: str
) -> _BasinSolve:
    h, w = elev.shape
    n = h * w
    work = elev.astype(np.float64, copy=True)
    nd = (
        (elev == nodata)
        if nodata is not None
        else np.zeros((h, w), dtype=bool)
    )
    data = ~nd
    wval = np.where(nd, -np.inf, work)  # NoData drains below everything
    slots = _neigh_slots(topology)

    # --- steepest-descent pointer per cell; for plateau cells (no
    # strictly-lower neighbour) link to any *smaller-flat-index*
    # equal-elevation neighbour — strictly index-decreasing, hence
    # acyclic.  This may fragment a plateau into several sub-basins, but
    # adjacent sub-basins get saddle edges at the plateau elevation, so
    # the basin-graph Priority-Flood merges them exactly (no CCL needed).
    best = np.full((h, w), np.inf)
    best_off = np.zeros((h, w), dtype=np.int64)
    eq_cand = np.full((h, w), _BIG, dtype=np.int64)
    flat_idx = np.arange(n, dtype=np.int64).reshape(h, w)
    for nslot in slots:
        dy, dx = int(D8Y[nslot]), int(D8X[nslot])
        sv = _shift(wval, dy, dx, np.inf)
        upd = sv < best
        if upd.any():
            best[upd] = sv[upd]
            best_off[upd] = dy * w + dx
        off = dy * w + dx
        if off < 0:  # only N-row/W neighbours have smaller flat index
            eq = sv == work
            if eq.any():
                eq_cand[eq] = np.minimum(eq_cand[eq], flat_idx[eq] + off)
    pointered = data & (best < work) & np.isfinite(best)
    roots_nd = data & np.isneginf(best)        # drain straight into NoData
    plateau = data & ~pointered & ~roots_nd    # no strictly-lower neighbour

    parent = flat_idx.copy()
    parent[pointered] = (flat_idx + best_off)[pointered]
    plink = plateau & (eq_cand < _BIG)
    if plink.any():
        parent[plink] = eq_cand[plink]

    # --- pointer doubling to basin roots --------------------------------
    par = parent.ravel()
    while True:
        nxt = par[par]
        if np.array_equal(nxt, par):
            break
        par = nxt
    root = par  # flat root per cell (NoData cells: self)

    # --- basin graph: drain edges + adjacent-basin saddles ---------------
    perim = np.zeros((h, w), dtype=bool)
    perim[0, :] = True
    perim[-1, :] = True
    perim[:, 0] = True
    perim[:, -1] = True
    drains = (perim & data) | roots_nd
    dsel = np.flatnonzero(drains.ravel())
    edges: list[tuple] = []
    if dsel.size:
        ur, dmin = _group_min(root[dsel], work.ravel()[dsel])
        edges.extend(
            (-1, r, z) for r, z in zip(ur.tolist(), dmin.tolist())
        )
    ea, eb, ez = _cross_min_edges(root.reshape(h, w), work, data, topology)
    edges.extend(zip(ea.tolist(), eb.tolist(), ez.tolist()))

    level, term = _graph_pf(edges, ocean=-1)

    # --- filled = max(elev, level[basin]); terminal basin per cell -------
    filled = work.ravel().copy()
    tflat = np.full(n, -2, dtype=np.int64)
    csel = np.flatnonzero(data.ravel())
    if csel.size:
        ub = np.unique(root[csel])
        lv = np.array([level.get(int(r), -np.inf) for r in ub])
        tm = np.array(
            [term.get(int(r), int(r)) for r in ub], dtype=np.int64
        )
        bi = np.searchsorted(ub, root[csel])
        filled[csel] = np.maximum(filled[csel], lv[bi])
        tflat[csel] = tm[bi]
    return _BasinSolve(
        filled.reshape(h, w), tflat, nd, data, roots_nd
    )


def priority_flood_fill(
    elev: np.ndarray,
    nodata: float | None = None,
    topology: str = TOPO_D8,
    epsilon: bool = False,
) -> np.ndarray:
    """Fill depressions; returns a new float64 grid.

    NoData cells keep their value and act as drains (assumed lower than
    all data per Barnes2014.hpp:33-36).  Vectorized basin-graph solve;
    ``epsilon=True`` routes through the sequential PQ kernel (the
    gradient depends on flood path order).
    """
    if epsilon:
        return priority_flood_fill_pq(elev, nodata, topology, epsilon=True)
    if elev.size == 0:
        return elev.astype(np.float64).copy()
    return _basin_solve(elev, nodata, topology).filled


def priority_flood_fill_pq(
    elev: np.ndarray,
    nodata: float | None = None,
    topology: str = TOPO_D8,
    epsilon: bool = False,
) -> np.ndarray:
    """Sequential reference kernel (Barnes2014.hpp:230-304 improved PF):
    perimeter-seeded min-PQ with a plain FIFO for cells at-or-below the
    water level.  Kept for the epsilon gradient and as the differential
    oracle for the vectorized kernel."""
    h, w = elev.shape
    out = elev.astype(np.float64).copy()
    closed = np.zeros((h, w), dtype=bool)
    if nodata is not None:
        closed |= elev == nodata

    open_pq: list[tuple[float, int, int, int]] = []
    seq = 0
    for x in range(w):
        for y in (0, h - 1):
            if not closed[y, x]:
                closed[y, x] = True
                heapq.heappush(open_pq, (out[y, x], seq, x, y))
                seq += 1
    for y in range(1, h - 1):
        for x in (0, w - 1):
            if not closed[y, x]:
                closed[y, x] = True
                heapq.heappush(open_pq, (out[y, x], seq, x, y))
                seq += 1
    # data cells adjacent to NoData also drain through it: seed them too
    if nodata is not None:
        nd = elev == nodata
        if nd.any():
            adj = np.zeros((h, w), dtype=bool)
            for n in _neigh_slots(topology):
                sy, sx = D8Y[n], D8X[n]
                src = nd[
                    max(0, -sy) : h - max(0, sy), max(0, -sx) : w - max(0, sx)
                ]
                adj[
                    max(0, sy) : h - max(0, -sy), max(0, sx) : w - max(0, -sx)
                ] |= src
            for y, x in zip(*np.nonzero(adj & ~closed)):
                closed[y, x] = True
                heapq.heappush(open_pq, (out[y, x], seq, int(x), int(y)))
                seq += 1

    pit: list[tuple[float, int, int]] = []  # FIFO (deque-free: index pointer)
    pit_head = 0
    slots = list(_neigh_slots(topology))
    while open_pq or pit_head < len(pit):
        if pit_head < len(pit):
            z, x, y = pit[pit_head]
            pit_head += 1
        else:
            z, _, x, y = heapq.heappop(open_pq)
        for n in slots:
            nx, ny = x + D8X[n], y + D8Y[n]
            if nx < 0 or nx >= w or ny < 0 or ny >= h or closed[ny, nx]:
                continue
            closed[ny, nx] = True
            ne = out[ny, nx]
            if epsilon:
                nz = np.nextafter(z, np.inf)
                if ne <= nz:
                    out[ny, nx] = nz
                    pit.append((nz, nx, ny))
                else:
                    heapq.heappush(open_pq, (ne, seq, nx, ny))
                    seq += 1
            else:
                if ne <= z:
                    out[ny, nx] = z
                    pit.append((z, nx, ny))
                else:
                    heapq.heappush(open_pq, (ne, seq, nx, ny))
                    seq += 1
    return out


def priority_flood_fill_epsilon(
    elev: np.ndarray, nodata: float | None = None, topology: str = TOPO_D8
) -> np.ndarray:
    return priority_flood_fill_pq(elev, nodata, topology, epsilon=True)


def has_depressions(elev: np.ndarray, nodata: float | None = None) -> bool:
    """True iff filling would change any cell (Barnes2014.hpp:43-104)."""
    return bool((priority_flood_fill(elev, nodata) != np.where(
        elev == nodata, elev, elev.astype(np.float64)
    )).any()) if nodata is not None else bool(
        (priority_flood_fill(elev) != elev).any()
    )


def pit_mask(elev: np.ndarray, nodata: float | None = None) -> np.ndarray:
    """1 = cell in a depression, 0 = not, 3 = NoData
    (Barnes2014.hpp:593-676)."""
    filled = priority_flood_fill(elev, nodata)
    out = (filled != elev).astype(np.uint8)
    if nodata is not None:
        out[elev == nodata] = 3
    return out


def fill_tile_labels(
    elev: np.ndarray,
    nodata: float | None,
    edge_mask: int,
    label_base: int,
    topology: str = TOPO_D8,
):
    """Round 1 of the two-pass tiled fill (Barnes 2016), vectorized.

    Per-tile fill (tile perimeter + NoData as drains) + watershed labels
    + spillover graph.  Labels are the *terminal basins*: each
    steepest-descent basin's drain path (its chain of spill saddles in
    the in-tile basin graph) ends at a basin holding a drain cell; all
    basins sharing that terminal form one watershed label — one label
    per perimeter watershed, exactly the granularity the reference's
    flood labelling produces (main.cpp:276-313).  Cells on a *global*
    DEM edge (per ``edge_mask`` bits) or adjacent to NoData connect
    their label to the ocean (label 1) at their filled level.

    Returns (filled, labels, edges) where edges is a dict
    ``{(la, lb): min_saddle_elev}`` with la < lb, labels are
    ``label_base + local_rank`` (>= label_base) or 1 for ocean/NoData.
    """
    h, w = elev.shape
    n = h * w
    filled0 = elev.astype(np.float64).copy()
    if n == 0:
        return filled0, np.zeros((h, w), dtype=np.int64), {}

    # fast path: a constant tile (flat ocean in sparse webtext rasters)
    # is one watershed, already filled, with no internal spillover; a
    # global-DEM-edge side still drains to the ocean at the tile level
    if elev.size and (nodata is None or not (elev == nodata).any()) \
            and filled0.min() == filled0.max():
        labels = np.full((h, w), label_base, dtype=np.int64)
        edges = {}
        if edge_mask:
            edges[(OCEAN, label_base)] = float(filled0.flat[0])
        return filled0, labels, edges

    sol = _basin_solve(elev, nodata, topology)
    filled = sol.filled
    data = sol.data

    # --- coarse labels: dense rank of the terminal basin ----------------
    tflat = sol.term
    dsel = tflat >= 0
    ut = np.unique(tflat[dsel])
    rank = np.zeros(n, dtype=np.int64)  # dense 0..k-1 for data cells
    rank[dsel] = np.searchsorted(ut, tflat[dsel])
    labels_flat = np.full(n, OCEAN, dtype=np.int64)
    labels_flat[dsel] = label_base + rank[dsel]
    labels = labels_flat.reshape(h, w)

    # --- in-tile spillover edges on the filled surface ------------------
    ea, eb, ez = _cross_min_edges(
        rank.reshape(h, w), filled, data, topology
    )
    edges: dict[tuple[int, int], float] = {
        (int(label_base + a), int(label_base + b)): float(z)
        for a, b, z in zip(ea, eb, ez)
    }

    def add_ocean(lbls: np.ndarray, zs: np.ndarray) -> None:
        if lbls.size == 0:
            return
        ul, uz = _group_min(lbls, zs)
        for l, z in zip(ul, uz):
            k = (OCEAN, int(l))
            if k not in edges or z < edges[k]:
                edges[k] = float(z)

    # global-DEM-edge cells drain off-grid at their own (filled) level
    sides = []
    if edge_mask & GRID_TOP:
        sides.append((labels[0, :], filled[0, :], data[0, :]))
    if edge_mask & GRID_BOTTOM:
        sides.append((labels[-1, :], filled[-1, :], data[-1, :]))
    if edge_mask & GRID_LEFT:
        sides.append((labels[:, 0], filled[:, 0], data[:, 0]))
    if edge_mask & GRID_RIGHT:
        sides.append((labels[:, -1], filled[:, -1], data[:, -1]))
    for lbl_row, z_row, d_row in sides:
        add_ocean(lbl_row[d_row], z_row[d_row])
    # data cells adjacent to NoData drain through it (ocean) at their level
    if sol.roots_nd.any():
        m = sol.roots_nd.ravel()
        add_ocean(labels_flat[m], filled.ravel()[m])

    return filled, labels, edges


def graph_priority_flood(
    edges: Iterable[tuple[int, int, float]]
) -> dict[int, float]:
    """Aggregated Priority-Flood over the merged label graph
    (programs/parallel_priority_flood/main.cpp:498-545).

    Seeds the ocean label 1 at -inf; returns ``graph_elev[label]`` = the
    level watershed `label` fills to before it can drain to the ocean.
    """
    return _graph_pf(edges, OCEAN)[0]


def priority_flood_max_dep(
    elev: np.ndarray,
    max_dep_size: int,
    topology: str = TOPO_D8,
) -> np.ndarray:
    """Fill only small depressions (PriorityFlood_Barnes2014_max_dep,
    Barnes2014.hpp:844-931) — exact port of the reference semantics:
    cells strictly below the current water level accumulate in a
    pit-queue *episode*; when the pit queue drains, the accumulated
    shell is raised to the episode rim iff it has <= max_dep_size cells.
    The reference measures the marginal shell per episode (nested pits
    flush separately, lowest saddle first) and never special-cases
    NoData; traversal never depends on the raises, so outputs are
    deterministic."""
    h, w = elev.shape
    out = elev.astype(np.float64).copy()
    closed = np.zeros((h, w), dtype=bool)
    open_pq: list[tuple[float, int, int, int]] = []
    seq = 0
    for x in range(w):
        for y in (0, h - 1):
            if not closed[y, x]:
                closed[y, x] = True
                heapq.heappush(open_pq, (out[y, x], seq, x, y))
                seq += 1
    for y in range(1, h - 1):
        for x in (0, w - 1):
            if not closed[y, x]:
                closed[y, x] = True
                heapq.heappush(open_pq, (out[y, x], seq, x, y))
                seq += 1

    pit: list[tuple[float, int, int]] = []
    pit_head = 0
    dep_cells: list[tuple[int, int]] = []
    dep_elev = 0.0
    slots = list(_neigh_slots(topology))
    while open_pq or pit_head < len(pit):
        if pit_head < len(pit):
            z, x, y = pit[pit_head]
            pit_head += 1
            dep_cells.append((x, y))
        else:
            z, _, x, y = heapq.heappop(open_pq)
            if len(dep_cells) <= max_dep_size:
                for px, py in dep_cells:
                    out[py, px] = dep_elev
            dep_cells.clear()
            pit.clear()
            pit_head = 0
        for n in slots:
            nx, ny = x + int(D8X[n]), y + int(D8Y[n])
            if nx < 0 or nx >= w or ny < 0 or ny >= h or closed[ny, nx]:
                continue
            closed[ny, nx] = True
            if out[ny, nx] < z:
                pit.append((z, nx, ny))
                dep_elev = z
            else:
                heapq.heappush(open_pq, (out[ny, nx], seq, nx, ny))
                seq += 1
    return out
