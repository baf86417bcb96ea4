"""Priority-Flood depression-filling kernels.

* ``priority_flood_fill`` — single-grid fill, semantics of
  ``PriorityFlood_Barnes2014`` (reference
  ``include/richdem/depressions/Barnes2014.hpp:230-304``): seed the grid
  perimeter into a min-PQ, pop lowest, raise lower neighbours to the pop
  level; a plain FIFO handles cells at-or-below the current level.
* ``priority_flood_fill_epsilon`` — adds a ``np.nextafter`` ascending
  gradient so every cell drains (``Barnes2014.hpp:335-420``).
* ``fill_tile_labels`` — round 1 of the tiled two-pass fill (Barnes 2016;
  ``programs/parallel_priority_flood/main.cpp:276-313``): per-tile
  watershed-labelled fill emitting the spillover graph
  ``(label_a, label_b, min saddle elev)`` with ocean label 1 for
  off-DEM / NoData drainage.
* ``graph_priority_flood`` — the aggregated Priority-Flood over the merged
  label graph (``main.cpp:498-545``), run driver-side.

Labels: 1 = ocean (drains off the DEM), >=2 = watershed labels local to the
tile (callers offset them into a global namespace).
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


def _neigh_slots(topology: str):
    if topology == TOPO_D8:
        return range(1, 9)
    return (1, 3, 5, 7)  # D4 = W,N,E,S slots of the D8 numbering


def priority_flood_fill(
    elev: np.ndarray,
    nodata: float | None = None,
    topology: str = TOPO_D8,
    epsilon: bool = False,
) -> np.ndarray:
    """Fill depressions; returns a new float64 grid.

    NoData cells keep their value and act as drains (assumed lower than all
    data per Barnes2014.hpp:33-36).
    """
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
    return priority_flood_fill(elev, nodata, topology, epsilon=True)


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
    """Round 1 of the two-pass tiled fill (Barnes 2016).

    Watershed-labelled Priority-Flood over one tile.  Every tile-perimeter
    cell is a seed; each flood gets a label; floods meeting record the
    spillover saddle.  Cells on a *global* DEM edge (per ``edge_mask``
    bits GRID_LEFT/TOP/RIGHT/BOTTOM) or adjacent to NoData connect their
    label to the ocean (label 1) at their water level.

    Returns (filled, labels, edges) where edges is a dict
    ``{(la, lb): min_saddle_elev}`` with la < lb, labels are
    ``label_base + local_index`` (>= label_base) or 1 for ocean/NoData.
    """
    h, w = elev.shape
    filled = elev.astype(np.float64).copy()

    # fast path: a constant tile (flat ocean in sparse webtext rasters)
    # is one watershed, already filled, with no internal spillover; a
    # global-DEM-edge side still drains to the ocean at the tile level
    if elev.size and (nodata is None or not (elev == nodata).any()) \
            and filled.min() == filled.max():
        labels = np.full((h, w), label_base, dtype=np.int64)
        edges = {}
        if edge_mask:
            edges[(OCEAN, label_base)] = float(filled.flat[0])
        return filled, labels, edges

    labels = np.zeros((h, w), dtype=np.int64)
    closed = np.zeros((h, w), dtype=bool)
    nd_mask = (elev == nodata) if nodata is not None else np.zeros(
        (h, w), dtype=bool
    )
    labels[nd_mask] = OCEAN
    closed[nd_mask] = True

    edges: dict[tuple[int, int], float] = {}

    def add_edge(a: int, b: int, z: float) -> None:
        if a == b:
            return
        k = (a, b) if a < b else (b, a)
        if k not in edges or z < edges[k]:
            edges[k] = z

    open_pq: list[tuple[float, int, int, int, int]] = []
    seq = 0
    perim: list[tuple[int, int]] = [(x, 0) for x in range(w)]
    perim += [(x, h - 1) for x in range(w)]
    perim += [(0, y) for y in range(1, h - 1)]
    perim += [(w - 1, y) for y in range(1, h - 1)]
    seeded = np.zeros((h, w), dtype=bool)
    for x, y in perim:
        if not nd_mask[y, x]:
            heapq.heappush(open_pq, (filled[y, x], seq, x, y, 0))
            seeded[y, x] = True
            seq += 1
    # data cells adjacent to NoData drain through it -> they are seeds too
    # (NoData acts as ocean, Barnes2014.hpp:33-36)
    if nd_mask.any():
        adj = np.zeros((h, w), dtype=bool)
        for n in _neigh_slots(topology):
            sy, sx = int(D8Y[n]), int(D8X[n])
            src = nd_mask[
                max(0, -sy) : h - max(0, sy), max(0, -sx) : w - max(0, sx)
            ]
            adj[
                max(0, sy) : h - max(0, -sy), max(0, sx) : w - max(0, -sx)
            ] |= src
        for y, x in zip(*np.nonzero(adj & ~nd_mask & ~seeded)):
            heapq.heappush(
                open_pq, (filled[y, x], seq, int(x), int(y), 0)
            )
            seq += 1

    next_label = label_base
    slots = list(_neigh_slots(topology))
    offs = [(int(D8X[n]), int(D8Y[n])) for n in slots]
    # close-at-push discipline for flood expansion (the reference's
    # improved PF, Barnes2014.hpp:258-276) — but SEEDS stay open so an
    # earlier flood can claim them (a flood only ever reaches a seed at
    # zc <= its elevation, else the seed's own entry popped first), which
    # keeps the label count minimal: one label per perimeter *watershed*,
    # not per perimeter cell.  Claimed seeds' duplicate entries are
    # skipped at pop.
    lab = labels  # local aliases for the hot loop
    fil = filled
    cl = closed
    nd = nd_mask
    pit: list[tuple[float, int, int, int]] = []
    pit_head = 0
    while open_pq or pit_head < len(pit):
        if pit_head < len(pit):
            z, x, y, lbl = pit[pit_head]
            pit_head += 1
        else:
            z, _, x, y, lbl = heapq.heappop(open_pq)
            if lbl == 0:
                if cl[y, x]:
                    continue  # seed already claimed by a flood
                cl[y, x] = True
        if lbl == 0:
            lbl = next_label
            next_label += 1
            lab[y, x] = lbl
        zc = z
        for dx, dy in offs:
            nx, ny = x + dx, y + dy
            if nx < 0 or nx >= w or ny < 0 or ny >= h:
                continue
            if cl[ny, nx]:
                if nd[ny, nx]:
                    add_edge(lbl, OCEAN, zc)  # drains through NoData here
                    continue
                lb = int(lab[ny, nx])
                if lb != lbl and lb != 0:
                    zn = fil[ny, nx]
                    add_edge(lbl, lb, zc if zc >= zn else zn)
                continue
            cl[ny, nx] = True
            lab[ny, nx] = lbl
            ne = fil[ny, nx]
            if ne <= zc:
                fil[ny, nx] = zc
                pit.append((zc, nx, ny, lbl))
            else:
                heapq.heappush(open_pq, (ne, seq, nx, ny, lbl))
                seq += 1

    # global-DEM-edge cells drain off-grid at their own (filled) level
    sides = []
    if edge_mask & GRID_TOP:
        sides.append((labels[0, :], filled[0, :]))
    if edge_mask & GRID_BOTTOM:
        sides.append((labels[-1, :], filled[-1, :]))
    if edge_mask & GRID_LEFT:
        sides.append((labels[:, 0], filled[:, 0]))
    if edge_mask & GRID_RIGHT:
        sides.append((labels[:, -1], filled[:, -1]))
    for lbl_row, z_row in sides:
        for lbl, z in zip(lbl_row.tolist(), z_row.tolist()):
            if lbl != OCEAN and lbl != 0:
                add_edge(int(lbl), OCEAN, float(z))

    return filled, labels, edges


def graph_priority_flood(
    edges: Iterable[tuple[int, int, float]]
) -> dict[int, float]:
    """Aggregated Priority-Flood over the merged label graph
    (programs/parallel_priority_flood/main.cpp:498-545).

    Seeds the ocean label 1 at -inf; returns ``graph_elev[label]`` = the
    level watershed `label` fills to before it can drain to the ocean.
    """
    adj: dict[int, list[tuple[int, float]]] = {}
    for a, b, z in edges:
        adj.setdefault(a, []).append((b, z))
        adj.setdefault(b, []).append((a, z))
    elev: dict[int, float] = {}
    pq: list[tuple[float, int]] = [(-np.inf, OCEAN)]
    while pq:
        z, l = heapq.heappop(pq)
        if l in elev:
            continue
        elev[l] = z
        for l2, saddle in adj.get(l, ()):
            if l2 not in elev:
                heapq.heappush(pq, (max(z, saddle), l2))
    return elev
