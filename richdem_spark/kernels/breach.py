"""Depression breaching — Lindsay 2016 hybrid breaching/filling.

Re-derivation of ``include/richdem/depressions/Lindsay2016.hpp``:
* ``CompleteBreaching_Lindsay2016`` (:48-178) — carve every pit a
  drainage path along Priority-Flood backlinks.
* ``Lindsay2016`` full modes (:227-423) — COMPLETE / SELECTIVE /
  CONSTRAINED with max path length/depth, optional epsilon gradients and
  optional post-fill.

The priority queue is the stable ``GridCellZk_low_pq`` (ties broken by
insertion order, ``common/grid_cell.hpp:95-122``) — reproduced with a
(z, k) heap key and row-major seeding order, which the golden fixtures
depend on.

Distribution note: no published tiled breaching algorithm exists in the
reference (SURVEY.md §7.3).  The Spark operator (ops/breach.py) carves
along the drainage tree of the filled surface instead of the
insertion-order backlinks — :func:`breach_drainage_tree` below is its
serial twin; :func:`lindsay2016` stays as the reference-exact
stable-insertion-order port for golden parity.
"""

from __future__ import annotations

import heapq

import numpy as np

from ..constants import D8X, D8Y

COMPLETE = "complete"
SELECTIVE = "selective"
CONSTRAINED = "constrained"

_UNVISITED, _VISITED, _EDGE = 0, 1, 2
_NO_BACK_LINK = -1


def lindsay2016(
    dem_in: np.ndarray,
    nodata: float | None = None,
    mode: str = COMPLETE,
    eps_gradients: bool = False,
    fill_depressions: bool = False,
    max_path_len: int = 2**31,
    max_depth: float = np.inf,
) -> np.ndarray:
    h, w = dem_in.shape
    dem = dem_in.astype(np.float64).ravel().copy()
    nd = (
        (dem_in == nodata).ravel()
        if nodata is not None
        else np.zeros(h * w, bool)
    )
    visited = np.zeros(h * w, dtype=np.uint8)
    pits = np.zeros(h * w, dtype=bool)
    backlinks = np.full(h * w, _NO_BACK_LINK, dtype=np.int64)

    grid = dem.reshape(h, w)
    ndg = nd.reshape(h, w)

    # lowest data-neighbour per interior cell + nodata adjacency, vectorized
    lowest = np.full((h, w), np.inf)
    nd_adj = np.zeros((h, w), bool)
    for n in range(1, 9):
        dx, dy = int(D8X[n]), int(D8Y[n])
        ys_d = slice(max(0, -dy), h - max(0, dy))
        xs_d = slice(max(0, -dx), w - max(0, dx))
        ys_s = slice(max(0, dy), h + min(0, dy))
        xs_s = slice(max(0, dx), w + min(0, dx))
        nsrc = grid[ys_s, xs_s]
        ndn = ndg[ys_s, xs_s]
        nd_adj[ys_d, xs_d] |= ndn
        lowest[ys_d, xs_d] = np.minimum(
            lowest[ys_d, xs_d], np.where(ndn, np.inf, nsrc)
        )

    pq: list[tuple[float, int, int]] = []  # (z, k, flat_index)
    k = 0
    # row-major seeding preserves the stable-PQ tie order the reference's
    # GridCellZk relies on (tests.cpp:152-230)
    edge_mask = np.zeros((h, w), bool)
    edge_mask[0, :] = edge_mask[-1, :] = True
    edge_mask[:, 0] = edge_mask[:, -1] = True
    total_pits = 0
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if nd[i]:
                continue
            if edge_mask[y, x] or nd_adj[y, x]:
                heapq.heappush(pq, (dem[i], k, i))
                k += 1
                visited[i] = _EDGE
                continue
            lo = lowest[y, x]
            if dem[i] < lo:
                dem[i] = (
                    np.nextafter(lo, -np.inf) if eps_gradients else lo
                )
            if dem[i] <= lo:
                pits[i] = True
                total_pits += 1

    flood_array: list[int] = []
    offs = [(int(D8X[n]), int(D8Y[n])) for n in range(1, 9)]
    lowest_f = -np.inf
    # Pristine surface AFTER the pit-raise preprocessing.  Selective and
    # constrained traces measure path length/depth against this surface
    # and carve min-accumulated against it, which makes re-traces over a
    # shared channel (flat-bottomed pits emit one trace per pit cell)
    # idempotent.  This is the semantics that reproduces ALL the
    # reference goldens including
    # tests/breaching/testdem1.constrained-len4-depth3.out; the in-tree
    # constrained loop (Lindsay2016.hpp:363-374, "TODO: Refine this",
    # `dem(cc) -= pathdepth`) does NOT reproduce its own fixture — it
    # drops the first-popped pit cell to orig-pathdepth (verified by a
    # direct port), which the fixture contradicts.
    orig = dem.copy()
    while pq:
        z, _, ci = heapq.heappop(pq)
        cy, cx = divmod(ci, w)

        if pits[ci]:
            cc = ci
            target = dem[ci]
            if mode == COMPLETE:
                while cc != _NO_BACK_LINK and dem[cc] >= target:
                    dem[cc] = target
                    cc = backlinks[cc]
                    if eps_gradients:
                        target = np.nextafter(target, -np.inf)
            else:
                pathlen = 0
                pathdepth = lowest_f
                while cc != _NO_BACK_LINK and orig[cc] >= target:
                    pathdepth = max(pathdepth, orig[cc] - target)
                    cc = backlinks[cc]
                    if eps_gradients:
                        target = np.nextafter(target, -np.inf)
                    pathlen += 1
                cc = ci
                target = dem[ci]
                if pathlen <= max_path_len and pathdepth <= max_depth:
                    while cc != _NO_BACK_LINK and orig[cc] >= target:
                        dem[cc] = min(dem[cc], target)
                        cc = backlinks[cc]
                        if eps_gradients:
                            target = np.nextafter(target, -np.inf)
                elif mode == CONSTRAINED:
                    # carve each path cell at most max_depth below its
                    # pristine elevation, never below the drainage target
                    # (Lindsay 2016 paper semantics; fixture-exact)
                    while cc != _NO_BACK_LINK and orig[cc] >= target:
                        dem[cc] = min(
                            dem[cc], max(orig[cc] - max_depth, target)
                        )
                        if eps_gradients:
                            target = np.nextafter(target, -np.inf)
                        cc = backlinks[cc]
            total_pits -= 1
            if total_pits == 0:
                break

        for dx, dy in offs:
            nx, ny = cx + dx, cy + dy
            if nx < 0 or nx >= w or ny < 0 or ny >= h:
                continue
            ni = ny * w + nx
            if nd[ni] or visited[ni] != _UNVISITED:
                continue
            heapq.heappush(pq, (dem[ni], k, ni))
            k += 1
            if fill_depressions:
                flood_array.append(ni)
            visited[ni] = _VISITED
            backlinks[ni] = ci

    if mode != COMPLETE and fill_depressions:
        for f in flood_array:
            parent = backlinks[f]
            if parent != _NO_BACK_LINK and dem[f] <= dem[parent]:
                dem[f] = (
                    np.nextafter(dem[parent], np.inf)
                    if eps_gradients
                    else dem[parent]
                )

    out = dem.reshape(h, w)
    if nodata is not None:
        out[dem_in == nodata] = nodata
    return out


def complete_breaching(dem, nodata=None, eps_gradients=False):
    """CompleteBreaching_Lindsay2016 (Lindsay2016.hpp:48-178)."""
    return lindsay2016(dem, nodata, COMPLETE, eps_gradients, False)


def breach_drainage_tree(
    dem_in: np.ndarray,
    nodata: float | None = None,
    mode: str = COMPLETE,
    eps_gradients: bool = False,
    fill_depressions: bool = False,
    max_path_len: int = 2**31,
    max_depth: float = np.inf,
) -> np.ndarray:
    """The engine's canonical breaching semantics — the serial twin of
    the distributed operator (ops/breach.py).

    Identical to :func:`lindsay2016` except the carve/measure walks
    follow the DRAINAGE TREE of the filled surface (D8 flow directions
    of the flat-resolved Priority-Flood fill of the pit-raised surface,
    NoData treated as -inf drains) instead of the reference's
    insertion-order Priority-Flood backlinks.  Both trees descend the
    filled surface to drainage; they differ only in which of several
    equally-valid breach channels is carved through tied ridges, and
    both reproduce all 7 reference goldens (tests/test_breach.py).  The
    drainage tree has seam-exact distributed twins (fill + flats ops),
    which is what makes the tiled operator provably tiling-invariant.
    """
    from .d8 import d8_flow_directions
    from .fill import priority_flood_fill
    from .flats import resolve_flats_pipeline

    h, w = dem_in.shape
    dem = dem_in.astype(np.float64).copy()
    nd = (dem_in == nodata) if nodata is not None else np.zeros(
        (h, w), bool)

    # pit-raise preprocessing + pit mask (same as lindsay2016 seeding)
    lowest = np.full((h, w), np.inf)
    nd_adj = np.zeros((h, w), bool)
    for n in range(1, 9):
        dx, dy = int(D8X[n]), int(D8Y[n])
        ys_d = slice(max(0, -dy), h - max(0, dy))
        xs_d = slice(max(0, -dx), w - max(0, dx))
        ys_s = slice(max(0, dy), h + min(0, dy))
        xs_s = slice(max(0, dx), w + min(0, dx))
        nd_adj[ys_d, xs_d] |= nd[ys_s, xs_s]
        lowest[ys_d, xs_d] = np.minimum(
            lowest[ys_d, xs_d],
            np.where(nd[ys_s, xs_s], np.inf, dem[ys_s, xs_s]),
        )
    edge = np.zeros((h, w), bool)
    edge[0, :] = edge[-1, :] = True
    edge[:, 0] = edge[:, -1] = True
    seed = (edge | nd_adj) & ~nd
    raised = dem.copy()
    cand = ~nd & ~seed & np.isfinite(lowest)
    below = cand & (dem < lowest)
    raised[below] = (np.nextafter(lowest[below], -np.inf)
                     if eps_gradients else lowest[below])
    pits = cand & (raised <= lowest)

    # canonical drainage tree
    surf = raised.copy()
    surf[nd] = -np.inf
    filled = priority_flood_fill(surf, None)
    dirs, _ = resolve_flats_pipeline(filled, None)

    orig = raised
    out = raised.copy()

    def walk(py, px, target, do_carve, within):
        pl = 0
        pdepth = -np.inf
        cy, cx, t = py, px, target
        while True:
            if nd[cy, cx]:
                break
            o = orig[cy, cx]
            if not (o >= t):
                break
            if do_carve:
                val = (t if (mode == COMPLETE or within)
                       else max(o - max_depth, t))
                out[cy, cx] = min(out[cy, cx], val)
            else:
                pdepth = max(pdepth, o - t)
                pl += 1
            d = int(dirs[cy, cx])
            if eps_gradients:
                t = np.nextafter(t, -np.inf)
            if d == 0 or d > 8:
                break
            ny, nx = cy + int(D8Y[d]), cx + int(D8X[d])
            if not (0 <= ny < h and 0 <= nx < w):
                break
            cy, cx = ny, nx
        return pl, pdepth

    for py, px in zip(*[a.tolist() for a in np.nonzero(pits)]):
        t0 = orig[py, px]
        if mode == COMPLETE:
            walk(py, px, t0, True, True)
        else:
            pl, pdepth = walk(py, px, t0, False, True)
            within = pl <= max_path_len and pdepth <= max_depth
            if within or mode == CONSTRAINED:
                walk(py, px, t0, True, within)

    if fill_depressions and mode != COMPLETE:
        # prefix raise along the same tree, iterated to fixpoint
        changed = True
        while changed:
            changed = False
            for cy in range(h):
                for cx in range(w):
                    if nd[cy, cx]:
                        continue
                    d = int(dirs[cy, cx])
                    if d == 0 or d > 8:
                        continue
                    ny, nx = cy + int(D8Y[d]), cx + int(D8X[d])
                    if not (0 <= ny < h and 0 <= nx < w) or nd[ny, nx]:
                        continue
                    if out[cy, cx] <= out[ny, nx]:
                        v = (np.nextafter(out[ny, nx], np.inf)
                             if eps_gradients else out[ny, nx])
                        if v != out[cy, cx]:
                            out[cy, cx] = v
                            changed = True

    if nodata is not None:
        out[dem_in == nodata] = nodata
    return out
