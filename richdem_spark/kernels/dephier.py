"""Depression hierarchy — Barnes, Callaghan, Wickert (2020).

Re-derivation of ``include/richdem/depressions/depression_hierarchy.hpp``:

* ocean-seeded Priority-Flood assigning leaf depression labels and flow
  directions (:243-474); PQ ties pop most-recently-added first
  (radix-heap semantics, :159-160) — reproduced with (elev, -seq) keys
* outlet database: min saddle per label pair (:475-530)
* outlets sorted by elevation (:561-577), union-find merge into the
  binary tree of meta-depressions (:600-702)
* marginal volumes (:792-868) + subtree totals (:870-900)
* ``last_layer`` relabelling (:904-921)

Labels: OCEAN = 0; unvisited = NO_DEP (-1 here; 2^32-1 in the
reference).  The returned ``Depression`` records mirror the reference's
fields (depression_hierarchy.hpp:43-93).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np

from ..constants import D8_INVERSE, D8X, D8Y, NO_FLOW

OCEAN = 0
NO_DEP = -1
NO_VALUE = -1


@dataclass
class Depression:
    pit_cell: int = NO_VALUE
    out_cell: int = NO_VALUE
    parent: int = NO_VALUE
    odep: int = NO_VALUE
    geolink: int = NO_VALUE
    pit_elev: float = np.inf
    out_elev: float = np.inf
    lchild: int = NO_VALUE
    rchild: int = NO_VALUE
    ocean_parent: bool = False
    ocean_linked: list = field(default_factory=list)
    dep_label: int = 0
    cell_count: int = 0
    dep_vol: float = 0.0
    water_vol: float = 0.0
    total_elevation: float = 0.0


def _neigh_slots(topology: str):
    return range(1, 9) if topology == "D8" else (1, 3, 5, 7)


def get_depression_hierarchy(
    dem: np.ndarray, labels_in: np.ndarray, topology: str = "D8"
):
    """(depressions, labels, flowdirs).

    ``labels_in``: OCEAN (0) marks ocean cells; everything else NO_DEP.
    """
    h, w = dem.shape
    demf = dem.ravel().astype(np.float64)
    labels = np.where(labels_in.ravel() == OCEAN, OCEAN, NO_DEP).astype(
        np.int64
    )
    flowdirs = np.full(h * w, NO_FLOW, dtype=np.int8)
    slots = list(_neigh_slots(topology))
    offs = [(n, int(D8X[n]), int(D8Y[n])) for n in slots]

    lab2 = labels.reshape(h, w)
    ocean_mask = lab2 == OCEAN

    # ocean seeds: ocean cells bordering non-ocean (:283-308), row-major
    border = np.zeros((h, w), bool)
    for n, dx, dy in offs:
        dst = (slice(max(0, -dy), h - max(0, dy)),
               slice(max(0, -dx), w - max(0, dx)))
        src = (slice(max(0, dy), h + min(0, dy)),
               slice(max(0, dx), w + min(0, dx)))
        border[dst] |= ~ocean_mask[src]
    ocean_seeds = np.flatnonzero((ocean_mask & border).ravel())
    if ocean_seeds.size == 0:
        raise ValueError("no OCEAN cells found")

    # land seeds: cells with no lower neighbour (:327-363)
    lowest = np.full((h, w), np.inf)
    d2 = demf.reshape(h, w)
    for n, dx, dy in offs:
        dst = (slice(max(0, -dy), h - max(0, dy)),
               slice(max(0, -dx), w - max(0, dx)))
        src = (slice(max(0, dy), h + min(0, dy)),
               slice(max(0, dx), w + min(0, dx)))
        lowest[dst] = np.minimum(lowest[dst], d2[src])
    land_seeds = np.flatnonzero((~ocean_mask & (d2 <= lowest)).ravel())

    deps: list[Depression] = [Depression(
        pit_elev=-np.inf, pit_cell=NO_VALUE, dep_label=0
    )]

    # PQ ties pop most-recently-added first -> key (elev, -seq)
    pq: list[tuple[float, int, int]] = []
    seq = 0
    for i in ocean_seeds.tolist():
        heapq.heappush(pq, (demf[i], -seq, i))
        seq += 1
    for i in land_seeds.tolist():
        heapq.heappush(pq, (demf[i], -seq, i))
        seq += 1

    outlet_db: dict[tuple[int, int], tuple[int, float]] = {}

    while pq:
        celev, _, ci = heapq.heappop(pq)
        clabel = labels[ci]
        cy, cx = divmod(ci, w)
        if clabel == NO_DEP:
            clabel = len(deps)
            deps.append(Depression(
                pit_cell=ci, pit_elev=celev, dep_label=clabel
            ))
            labels[ci] = clabel
        for n, dx, dy in offs:
            nx, ny = cx + dx, cy + dy
            if nx < 0 or nx >= w or ny < 0 or ny >= h:
                continue
            ni = ny * w + nx
            nlabel = labels[ni]
            if nlabel == NO_DEP:
                labels[ni] = clabel
                heapq.heappush(pq, (demf[ni], -seq, ni))
                seq += 1
                flowdirs[ni] = D8_INVERSE[n]
            elif nlabel == clabel:
                pass
            else:
                out_cell, out_elev = ci, celev
                if demf[ni] > out_elev:
                    out_cell, out_elev = ni, demf[ni]
                k = (min(clabel, nlabel), max(clabel, nlabel))
                if k not in outlet_db or outlet_db[k][1] > out_elev:
                    outlet_db[k] = (out_cell, out_elev)

    merge_outlet_db(deps, outlet_db)
    _calculate_marginal_volumes(deps, demf, labels)
    _calculate_total_volumes(deps)
    return deps, labels.reshape(h, w), flowdirs.reshape(h, w)


def merge_outlet_db(deps, outlet_db: dict) -> None:
    """Sort outlets by elevation and union-find merge the leaf
    depressions into the binary meta-depression tree, in place
    (depression_hierarchy.hpp:561-702).  ``outlet_db``:
    {(label_a, label_b): (out_cell, out_elev)} with leaf labels indexing
    ``deps`` (OCEAN = 0)."""
    outlets = sorted(
        ((a, b, oc, oe) for (a, b), (oc, oe) in outlet_db.items()),
        key=lambda o: (o[3], o[0], o[1]),
    )

    # union-find merge (:600-702)
    parent_uf = list(range(len(outlets) * 2 + len(deps) + 2))

    def find(x):
        while parent_uf[x] != x:
            parent_uf[x] = parent_uf[parent_uf[x]]
            x = parent_uf[x]
        return x

    for a, b, oc, oe in outlets:
        depa_set = find(a)
        depb_set = find(b)
        if depa_set == depb_set:
            continue
        if depa_set == OCEAN or depb_set == OCEAN:
            if depa_set == OCEAN:
                a, b = b, a
                depa_set, depb_set = depb_set, depa_set
            dep = deps[depa_set]
            dep.parent = b
            dep.out_elev = oe
            dep.out_cell = oc
            dep.odep = NO_VALUE
            dep.ocean_parent = True
            dep.geolink = b
            deps[b].ocean_linked.append(depa_set)
            parent_uf[depa_set] = OCEAN
        else:
            depa = deps[depa_set]
            depb = deps[depb_set]
            newlabel = len(deps)
            depa.parent = newlabel
            depb.parent = newlabel
            depa.out_cell = oc
            depb.out_cell = oc
            depa.out_elev = oe
            depb.out_elev = oe
            depa.odep = depb_set
            depb.odep = depa_set
            depa.geolink = b
            depb.geolink = a
            newdep = Depression(
                lchild=depa_set, rchild=depb_set, dep_label=newlabel,
                pit_cell=depa.pit_cell,
            )
            deps.append(newdep)
            if newlabel >= len(parent_uf):
                parent_uf.extend(
                    range(len(parent_uf), newlabel + 1)
                )
            parent_uf[depa_set] = newlabel
            parent_uf[depb_set] = newlabel


def _calculate_marginal_volumes(deps, demf, labels):
    """(:792-868): each cell contributes to the (meta)depression whose
    out_elev first clears its elevation on the walk to the root."""
    for i in range(len(demf)):
        clabel = int(labels[i])
        my_elev = demf[i]
        while clabel != OCEAN:
            d = deps[clabel]
            if my_elev <= d.out_elev:
                break
            if d.ocean_parent:
                clabel = OCEAN
                break
            clabel = d.parent
        if clabel == OCEAN:
            continue
        deps[clabel].cell_count += 1
        deps[clabel].total_elevation += demf[i]


def _calculate_total_volumes(deps):
    """(:870-900)."""
    for d in range(len(deps)):
        dep = deps[d]
        if dep.lchild != NO_VALUE:
            dep.cell_count += deps[dep.lchild].cell_count
            dep.total_elevation += deps[dep.lchild].total_elevation
            dep.cell_count += deps[dep.rchild].cell_count
            dep.total_elevation += deps[dep.rchild].total_elevation
        if dep.cell_count and np.isfinite(dep.out_elev):
            dep.dep_vol = (dep.cell_count * float(dep.out_elev)
                           - dep.total_elevation)
        else:
            dep.dep_vol = 0.0


def last_layer(labels: np.ndarray, dem: np.ndarray, deps) -> np.ndarray:
    """Relabel each cell to its containing meta-depression (:904-921)."""
    out = labels.copy().ravel()
    demf = dem.ravel()
    for i in range(out.size):
        my = int(out[i])
        while True:
            if demf[i] >= deps[my].out_elev:
                my = deps[my].parent
            else:
                if my != 0:
                    pass
                break
        out[i] = my
    return out.reshape(labels.shape)
