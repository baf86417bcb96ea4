"""Fill-Spill-Merge — route standing surface water through the depression
hierarchy (Barnes, Callaghan, Wickert 2020).

Spec-faithful re-derivation of
``include/richdem/depressions/fill_spill_merge.hpp``:

* ``MoveWaterIntoPits`` (:225-365) — all surface water flows down the
  hierarchy's flowdirs into each leaf depression's pit (vectorized
  accumulation of the water column); ocean water vanishes.
* ``OverflowInto`` (:503-605) — a full depression spills through its
  geolink into the neighbouring depression while its sibling has
  capacity, otherwise the pair's parent meta-depression accumulates;
  ocean-parented depressions spill to the ocean.
* ``FillDepressions``/``DetermineWaterLevel`` (:653-1063) — the stored
  water is re-expressed as a water table: the level L over a flooded
  region satisfies  sum_{cells below L}(L - elev) = stored volume.

Equivalence properties (the reference's own test strategy,
tests/fsm_tests.cpp:467-527,687): with overwhelming water FSM equals
Priority-Flood fill; repeated FSM is idempotent; water is conserved up
to ocean drainage.

Water bookkeeping here: ``water[d]`` = water stored in node d's
EXCLUSIVE shell (between its children's capacity and its own); a
subtree is full iff every node's shell is full.
"""

from __future__ import annotations

import numpy as np

from .d8 import d8_flow_accum
from .dephier import NO_VALUE, OCEAN


def move_water_into_pits(wtd: np.ndarray, flowdirs: np.ndarray,
                         labels: np.ndarray, deps) -> np.ndarray:
    """Route all surface water down `flowdirs`; returns water_vol per
    leaf depression label.  Cells with NO_FLOW keep their arriving water
    (they are pits or ocean)."""
    acc = d8_flow_accum(flowdirs.astype(np.uint8),
                        weights=wtd.astype(np.float64))
    # water stopped at cells with no downstream: pits and ocean cells
    from .d8 import _neighbor_flat

    h, w = flowdirs.shape
    ds, ok = _neighbor_flat(h, w, flowdirs.astype(np.int64))
    stopped = ~ok
    water_vol = np.zeros(len(deps))
    lab = labels.ravel()
    accf = acc.ravel()
    st = np.flatnonzero(stopped & (accf > 0))
    for i in st.tolist():
        l = int(lab[i])
        if l != OCEAN:
            water_vol[l] += accf[i]
    return water_vol


def _excl_caps(deps):
    caps = np.zeros(len(deps))
    for d, dep in enumerate(deps):
        if d == OCEAN:
            caps[d] = np.inf
            continue
        vol = dep.dep_vol
        if dep.lchild != NO_VALUE:
            vol -= deps[dep.lchild].dep_vol + deps[dep.rchild].dep_vol
        caps[d] = max(vol, 0.0)
    return caps


def overflow(deps, leaf_water: np.ndarray) -> np.ndarray:
    """Distribute per-leaf inflow through the hierarchy; returns water
    per node's exclusive shell."""
    n = len(deps)
    caps = _excl_caps(deps)
    water = np.zeros(n)
    subtree_vol = np.array([d.dep_vol for d in deps])
    subtree_water = np.zeros(n)

    def subtree_is_full(d):
        return subtree_water[d] >= subtree_vol[d] - 1e-12

    def pour(d, extra):
        # iterative overflow walk
        while extra > 1e-15 and d != OCEAN and d != NO_VALUE:
            dep = deps[d]
            free = caps[d] - water[d]
            take = min(extra, free)
            if take > 0:
                water[d] += take
                # update subtree totals up to the root
                a = d
                while a != NO_VALUE:
                    subtree_water[a] += take
                    if deps[a].ocean_parent:
                        a = NO_VALUE
                    else:
                        a = deps[a].parent
                extra -= take
            if extra <= 1e-15:
                return
            # this node's shell is full; spill
            if dep.ocean_parent or dep.parent == NO_VALUE:
                return  # drains to the ocean
            sib = dep.odep
            if sib != NO_VALUE and not subtree_is_full(sib):
                d = dep.geolink  # enter the neighbour at its leaf
            else:
                d = dep.parent
        return

    for leaf in range(1, n):
        if leaf_water[leaf] > 0:
            pour(leaf, float(leaf_water[leaf]))
    return water


def _marginal_cells(deps, dem, labels):
    """cells (flat idx) per node's exclusive shell — the inverse of
    CalculateMarginalVolumes."""
    demf = dem.ravel()
    lab = labels.ravel()
    shell: dict[int, list[int]] = {}
    for i in range(demf.size):
        clabel = int(lab[i])
        e = demf[i]
        while clabel != OCEAN:
            d = deps[clabel]
            if e <= d.out_elev:
                break
            if d.ocean_parent:
                clabel = OCEAN
                break
            clabel = d.parent
        if clabel != OCEAN:
            shell.setdefault(clabel, []).append(i)
    return shell


def backfill(deps, water: np.ndarray, dem: np.ndarray,
             labels: np.ndarray) -> np.ndarray:
    """Convert stored shell water into a water-table-depth raster."""
    h, w = dem.shape
    demf = dem.ravel()
    wtd = np.zeros(h * w)
    shell = _marginal_cells(deps, dem, labels)

    children: dict[int, list[int]] = {}
    roots = []
    for d, dep in enumerate(deps):
        if d == OCEAN:
            continue
        if dep.ocean_parent or dep.parent == NO_VALUE:
            roots.append(d)
        else:
            children.setdefault(dep.parent, []).append(d)

    def subtree_nodes(d):
        out = [d]
        stack = [d]
        while stack:
            x = stack.pop()
            for c in children.get(x, ()):
                out.append(c)
                stack.append(c)
        return out

    def fill_region(d):
        """Highest node first: if this node's shell holds water, flood
        the whole subtree to one level; else recurse."""
        if water[d] > 1e-15:
            nodes = subtree_nodes(d)
            cells = np.concatenate(
                [np.asarray(shell.get(x, []), dtype=np.int64)
                 for x in nodes]
            ) if any(shell.get(x) for x in nodes) else np.array(
                [], dtype=np.int64)
            total = float(sum(water[x] for x in nodes))
            if cells.size == 0 or total <= 0:
                return
            elev = demf[cells]
            order = np.argsort(elev)
            es = elev[order]
            csum = np.cumsum(es)
            # flood level filling the j lowest cells: L(j) = (prefix_j +
            # total)/j, monotone decreasing while L(j) > es[j]; the first
            # j with L(j) <= next elevation is the answer
            # (DetermineWaterLevel, fill_spill_merge.hpp:956-1063)
            js = np.arange(1, len(es) + 1, dtype=np.float64)
            L_all = (csum + total) / js
            nxt = np.concatenate([es[1:], [np.inf]])
            ok_j = L_all <= nxt
            kk = int(np.argmax(ok_j)) + 1 if ok_j.any() else len(es)
            L = (csum[kk - 1] + total) / kk
            sel = cells[order[:kk]]
            wtd[sel] = np.maximum(L - demf[sel], 0.0)
        else:
            for c in children.get(d, ()):
                fill_region(c)

    # every ocean_parent / parentless node is a root of its own subtree
    for r in roots:
        fill_region(r)
    return wtd.reshape(h, w)


def fill_spill_merge(dem: np.ndarray, labels: np.ndarray,
                     flowdirs: np.ndarray, deps,
                     wtd: np.ndarray) -> np.ndarray:
    """FillSpillMerge (fill_spill_merge.hpp:142-194): surface water in
    ``wtd`` (depths >= 0) is routed, stored, and re-expressed as a water
    table.  Returns the new standing-water raster."""
    leaf_water = move_water_into_pits(wtd, flowdirs, labels, deps)
    water = overflow(deps, leaf_water)
    return backfill(deps, water, dem, labels)
