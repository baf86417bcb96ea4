"""Flow-metric kernels (FM_*): elevations -> per-cell flow proportions
tensor, plus D-infinity angles and the generic proportions-based flow
accumulation.

The proportions tensor mirrors the reference's ``Array3D<float>``
(``include/richdem/common/Array3D.hpp``): shape (h, w, 9); slot 0 carries
flags NO_FLOW_GEN=-1 / HAS_FLOW_GEN=0 / NO_DATA_GEN=-2
(``common/constants.hpp:82-85``), slots 1..8 the proportion sent to each
D8 neighbour.

Re-derived (vectorized NumPy) from:
* FM_OCallaghan  — flowmet/OCallaghan1984.hpp:13-91
* FM_Holmgren    — flowmet/Holmgren1994.hpp:12-83  (Quinn = x=1,
  flowmet/Quinn1991.hpp:11-16)
* FM_Freeman     — flowmet/Freeman1991.hpp:12-80
* FM_FairfieldLeymarie (Rho8/Rho4) — flowmet/Fairfield1991.hpp:13-96,
  with a *seeded per-cell* RNG (hash of the global cell id) instead of the
  reference's global RNG so results are cluster-size-invariant
  (SURVEY.md §7.3)
* FM_Tarboton / dinf_flow_directions — flowmet/Tarboton1997.hpp:14-149,
  flowmet/dinf_flowdirs.hpp:45-152
* FlowAccumulation (generic) —
  methods/flow_accumulation_generic.hpp:33-100
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    D8X,
    D8Y,
    DR,
    HAS_FLOW_GEN,
    N8_DIAG,
    NO_DATA_GEN,
    NO_FLOW_GEN,
)

DINF_NO_DATA = -1.0


def _shift_plane(e: np.ndarray, n: int, fill: float) -> np.ndarray:
    """plane[y, x] = e[y + D8Y[n], x + D8X[n]], `fill` off-grid."""
    h, w = e.shape
    dx, dy = int(D8X[n]), int(D8Y[n])
    out = np.full((h, w), fill, dtype=np.float64)
    ys_d = slice(max(0, -dy), h - max(0, dy))
    xs_d = slice(max(0, -dx), w - max(0, dx))
    ys_s = slice(max(0, dy), h + min(0, dy))
    xs_s = slice(max(0, dx), w + min(0, dx))
    out[ys_d, xs_d] = e[ys_s, xs_s]
    return out


def _init_props(e: np.ndarray, nodata: float | None):
    h, w = e.shape
    props = np.full((h, w, 9), NO_FLOW_GEN, dtype=np.float32)
    nd = (e == nodata) if nodata is not None else np.zeros((h, w), bool)
    props[nd, 0] = NO_DATA_GEN
    interior = np.zeros((h, w), bool)
    interior[1:-1, 1:-1] = True
    interior &= ~nd
    return props, nd, interior


def _downslope_grads(e, nd, power_l=None):
    """per-neighbour positive gradients (e - ne)/dr for data neighbours
    lower than the centre; 0 otherwise."""
    grads = np.zeros(e.shape + (9,), dtype=np.float64)
    for n in range(1, 9):
        ne = _shift_plane(e, n, np.inf)
        nnd = _shift_plane(nd.astype(np.float64), n, 1.0) > 0
        lower = (ne < e) & ~nnd
        g = np.where(lower, (e - ne) / DR[n], 0.0)
        if power_l is not None:
            g = g * power_l[n]
        grads[..., n] = g
    return grads


def fm_ocallaghan(e: np.ndarray, nodata: float | None = None,
                  topology: str = "D8") -> np.ndarray:
    """SFD proportions: all flow to the lowest strictly-lower data
    neighbour, first-lowest-wins on ties (OCallaghan1984.hpp:32-87);
    ``topology="D4"`` restricts to cardinal slots (FM_D4/FM_OCallaghan
    <Topology::D4>, OCallaghan1984.hpp:89-92)."""
    props, nd, interior = _init_props(e, nodata)
    h, w = e.shape
    lowest_elev = np.full((h, w), np.inf)
    lowest_n = np.zeros((h, w), dtype=np.int64)
    slots = range(1, 9) if topology == "D8" else (1, 3, 5, 7)
    for n in slots:
        ne = _shift_plane(e, n, np.inf)
        nnd = _shift_plane(nd.astype(np.float64), n, 1.0) > 0
        cand = (ne < e) & ~nnd & (ne < lowest_elev)
        lowest_elev = np.where(cand, ne, lowest_elev)
        lowest_n = np.where(cand, n, lowest_n)
    flow = interior & (lowest_n > 0)
    props[flow, 0] = HAS_FLOW_GEN
    for n in range(1, 9):
        props[flow & (lowest_n == n), n] = 1.0
    return props


def _normalize_props(props, contrib, interior):
    C = contrib[..., 1:].sum(axis=-1)
    flow = interior & (C > 0)
    props[flow, 0] = HAS_FLOW_GEN
    with np.errstate(divide="ignore", invalid="ignore"):
        norm = contrib / C[..., None]
    for n in range(1, 9):
        props[flow, n] = norm[flow, n].astype(np.float32)
    return props


def fm_holmgren(e: np.ndarray, nodata: float | None = None,
                x: float = 1.0) -> np.ndarray:
    """MFD proportions ∝ (grad * L)^x with L = 0.5 cardinal / 0.354
    diagonal (Holmgren1994.hpp:25-77)."""
    props, nd, interior = _init_props(e, nodata)
    L = np.array([0, 0.5, 0.354, 0.5, 0.354, 0.5, 0.354, 0.5, 0.354])
    grads = _downslope_grads(e.astype(np.float64), nd, power_l=L)
    contrib = np.where(grads > 0, np.power(grads, x), 0.0)
    return _normalize_props(props, contrib, interior)


def fm_quinn(e: np.ndarray, nodata: float | None = None) -> np.ndarray:
    """Quinn 1991 = Holmgren with x=1 (Quinn1991.hpp:11-16)."""
    return fm_holmgren(e, nodata, x=1.0)


def fm_freeman(e: np.ndarray, nodata: float | None = None,
               p: float = 1.1) -> np.ndarray:
    """MFD proportions ∝ grad^p (Freeman1991.hpp:30-72)."""
    props, nd, interior = _init_props(e, nodata)
    grads = _downslope_grads(e.astype(np.float64), nd)
    contrib = np.where(grads > 0, np.power(grads, p), 0.0)
    return _normalize_props(props, contrib, interior)


def _cell_u01(h, w, y0, x0, global_w, seed, salt):
    """Deterministic per-cell uniforms from the *global* cell id, so Rho8
    is identical at any tiling/cluster size."""
    yy, xx = np.mgrid[y0 : y0 + h, x0 : x0 + w]
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        gid = (yy.astype(np.uint64) * np.uint64(global_w)
               + xx.astype(np.uint64))
        z = gid + np.uint64(seed + salt) * np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return (z % np.uint64(2**53)).astype(np.float64) / float(2**53)


def fm_fairfield(e: np.ndarray, nodata: float | None = None,
                 seed: int = 0, y0: int = 0, x0: int = 0,
                 global_w: int | None = None,
                 topology: str = "D8") -> np.ndarray:
    """Rho8/Rho4: steepest descent with stochastic slope scaling —
    D8 diagonals by 1/(2 - U(0,1)), D4 north/south by 1/(1/U - 1)
    (Fairfield1991.hpp:44-66, Rho4 :93-96); seeded per-cell RNG."""
    props, nd, interior = _init_props(e, nodata)
    h, w = e.shape
    gw = global_w if global_w is not None else w
    best = np.zeros((h, w))
    best_n = np.zeros((h, w), dtype=np.int64)
    ef = e.astype(np.float64)
    d8 = topology == "D8"
    slots = range(1, 9) if d8 else (1, 3, 5, 7)
    for n in slots:
        ne = _shift_plane(ef, n, np.inf)
        nnd = _shift_plane(nd.astype(np.float64), n, 1.0) > 0
        lower = (ne < ef) & ~nnd
        rho = np.where(lower, ef - ne, 0.0)
        if d8 and N8_DIAG[n]:
            u = _cell_u01(h, w, y0, x0, gw, seed, n)
            rho = rho * (1.0 / (2.0 - u))
        elif not d8 and n in (3, 7):  # D4 north/south
            u = _cell_u01(h, w, y0, x0, gw, seed, n)
            with np.errstate(divide="ignore"):
                rho = rho * (1.0 / (1.0 / u - 1.0))
        take = rho > best
        best = np.where(take, rho, best)
        best_n = np.where(take, n, best_n)
    flow = interior & (best_n > 0)
    props[flow, 0] = HAS_FLOW_GEN
    for n in range(1, 9):
        props[flow & (best_n == n), n] = 1.0
    return props


# D-infinity facet tables (dinf_flowdirs.hpp:25-30)
_DY_E1 = np.array([0, -1, -1, 0, 0, 1, 1, 0])
_DX_E1 = np.array([1, 0, 0, -1, -1, 0, 0, 1])
_DY_E2 = np.array([-1, -1, -1, -1, 1, 1, 1, 1])
_DX_E2 = np.array([1, 1, -1, -1, -1, -1, 1, 1])
_AC = np.array([0.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0])
_AF = np.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0])


def _shift_xy(e, dx, dy, fill):
    h, w = e.shape
    out = np.full((h, w), fill, dtype=np.float64)
    ys_d = slice(max(0, -dy), h - max(0, dy))
    xs_d = slice(max(0, -dx), w - max(0, dx))
    ys_s = slice(max(0, dy), h + min(0, dy))
    xs_s = slice(max(0, dx), w + min(0, dx))
    out[ys_d, xs_d] = e[ys_s, xs_s]
    return out


def dinf_flow_directions(e: np.ndarray,
                         nodata: float | None = None,
                         no_flow_value: float = 0.0) -> np.ndarray:
    """Tarboton 1997 continuous angles [0, 2pi)
    (dinf_flowdirs.hpp:45-115): per facet, the steepest slope direction;
    edges forced outward; NoData assumed very negative.
    ``no_flow_value``: marker for cells with no positive facet slope
    (the reference's dinf NO_FLOW = -1; the default 0.0 keeps the
    historical behaviour of this kernel's callers)."""
    h, w = e.shape
    ef = e.astype(np.float64)
    smax = np.zeros((h, w))
    rmax = np.zeros((h, w))
    nmax = np.full((h, w), -1, dtype=np.int64)
    dang = np.arctan2(1.0, 1.0)
    for n in range(8):
        e1 = _shift_xy(ef, int(_DX_E1[n]), int(_DY_E1[n]), np.nan)
        e2 = _shift_xy(ef, int(_DX_E2[n]), int(_DY_E2[n]), np.nan)
        s1 = ef - e1
        s2 = e1 - e2
        r = np.arctan2(s2, s1)
        s = np.where(
            r < 0, s1,
            np.where(r > dang, (ef - e2) / np.sqrt(2.0),
                     np.sqrt(s1 * s1 + s2 * s2)),
        )
        r = np.clip(r, 0.0, dang)
        take = s > smax
        smax = np.where(take, s, smax)
        rmax = np.where(take, r, rmax)
        nmax = np.where(take, n, nmax)
    rg = np.where(
        nmax >= 0,
        _AF[np.clip(nmax, 0, 7)] * rmax
        + _AC[np.clip(nmax, 0, 7)] * np.pi / 2.0,
        no_flow_value,
    )
    # forced-outward edges (dinf_flowdirs.hpp:47-66)
    rg[0, :] = 2 * np.pi / 4
    rg[-1, :] = 6 * np.pi / 4
    rg[:, 0] = 4 * np.pi / 4
    rg[:, -1] = 0.0
    rg[0, 0] = 3 * np.pi / 4
    rg[-1, 0] = 5 * np.pi / 4
    rg[0, -1] = 1 * np.pi / 4
    rg[-1, -1] = 7 * np.pi / 4
    if nodata is not None:
        rg[e == nodata] = DINF_NO_DATA
    return rg


def fm_tarboton(e: np.ndarray, nodata: float | None = None) -> np.ndarray:
    """D-infinity proportions: the angle splits flow between the two
    adjacent D8 neighbours (Tarboton1997.hpp:14-149)."""
    props, nd, interior = _init_props(e, nodata)
    h, w = e.shape
    ang = dinf_flow_directions(e, nodata)
    # angle 0 = east, counter-clockwise.  D8 slot per 45-degree spoke,
    # counter-clockwise from east: 5(E),4(NE),3(N),2(NW),1(W),8(SW),
    # 7(S),6(SE)
    spokes = [5, 4, 3, 2, 1, 8, 7, 6]
    k = ang / (np.pi / 4.0)
    k0 = np.floor(k).astype(np.int64) % 8
    frac = k - np.floor(k)
    has = interior.copy()
    # a cell with smax==0 has no flow: detect via angle==0 AND east
    # neighbour not lower
    east = _shift_plane(e.astype(np.float64), 5, np.inf)
    no_flow = (ang == 0.0) & ~(east < e)
    has &= ~no_flow
    if nodata is not None:
        has &= e != nodata
    props[has, 0] = HAS_FLOW_GEN
    for j in range(8):
        m1 = has & (k0 == j)
        if not m1.any():
            continue
        n1 = spokes[j]
        n2 = spokes[(j + 1) % 8]
        f = frac[m1]
        props[m1, n1] = (1.0 - f).astype(np.float32)
        p2 = props[m1, n2]
        props[m1, n2] = p2 * 0 + f.astype(np.float32)
    # clean tiny negatives / leftover NO_FLOW markers on flowing cells
    flow_mask = props[..., 0] == HAS_FLOW_GEN
    body = props[..., 1:]
    body[flow_mask] = np.where(body[flow_mask] > 0, body[flow_mask], 0.0)
    props[..., 1:] = body
    return props


def prop_flow_accum(props: np.ndarray,
                    weights: np.ndarray | None = None) -> np.ndarray:
    """Generic proportions-based flow accumulation (Kahn, vectorized
    level sweeps) — flow_accumulation_generic.hpp:33-100."""
    h, w, _ = props.shape
    n_cells = h * w
    flags = props[..., 0].ravel()
    valid = flags != NO_DATA_GEN
    idx = np.arange(n_cells, dtype=np.int64)
    y, x = np.divmod(idx, w)

    # downstream targets and proportions per slot
    targets = np.full((n_cells, 8), -1, dtype=np.int64)
    pvals = np.zeros((n_cells, 8))
    deps = np.zeros(n_cells, dtype=np.int64)
    for n in range(1, 9):
        p = props[..., n].ravel().astype(np.float64)
        fl = (p > 0) & valid
        nx = x + int(D8X[n])
        ny = y + int(D8Y[n])
        ing = (nx >= 0) & (nx < w) & (ny >= 0) & (ny < h)
        t = np.where(ing, ny * w + nx, 0)
        ok = fl & ing & valid[t]
        targets[ok, n - 1] = t[ok]
        pvals[ok, n - 1] = p[ok]
        np.add.at(deps, t[ok], 1)

    accum = (
        np.where(valid, weights.ravel().astype(np.float64), 0.0)
        if weights is not None
        else valid.astype(np.float64)
    )
    frontier = np.flatnonzero(valid & (deps == 0))
    while frontier.size:
        moved = []
        for n in range(8):
            t = targets[frontier, n]
            m = t >= 0
            if not m.any():
                continue
            tt = t[m]
            np.add.at(accum, tt, pvals[frontier[m], n] * accum[frontier[m]])
            np.subtract.at(deps, tt, 1)
            moved.append(tt)
        if moved:
            cand = np.unique(np.concatenate(moved))
            frontier = cand[deps[cand] == 0]
        else:
            frontier = np.array([], dtype=np.int64)
    out = accum.reshape(h, w)
    out[~valid.reshape(h, w)] = -1.0
    return out


# D8 slot -> D-infinity angle (flat_resolution_dinf.hpp:16)
D8_TO_DINF = np.array([
    -1.0, 4 * np.pi / 4, 3 * np.pi / 4, 2 * np.pi / 4, 1 * np.pi / 4,
    0.0, 7 * np.pi / 4, 6 * np.pi / 4, 5 * np.pi / 4,
])
DINF_NO_FLOW = -1.0


def dinf_flow_flats(
    flat_mask: np.ndarray, groups: np.ndarray, angles: np.ndarray,
) -> np.ndarray:
    """Recompute D-infinity angles inside resolved flats from the flat
    gradient mask, restricted to same-group facets
    (``dinf_masked_FlowDir`` / ``dinf_flow_flats``,
    flats/flat_resolution_dinf.hpp:18-98) — vectorized.

    Cells whose ``angles`` equal DINF_NO_FLOW (-1) and whose mask is
    valid (!= -1) get the Tarboton facet direction computed over the
    integer flat mask; facets with any off-group corner are skipped; if
    no positive facet slope exists, the first lower same-group D8
    neighbour's spoke angle is used (hpp:62-69).  Interior cells only —
    callers keep the forced-outward border."""
    h, w = flat_mask.shape
    mk = flat_mask.astype(np.float64)
    todo = (angles == DINF_NO_FLOW) & (flat_mask != -1) & (groups != 0)
    out = angles.astype(np.float64).copy()
    if not todo.any():
        return out

    smax = np.zeros((h, w))
    rmax = np.zeros((h, w))
    nmax = np.full((h, w), -1, dtype=np.int64)
    dang = np.arctan2(1.0, 1.0)

    def shift_i(a, dx, dy, fill):
        o = np.full((h, w), fill, dtype=a.dtype)
        ys_d = slice(max(0, -dy), h - max(0, dy))
        xs_d = slice(max(0, -dx), w - max(0, dx))
        ys_s = slice(max(0, dy), h + min(0, dy))
        xs_s = slice(max(0, dx), w + min(0, dx))
        o[ys_d, xs_d] = a[ys_s, xs_s]
        return o

    for n in range(8):
        e1 = shift_i(mk, int(_DX_E1[n]), int(_DY_E1[n]), np.nan)
        e2 = shift_i(mk, int(_DX_E2[n]), int(_DY_E2[n]), np.nan)
        g1 = shift_i(groups, int(_DX_E1[n]), int(_DY_E1[n]),
                     np.int64(-9))
        g2 = shift_i(groups, int(_DX_E2[n]), int(_DY_E2[n]),
                     np.int64(-9))
        okg = (g1 == groups) & (g2 == groups)
        s1 = mk - e1
        s2 = e1 - e2
        r = np.arctan2(s2, s1)
        s = np.where(
            r < 0, s1,
            np.where(r > dang, (mk - e2) / np.sqrt(2.0),
                     np.sqrt(s1 * s1 + s2 * s2)),
        )
        r = np.clip(r, 0.0, dang)
        take = okg & (s > smax) & todo
        smax = np.where(take, s, smax)
        rmax = np.where(take, r, rmax)
        nmax = np.where(take, n, nmax)

    got = todo & (nmax >= 0)
    out[got] = (_AF[np.clip(nmax, 0, 7)] * rmax
                + _AC[np.clip(nmax, 0, 7)] * np.pi / 2.0)[got]

    # fallback: first lower same-group D8 neighbour, slots in 1..8 order
    rest = todo & ~got
    if rest.any():
        from ..constants import D8X, D8Y

        for n in range(1, 9):
            gn = shift_i(groups, int(D8X[n]), int(D8Y[n]), np.int64(-9))
            mn = shift_i(mk, int(D8X[n]), int(D8Y[n]), np.nan)
            hit = rest & (gn == groups) & (mn < mk)
            if hit.any():
                out[hit] = D8_TO_DINF[n]
                rest &= ~hit
            if not rest.any():
                break
    return out
