"""Garbrecht-Martz 1997 flat resolution (legacy alternative).

Vectorized re-derivation of ``include/richdem/flats/garbrecht.hpp``
(GradientTowardsLower :26-66, GradientAwayFromHigher :68-112,
CombineGradients :114-129, GarbrechtAlg :133-151).  The reference keeps
this only for its legacy binary — Barnes-Lehman-Mulla 2014
(kernels/flats.py, distributed in ops/flats.py) supersedes it and is
the engine's production flat-resolution path; this kernel exists for
API parity with the legacy surface.

Both sweeps are order-independent despite the reference's in-sweep
mutation (the predicates only read states that are stable within a
sweep: ``inc1 < loops`` distinguishes frozen cells, ``inc2 == 2`` only
cells bumped in the first half-pass), so they vectorize directly.

Divergence note: the reference's GradientAwayFromHigher loops until
every flat cell has incremented and thus never terminates on a flat
with no higher neighbour anywhere (e.g. a filled plateau rim); this
port breaks out when a sweep makes no progress, leaving such cells'
inc2 at 0 instead of hanging.
"""

from __future__ import annotations

import numpy as np

from ..constants import D8X, D8Y, FLOWDIR_NO_DATA, NO_FLOW


def _neighbor_any(mask_src: np.ndarray, out: np.ndarray) -> None:
    """OR each cell's 8-neighbourhood of ``mask_src`` into ``out``
    (edges treated as False)."""
    h, w = mask_src.shape
    for n in range(1, 9):
        dx, dy = int(D8X[n]), int(D8Y[n])
        ys_d = slice(max(0, -dy), h - max(0, dy))
        xs_d = slice(max(0, -dx), w - max(0, dx))
        ys_s = slice(max(0, dy), h + min(0, dy))
        xs_s = slice(max(0, dx), w + min(0, dx))
        out[ys_d, xs_d] |= mask_src[ys_s, xs_s]


def _shifted_pred(elev, cmp, extra=None):
    """any-neighbour predicate: cmp(elev_nbr, elev_cell) [& extra_nbr]"""
    h, w = elev.shape
    out = np.zeros((h, w), bool)
    for n in range(1, 9):
        dx, dy = int(D8X[n]), int(D8Y[n])
        ys_d = slice(max(0, -dy), h - max(0, dy))
        xs_d = slice(max(0, -dx), w - max(0, dx))
        ys_s = slice(max(0, dy), h + min(0, dy))
        xs_s = slice(max(0, dx), w + min(0, dx))
        m = cmp(elev[ys_s, xs_s], elev[ys_d, xs_d])
        if extra is not None:
            m &= extra[ys_s, xs_s]
        out[ys_d, xs_d] |= m
    return out


def gradient_towards_lower(elev: np.ndarray, flowdirs: np.ndarray,
                           nodata_dir: int | None = None) -> np.ndarray:
    """inc1: sweeps survived while no draining-lower / frozen-equal
    neighbour exists (garbrecht.hpp:26-66)."""
    flats = flowdirs == NO_FLOW
    drains = flowdirs != NO_FLOW
    if nodata_dir is not None:
        drains &= flowdirs != nodata_dir
    inc1 = np.zeros(elev.shape, np.int32)
    # any draining strictly-lower neighbour: static across sweeps
    low_drain = _shifted_pred(elev, lambda nb, me: nb < me, extra=drains)
    loops = 0
    while True:
        frozen = inc1 < loops
        eq_frozen = _shifted_pred(
            elev, lambda nb, me: nb == me, extra=frozen)
        inc = flats & ~low_drain & ~eq_frozen
        if not inc.any():
            break
        inc1[inc] += 1
        loops += 1
    return inc1


def gradient_away_from_higher(elev: np.ndarray,
                              flowdirs: np.ndarray) -> np.ndarray:
    """inc2: wavefront from higher terrain (garbrecht.hpp:68-112);
    started cells keep incrementing each sweep, new cells start when a
    neighbour is higher or carries inc2 == 2."""
    flats = flowdirs == NO_FLOW
    inc2 = np.zeros(elev.shape, np.int32)
    higher = _shifted_pred(elev, lambda nb, me: nb > me)
    lower = _shifted_pred(elev, lambda nb, me: nb < me)
    remaining = int(flats.sum())
    while remaining > 0:
        started = flats & (inc2 > 0)
        inc2[started] += 1
        two = np.zeros(elev.shape, bool)
        _neighbor_any(inc2 == 2, two)
        newly = flats & (inc2 == 0) & (higher | two) & ~lower
        n_new = int(newly.sum())
        if n_new == 0:
            break  # no-higher-anywhere flat: reference would hang here
        inc2[newly] = 1
        remaining -= n_new
    return inc2


def garbrecht_alg(elev: np.ndarray, flowdirs: np.ndarray,
                  epsilon: float = 0.001,
                  nodata_dir: int | None = FLOWDIR_NO_DATA):
    """Full GarbrechtAlg (garbrecht.hpp:133-151): combine both gradient
    fields at ``epsilon`` and re-derive D8 directions.  Returns
    (new_elevations, new_flowdirs).

    ``nodata_dir`` mirrors the reference's ``flowdirs.noData()`` check in
    GradientTowardsLower (garbrecht.hpp:44): cells carrying it are never
    counted as draining neighbours."""
    from .d8 import d8_flow_directions

    inc1 = gradient_towards_lower(elev, flowdirs, nodata_dir=nodata_dir)
    inc2 = gradient_away_from_higher(elev, flowdirs)
    out = elev.astype(np.float64) + (
        (inc1 + inc2).astype(np.float32) * np.float32(epsilon)
    ).astype(np.float64)
    return out, d8_flow_directions(out)
