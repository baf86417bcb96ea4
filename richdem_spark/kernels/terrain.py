"""Focal (3x3 stencil) terrain-attribute kernels — fully vectorized.

Re-derivations of the reference's ``TerrainProcessor`` family
(``include/richdem/methods/terrain_attributes.hpp:180-354``):

* 3x3 window a..i with out-of-grid or NoData neighbours replaced by the
  centre value, all scaled by ``zscale`` (``TerrainSetup``, :180-204)
* Horn 1981 slope (riserun/percent/degrees/radians) and aspect (:229-300)
* Zevenbergen-Thorne 1987 curvature / planform / profile (:207-225,260-285)
* ``FindFlats`` (``include/richdem/flats/find_flats.hpp:28-69``)
* SPI / CTI two-raster combinations (:29-109)

All kernels take the whole (possibly halo-padded) grid; NoData centre cells
produce NoData output (TerrainProcessor, :345-350).
"""

from __future__ import annotations

import numpy as np

from ..constants import D8X, D8Y

# 3x3 slots in the reference's letter layout (terrain_attributes.hpp:212-214)
#   a b c        (x-1,y-1) (x,y-1) (x+1,y-1)
#   d e f
#   g h i
_OFFS = {
    "a": (-1, -1), "b": (0, -1), "c": (1, -1),
    "d": (-1, 0),  "e": (0, 0),  "f": (1, 0),
    "g": (-1, 1),  "h": (0, 1),  "i": (1, 1),
}


def _window(elev: np.ndarray, nodata: float | None, zscale: float):
    """Return dict of the 9 shifted planes with centre-substitution."""
    e = elev.astype(np.float64, copy=False)
    h, w = e.shape
    centre = e
    nd = (e == nodata) if nodata is not None else None
    planes = {}
    for k, (dx, dy) in _OFFS.items():
        if dx == 0 and dy == 0:
            planes[k] = centre * zscale
            continue
        p = centre.copy()
        ys = slice(max(0, dy), h + min(0, dy))
        xs = slice(max(0, dx), w + min(0, dx))
        ys_src = slice(max(0, -dy), h + min(0, -dy))
        xs_src = slice(max(0, -dx), w + min(0, -dx))
        block = e[ys, xs]
        if nd is not None:
            block = np.where(nd[ys, xs], centre[ys_src, xs_src], block)
        p[ys_src, xs_src] = block
        planes[k] = p * zscale
    return planes


def _mask_nodata(out: np.ndarray, elev, nodata, fill=-9999.0):
    if nodata is not None:
        out = np.where(elev == nodata, fill, out)
    return out


def _horn_gradients(elev, nodata, zscale, cell_lx, cell_ly):
    v = _window(elev, nodata, zscale)
    dzdx = ((v["c"] + 2 * v["f"] + v["i"]) - (v["a"] + 2 * v["d"] + v["g"])) \
        / 8.0 / cell_lx
    dzdy = ((v["g"] + 2 * v["h"] + v["i"]) - (v["a"] + 2 * v["b"] + v["c"])) \
        / 8.0 / cell_ly
    return dzdx, dzdy


def slope_riserun(elev, nodata=None, zscale=1.0, cell_lx=1.0, cell_ly=1.0):
    dzdx, dzdy = _horn_gradients(elev, nodata, zscale, cell_lx, cell_ly)
    return _mask_nodata(np.sqrt(dzdx**2 + dzdy**2), elev, nodata)


def slope_percentage(elev, nodata=None, zscale=1.0, cell_lx=1.0, cell_ly=1.0):
    dzdx, dzdy = _horn_gradients(elev, nodata, zscale, cell_lx, cell_ly)
    return _mask_nodata(100.0 * np.sqrt(dzdx**2 + dzdy**2), elev, nodata)


def slope_radians(elev, nodata=None, zscale=1.0, cell_lx=1.0, cell_ly=1.0):
    dzdx, dzdy = _horn_gradients(elev, nodata, zscale, cell_lx, cell_ly)
    return _mask_nodata(
        np.arctan(np.sqrt(dzdx**2 + dzdy**2)), elev, nodata
    )


def slope_degrees(elev, nodata=None, zscale=1.0, cell_lx=1.0, cell_ly=1.0):
    return _mask_nodata(
        np.degrees(np.arctan(slope_riserun(elev, nodata, zscale,
                                           cell_lx, cell_ly))),
        elev, nodata,
    )


def aspect(elev, nodata=None, zscale=1.0, cell_lx=1.0, cell_ly=1.0):
    """Horn 1981 compass aspect in degrees
    (terrain_attributes.hpp:229-243)."""
    dzdx, dzdy = _horn_gradients(elev, nodata, zscale, cell_lx, cell_ly)
    a = np.degrees(np.arctan2(dzdy, -dzdx))
    out = np.where(a < 0, 90 - a, np.where(a > 90, 360 - a + 90, 90 - a))
    return _mask_nodata(out, elev, nodata)


def _zt_terms(elev, nodata, zscale, cell_l):
    """Zevenbergen-Thorne D,E,F,G,H terms
    (terrain_attributes.hpp:207-225)."""
    v = _window(elev, nodata, zscale)
    L = cell_l
    D = ((v["d"] + v["f"]) / 2 - v["e"]) / L / L
    E = ((v["b"] + v["h"]) / 2 - v["e"]) / L / L
    F = (-v["a"] + v["c"] + v["g"] - v["i"]) / 4 / L / L
    G = (-v["d"] + v["f"]) / 2 / L
    H = (v["b"] - v["h"]) / 2 / L
    return D, E, F, G, H


def curvature(elev, nodata=None, zscale=1.0, cell_l=1.0):
    D, E, _F, _G, _H = _zt_terms(elev, nodata, zscale, cell_l)
    return _mask_nodata(-2 * (D + E) * 100, elev, nodata)


def planform_curvature(elev, nodata=None, zscale=1.0, cell_l=1.0):
    D, E, F, G, H = _zt_terms(elev, nodata, zscale, cell_l)
    denom = G * G + H * H
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(
            denom == 0, 0.0,
            -2 * (D * H * H + E * G * G - F * G * H) / denom * 100,
        )
    return _mask_nodata(out, elev, nodata)


def profile_curvature(elev, nodata=None, zscale=1.0, cell_l=1.0):
    D, E, F, G, H = _zt_terms(elev, nodata, zscale, cell_l)
    denom = G * G + H * H
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(
            denom == 0, 0.0,
            2 * (D * G * G + E * H * H + F * G * H) / denom * 100,
        )
    return _mask_nodata(out, elev, nodata)


TERRAIN_ATTRIBS = {
    "slope_riserun": slope_riserun,
    "slope_percentage": slope_percentage,
    "slope_degrees": slope_degrees,
    "slope_radians": slope_radians,
    "aspect": aspect,
    "curvature": curvature,
    "planform_curvature": planform_curvature,
    "profile_curvature": profile_curvature,
}


def find_flats(elev: np.ndarray, nodata: float | None = None) -> np.ndarray:
    """Flag cells with no lower D8 neighbour as flats (value 1)
    (include/richdem/flats/find_flats.hpp:28-69).  NoData -> 3."""
    h, w = elev.shape
    e = elev.astype(np.float64, copy=False)
    has_lower = np.zeros((h, w), dtype=bool)
    nd = (e == nodata) if nodata is not None else np.zeros((h, w), bool)
    for n in range(1, 9):
        dx, dy = int(D8X[n]), int(D8Y[n])
        ys = slice(max(0, dy), h + min(0, dy))
        xs = slice(max(0, dx), w + min(0, dx))
        ys_src = slice(max(0, -dy), h + min(0, -dy))
        xs_src = slice(max(0, -dx), w + min(0, -dx))
        lower = (e[ys, xs] < e[ys_src, xs_src]) & ~nd[ys, xs]
        has_lower[ys_src, xs_src] |= lower
    out = (~has_lower).astype(np.uint8)
    # grid-border cells always drain off-grid -> not flats
    out[0, :] = 0
    out[-1, :] = 0
    out[:, 0] = 0
    out[:, -1] = 0
    out[nd] = 3
    return out


def spi(accum: np.ndarray, slope_pct: np.ndarray, cell_area: float = 1.0,
        nodata_out: float = -9999.0) -> np.ndarray:
    """Stream power index ln(A/area * (slope% /100 + 0.001))
    (terrain_attributes.hpp:29-57)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.log(accum / cell_area * (slope_pct / 100.0 + 0.001))
    return np.where((accum < 0) | (slope_pct < 0), nodata_out, out)


def cti(accum: np.ndarray, slope_pct: np.ndarray, cell_area: float = 1.0,
        nodata_out: float = -9999.0) -> np.ndarray:
    """Topographic wetness index ln(A/area / (slope%/100 + 0.001))
    (terrain_attributes.hpp:81-109)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.log(accum / cell_area / (slope_pct / 100.0 + 0.001))
    return np.where((accum < 0) | (slope_pct < 0), nodata_out, out)


def dem_surface_area_grid(
    elev: np.ndarray, nodata: float | None, cell_lx: float = 1.0,
    cell_ly: float = 1.0,
) -> np.ndarray:
    """Per-cell Jenness 2004 triangle-area sums
    (misc/misc_methods.hpp:39-169): eight triangles to neighbour
    midpoints per cell; NoData / out-of-grid neighbours take the centre
    height.  Returns the per-cell area plane (0 at NoData cells) so
    tiled callers can sum only their core region over a halo-padded
    array (exact seam triangles)."""
    planes = _window(elev, nodata, 1.0)
    e = planes["e"]
    # neighbour order around the ring: b,c,f,i,h,g,d,a back to b
    ring = ["b", "c", "f", "i", "h", "g", "d", "a"]
    dists = {
        "b": cell_ly, "h": cell_ly, "d": cell_lx, "f": cell_lx,
        "a": np.hypot(cell_lx, cell_ly), "c": np.hypot(cell_lx, cell_ly),
        "g": np.hypot(cell_lx, cell_ly), "i": np.hypot(cell_lx, cell_ly),
    }
    total = np.zeros_like(e)
    for j in range(8):
        k1, k2 = ring[j], ring[(j + 1) % 8]
        # legs from centre to the midpoints of the two neighbour connections
        l1 = np.hypot((e - planes[k1]) / 2, dists[k1] / 2)
        l2 = np.hypot((e - planes[k2]) / 2, dists[k2] / 2)
        # midpoint-to-midpoint distance (planar) with height difference
        planar = np.hypot(
            (_OFFS[k1][0] * cell_lx - _OFFS[k2][0] * cell_lx) / 2,
            (_OFFS[k1][1] * cell_ly - _OFFS[k2][1] * cell_ly) / 2,
        )
        l3 = np.hypot((planes[k1] - planes[k2]) / 2, planar)
        s = (l1 + l2 + l3) / 2
        area = np.sqrt(np.maximum(s * (s - l1) * (s - l2) * (s - l3), 0.0))
        total += area
    if nodata is not None:
        total[elev == nodata] = 0.0
    return total


def dem_surface_area(
    elev: np.ndarray, nodata: float | None, cell_lx: float = 1.0,
    cell_ly: float = 1.0,
) -> float:
    """Whole-grid Jenness 2004 3D surface area; float64 accumulator as
    in the reference (misc_methods.hpp:58-71)."""
    return float(
        dem_surface_area_grid(elev, nodata, cell_lx, cell_ly).sum())
