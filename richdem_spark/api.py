"""Public API mirroring pyRichDEM's surface
(``/root/reference/wrappers/pyrichdem/richdem/__init__.py``) over tile
DataFrames.  Every function is ``TiledRaster -> TiledRaster`` (immutable —
the reference's ``in_place`` mutation becomes a new DataFrame + a lineage
entry, SURVEY.md §7.3)."""

from __future__ import annotations

import numpy as np

from .constants import FLOWDIR_NO_DATA, TOPO_D8
from .kernels import terrain as _terrain
from .kernels.d8 import d8_flow_directions as _d8_dirs_kernel
from .ops.accum import flow_accumulation_d8
from .ops.fill import fill_depressions as _fill
from .ops.focal import apply_focal, elementwise
from .tiles import TiledRaster

# ---------------------------------------------------------------------------
# depression handling (richdem.FillDepressions, __init__.py:381-422)
# ---------------------------------------------------------------------------


def FillDepressions(
    tr: TiledRaster, epsilon: bool = False, topology: str = TOPO_D8
) -> TiledRaster:
    return _fill(tr, topology=topology, epsilon=epsilon)


# ---------------------------------------------------------------------------
# flow directions / flow accumulation (__init__.py:490-596)
# ---------------------------------------------------------------------------


def FlowDirectionsD8(tr: TiledRaster) -> TiledRaster:
    """D8 steepest-descent directions (flowmet/d8_flowdirs.hpp:96-123)."""
    return apply_focal(
        tr,
        _d8_dirs_kernel,
        out_dtype="uint8",
        out_nodata=float(FLOWDIR_NO_DATA),
        kernel_kwargs={"nodata": tr.meta.nodata},
        op_name="d8_flow_directions",
    )


_FA_METHODS = {
    "D8": None,  # direct dirs->accum path
    "OCallaghanD8": None,
}


def FlowAccumulation(tr: TiledRaster, method: str = "D8") -> TiledRaster:
    """elevations -> accumulation (methods/flow_accumulation.hpp:16-28).

    v1 supports the single-flow-direction methods (D8/OCallaghanD8) via the
    dirs->accum pipeline; multi-flow methods land with the props tensor.
    """
    if method not in _FA_METHODS:
        raise KeyError(
            f"method {method!r} not implemented; available: "
            f"{sorted(_FA_METHODS)}"
        )
    dirs = FlowDirectionsD8(tr)
    return flow_accumulation_d8(dirs)


def FlowAccumulationFromDirs(dirs: TiledRaster) -> TiledRaster:
    """accumulation directly from a D8 flowdir raster
    (methods/d8_methods.hpp:47-139)."""
    return flow_accumulation_d8(dirs)


# ---------------------------------------------------------------------------
# terrain attributes (richdem.TerrainAttribute, __init__.py:700-795)
# ---------------------------------------------------------------------------


def TerrainAttribute(
    tr: TiledRaster, attrib: str, zscale: float = 1.0
) -> TiledRaster:
    if attrib not in _terrain.TERRAIN_ATTRIBS:
        raise KeyError(
            f"attrib {attrib!r}; available {sorted(_terrain.TERRAIN_ATTRIBS)}"
        )
    kern = _terrain.TERRAIN_ATTRIBS[attrib]
    m = tr.meta
    if attrib in ("curvature", "planform_curvature", "profile_curvature"):
        kw = {"nodata": m.nodata, "zscale": zscale, "cell_l": m.cell_length_x}
    else:
        kw = {
            "nodata": m.nodata, "zscale": zscale,
            "cell_lx": m.cell_length_x, "cell_ly": m.cell_length_y,
        }
    return apply_focal(
        tr, kern, out_dtype="float64", out_nodata=-9999.0,
        kernel_kwargs=kw, op_name=f"TA_{attrib}",
    )


def FindFlats(tr: TiledRaster) -> TiledRaster:
    return apply_focal(
        tr, _terrain.find_flats, out_dtype="uint8", out_nodata=3.0,
        kernel_kwargs={"nodata": tr.meta.nodata}, op_name="find_flats",
    )


# ---------------------------------------------------------------------------
# elementwise utilities (§2.2)
# ---------------------------------------------------------------------------


def Replace(tr: TiledRaster, old: float, new: float) -> TiledRaster:
    """Array2D::replace (common/Array2D.hpp:544-548)."""
    return elementwise(
        tr, lambda a: np.where(a == old, new, a), op_name="replace"
    )


def Scale(tr: TiledRaster, factor: float) -> TiledRaster:
    """Array2D::scale (Array2D.hpp:1406-1410) — NoData preserved."""
    nd = tr.meta.nodata

    def f(a):
        out = a * factor
        if nd is not None:
            out = np.where(a == nd, a, out)
        return out

    return elementwise(tr, f, out_dtype="float64", op_name="scale")


def PitMask(tr: TiledRaster) -> TiledRaster:
    """1=in depression, 0=not, 3=NoData (Barnes2014.hpp:593-676) —
    derived as (filled != original) on the distributed fill."""
    filled = _fill(tr)
    nd = tr.meta.nodata
    orig_cells = tr.cells().withColumnRenamed("value", "orig")
    fill_cells = filled.cells().withColumnRenamed("value", "fill")
    from pyspark.sql import functions as F

    joined = orig_cells.join(fill_cells, ["x", "y"])
    out = joined.select(
        "x", "y",
        F.when(F.col("orig") == F.lit(nd), F.lit(3))
        .when(F.col("fill") != F.col("orig"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("value"),
    ) if nd is not None else joined.select(
        "x", "y",
        F.when(F.col("fill") != F.col("orig"), F.lit(1)).otherwise(F.lit(0))
        .cast("int").alias("value"),
    )
    return out  # exploded-cell DataFrame (relational edge)
