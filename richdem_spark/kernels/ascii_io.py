"""Arc ASCII grid reader/writer — the reference's golden-fixture format.

Format (``/root/reference/tests/flow_accum/testdem1.d8:1-6``)::

    ncols         10
    nrows         10
    xllcorner     421568
    yllcorner     4872699
    cellsize      3
    NODATA_value  -1
    <nrows lines of ncols whitespace-separated values>

Returns (grid, meta) with grid[y, x]; row 0 is the top row, matching the
reference's ``Array2D`` load order.
"""

from __future__ import annotations

import io

import numpy as np


def read_ascii_grid(path_or_text: str, dtype=np.float64):
    """Parse an Arc ASCII grid file path or literal text."""
    if "\n" in path_or_text:
        text = path_or_text
    else:
        with open(path_or_text) as f:
            text = f.read()
    lines = [ln for ln in text.splitlines() if ln.strip()]
    meta: dict[str, float] = {}
    header_keys = {
        "ncols", "nrows", "xllcorner", "yllcorner", "cellsize", "nodata_value"
    }
    body_start = 0
    for i, ln in enumerate(lines):
        parts = ln.split()
        if len(parts) == 2 and parts[0].lower() in header_keys:
            meta[parts[0].lower()] = float(parts[1])
            body_start = i + 1
        else:
            break
    ncols = int(meta["ncols"])
    nrows = int(meta["nrows"])
    body = " ".join(lines[body_start:])
    grid = np.loadtxt(io.StringIO(body), dtype=dtype).reshape(nrows, ncols)
    meta.setdefault("nodata_value", -9999.0)
    # GDAL-style geotransform (Array2D.hpp:1152-1158): x of left edge,
    # cell width, 0, y of top edge, 0, negative cell height.
    cs = meta.get("cellsize", 1.0)
    meta["geotransform"] = [
        meta.get("xllcorner", 0.0), cs, 0.0,
        meta.get("yllcorner", 0.0) + nrows * cs, 0.0, -cs,
    ]
    return grid, meta


def write_ascii_grid(grid: np.ndarray, meta: dict | None = None) -> str:
    meta = meta or {}
    nrows, ncols = grid.shape
    out = [
        f"ncols         {ncols}",
        f"nrows         {nrows}",
        f"xllcorner     {meta.get('xllcorner', 0)}",
        f"yllcorner     {meta.get('yllcorner', 0)}",
        f"cellsize      {meta.get('cellsize', 1)}",
        f"NODATA_value  {meta.get('nodata_value', -9999)}",
    ]
    for row in grid:
        out.append(" ".join(str(v) for v in row))
    return "\n".join(out) + "\n"
