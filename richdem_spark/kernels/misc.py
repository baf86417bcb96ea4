"""Misc kernels: BucketFill, upslope cells, histogram
(include/richdem/misc/misc_methods.hpp, methods/d8_methods.hpp)."""

from __future__ import annotations

from collections import deque

import numpy as np

from ..constants import D8_INVERSE, D8X, D8Y


def bucket_fill(
    grid: np.ndarray,
    seeds: list[tuple[int, int]],
    check_value: float,
    fill_value: float,
    topology: str = "D8",
) -> np.ndarray:
    """Conditional flood fill from seed cells
    (misc/misc_methods.hpp:258-306): every cell reachable from a seed
    through cells equal to ``check_value`` becomes ``fill_value``."""
    h, w = grid.shape
    out = grid.copy()
    slots = range(1, 9) if topology == "D8" else (1, 3, 5, 7)
    q = deque()
    for x, y in seeds:
        q.append((x, y))
    while q:
        x, y = q.popleft()
        if not (0 <= x < w and 0 <= y < h):
            continue
        if out[y, x] != check_value:
            continue
        out[y, x] = fill_value
        for n in slots:
            q.append((x + int(D8X[n]), y + int(D8Y[n])))
    return out


def bucket_fill_from_edges(
    grid: np.ndarray, check_value: float, fill_value: float,
    topology: str = "D8",
) -> np.ndarray:
    """BucketFillFromEdges (misc_methods.hpp:308-334)."""
    h, w = grid.shape
    seeds = [(x, 0) for x in range(w)] + [(x, h - 1) for x in range(w)]
    seeds += [(0, y) for y in range(h)] + [(w - 1, y) for y in range(h)]
    return bucket_fill(grid, seeds, check_value, fill_value, topology)


def _bresenham(x0, y0, x1, y1):
    """Integer line cells (d8_methods.hpp:167-199 seeding)."""
    cells = []
    dx = abs(x1 - x0)
    dy = abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx - dy
    x, y = x0, y0
    while True:
        cells.append((x, y))
        if x == x1 and y == y1:
            break
        e2 = 2 * err
        if e2 > -dy:
            err -= dy
            x += sx
        if e2 < dx:
            err += dx
            y += sy
    return cells


def d8_upslope_cells(
    flowdirs: np.ndarray, x0: int, y0: int, x1: int, y1: int
) -> np.ndarray:
    """Cells whose flow passes through the line (x0,y0)-(x1,y1): seed the
    line, reverse-BFS along inverse flow directions
    (methods/d8_methods.hpp:167-236).  Output: 1 on line, 2 upslope,
    0 elsewhere."""
    h, w = flowdirs.shape
    out = np.zeros((h, w), dtype=np.uint8)
    q = deque()
    for x, y in _bresenham(x0, y0, x1, y1):
        if 0 <= x < w and 0 <= y < h:
            out[y, x] = 1
            q.append((x, y))
    while q:
        x, y = q.popleft()
        for n in range(1, 9):
            nx, ny = x + int(D8X[n]), y + int(D8Y[n])
            if not (0 <= nx < w and 0 <= ny < h):
                continue
            if out[ny, nx] == 0 and flowdirs[ny, nx] == D8_INVERSE[n]:
                out[ny, nx] = 2
                q.append((nx, ny))
    return out


def value_histogram(grid: np.ndarray, nodata: float | None = None):
    """rd_hist (apps/rd_hist.cpp): value -> count."""
    a = grid.ravel()
    if nodata is not None:
        a = a[a != nodata]
    vals, counts = np.unique(a, return_counts=True)
    return dict(zip(vals.tolist(), counts.tolist()))
