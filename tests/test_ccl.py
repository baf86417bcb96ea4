"""Vectorized connected components / flood fill vs BFS oracle."""

from collections import deque

import numpy as np

from richdem_spark.kernels.ccl import flood, label_components


def _bfs_cc(mask):
    h, w = mask.shape
    out = np.zeros((h, w), np.int64)
    nxt = 1
    for y in range(h):
        for x in range(w):
            if mask[y, x] and out[y, x] == 0:
                q = deque([(y, x)])
                out[y, x] = nxt
                while q:
                    cy, cx = q.popleft()
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            ny, nx = cy + dy, cx + dx
                            if (0 <= ny < h and 0 <= nx < w
                                    and mask[ny, nx]
                                    and out[ny, nx] == 0):
                                out[ny, nx] = nxt
                                q.append((ny, nx))
                nxt += 1
    return out


def test_components_match_bfs():
    rng = np.random.default_rng(0)
    for trial in range(6):
        mask = rng.random((30, 40)) < 0.25 + 0.1 * trial
        a = label_components(mask)
        b = _bfs_cc(mask)
        for comp in np.unique(b[b > 0]):
            assert len(np.unique(a[b == comp])) == 1
        for comp in np.unique(a[a > 0]):
            assert len(np.unique(b[a == comp])) == 1
        assert ((a > 0) == mask).all()


def test_flood_from_seeds():
    mask = np.zeros((10, 10), bool)
    mask[1:4, 1:4] = True   # blob A
    mask[6:9, 6:9] = True   # blob B (not connected to A)
    seeds = np.zeros((10, 10), bool)
    seeds[2, 2] = True
    out = flood(seeds, mask)
    assert out[1:4, 1:4].all()
    assert not out[6:9, 6:9].any()
