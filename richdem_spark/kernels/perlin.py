"""Deterministic Perlin-noise terrain generator (test source).

Re-derivation of the reference's ``generate_perlin_terrain``
(``src/terrain_generation/terrain_generation.cpp:11-25``): value(x, y) =
``noise(10*x/size, 10*y/size, 0.8)`` using Ken Perlin's improved-noise
algorithm with the published reference permutation
(``src/terrain_generation/PerlinNoise.cpp``, http://mrl.nyu.edu/~perlin/noise/).

The reference's *seeded* constructor shuffles with libstdc++'s
``std::default_random_engine`` (implementation-defined, not reproducible
from Python); our seeded variant uses an explicit Fisher-Yates over a
splitmix64 stream instead — deterministic across languages/cluster sizes.
Fully vectorized NumPy.
"""

from __future__ import annotations

import numpy as np

_REF_PERM = np.array([
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225,
    140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148,
    247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32,
    57, 177, 33, 88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68,
    175, 74, 165, 71, 134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111,
    229, 122, 60, 211, 133, 230, 220, 105, 92, 41, 55, 46, 245, 40, 244,
    102, 143, 54, 65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132, 187, 208,
    89, 18, 169, 200, 196, 135, 130, 116, 188, 159, 86, 164, 100, 109,
    198, 173, 186, 3, 64, 52, 217, 226, 250, 124, 123, 5, 202, 38, 147,
    118, 126, 255, 82, 85, 212, 207, 206, 59, 227, 47, 16, 58, 17, 182,
    189, 28, 42, 223, 183, 170, 213, 119, 248, 152, 2, 44, 154, 163, 70,
    221, 153, 101, 155, 167, 43, 172, 9, 129, 22, 39, 253, 19, 98, 108,
    110, 79, 113, 224, 232, 178, 185, 112, 104, 218, 246, 97, 228, 251,
    34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241, 81, 51, 145,
    235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157, 184,
    84, 204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93,
    222, 114, 67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156,
    180,
], dtype=np.int64)


def _perm(seed: int | None) -> np.ndarray:
    if seed is None:
        p = _REF_PERM.copy()
    else:
        # deterministic Fisher-Yates over a splitmix64 stream
        p = np.arange(256, dtype=np.int64)
        state = seed & (2**64 - 1)
        for i in range(255, 0, -1):  # splitmix64 in plain ints (wrapping)
            state = (state + 0x9E3779B97F4A7C15) & (2**64 - 1)
            z = state
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
            z = z ^ (z >> 31)
            j = z % (i + 1)
            p[i], p[j] = p[j], p[i]
    return np.concatenate([p, p])


def _fade(t):
    return t * t * t * (t * (t * 6 - 15) + 10)


def _grad(h, x, y, z):
    h = h & 15
    u = np.where(h < 8, x, y)
    v = np.where(h < 4, y, np.where((h == 12) | (h == 14), x, z))
    return np.where(h & 1 == 0, u, -u) + np.where(h & 2 == 0, v, -v)


def perlin_noise(x, y, z, perm: np.ndarray):
    X = np.floor(x).astype(np.int64) & 255
    Y = np.floor(y).astype(np.int64) & 255
    Z = np.floor(z).astype(np.int64) & 255
    x = x - np.floor(x)
    y = y - np.floor(y)
    z = z - np.floor(z)
    u, v, w = _fade(x), _fade(y), _fade(z)
    p = perm
    A = p[X] + Y
    AA = p[A] + Z
    AB = p[A + 1] + Z
    B = p[X + 1] + Y
    BA = p[B] + Z
    BB = p[B + 1] + Z

    def lerp(t, a, b):
        return a + t * (b - a)

    res = lerp(
        w,
        lerp(
            v,
            lerp(u, _grad(p[AA], x, y, z), _grad(p[BA], x - 1, y, z)),
            lerp(u, _grad(p[AB], x, y - 1, z),
                 _grad(p[BB], x - 1, y - 1, z)),
        ),
        lerp(
            v,
            lerp(u, _grad(p[AA + 1], x, y, z - 1),
                 _grad(p[BA + 1], x - 1, y, z - 1)),
            lerp(u, _grad(p[AB + 1], x, y - 1, z - 1),
                 _grad(p[BB + 1], x - 1, y - 1, z - 1)),
        ),
    )
    return (res + 1.0) / 2.0


def generate_perlin_terrain(size: int, seed: int | None = None,
                            y0: int = 0, x0: int = 0,
                            h: int | None = None,
                            w: int | None = None) -> np.ndarray:
    """Square Perlin DEM; value = noise(10*x/size, 10*y/size, 0.8)
    (terrain_generation.cpp:21-23).  ``y0/x0/h/w`` carve a window so tiles
    can be generated independently on executors (cell-exact regardless of
    tiling)."""
    h = h if h is not None else size
    w = w if w is not None else size
    perm = _perm(seed)
    yy, xx = np.mgrid[y0 : y0 + h, x0 : x0 + w]
    return perlin_noise(
        10.0 * xx / size, 10.0 * yy / size,
        np.full(xx.shape, 0.8), perm,
    )
