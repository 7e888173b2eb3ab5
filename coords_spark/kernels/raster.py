"""Tile rasterization kernel (pure numpy, Spark-free) — the render last
mile (SURVEY.md §3 E3: "read tile files -> deserialize -> bbox filter ->
render"; the reference delegates actual pixel output to a companion Mapnik
plugin [M], and its own correctness check is visual — SURVEY §5). We make
that check computable: way polylines -> a deterministic uint8 tile mask.

Pixel rule (INTEGER math only, so the scalar golden twin in
tools/gen_goldens.py can replicate it exactly, independent of any float
line-walk library):

    for segment (x0,y0)->(x1,y1) in tile-pixel coords:
        n = max(|x1-x0|, |y1-y0|) + 1 sample points
        point k in 0..n-1:  px = x0 + floor((x1-x0)*k / (n-1))   (n > 1)
                            py = y0 + floor((y1-y0)*k / (n-1))
    samples outside [0,w)x[0,h) are clipped; hit pixels get 255.

floor division on negatives is floor in both numpy and Python — the two
implementations cannot drift. n samples guarantee 8-connected coverage
(adjacent samples differ by <=1 on the dominant axis).
"""

from __future__ import annotations

import numpy as np


def rasterize_segments(x0, y0, x1, y1, w: int = 256, h: int = 256) -> np.ndarray:
    """Vectorized over ALL segments of one tile: one concatenated sample
    index space (repeat/cumsum, the LEB128-kernel pattern), one fancy-index
    store. Returns the (h, w) uint8 mask."""
    x0 = np.asarray(x0, dtype=np.int64)
    y0 = np.asarray(y0, dtype=np.int64)
    x1 = np.asarray(x1, dtype=np.int64)
    y1 = np.asarray(y1, dtype=np.int64)
    img = np.zeros((h, w), np.uint8)
    if x0.size == 0:
        return img
    dx = x1 - x0
    dy = y1 - y0
    n = np.maximum(np.abs(dx), np.abs(dy)) + 1
    off = np.concatenate(([0], np.cumsum(n)[:-1]))
    seg = np.repeat(np.arange(n.size), n)
    k = np.arange(int(n.sum()), dtype=np.int64) - off[seg]
    denom = np.maximum(n[seg] - 1, 1)
    px = x0[seg] + (dx[seg] * k) // denom
    py = y0[seg] + (dy[seg] * k) // denom
    m = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    img[py[m], px[m]] = 255
    return img


def rasterize_segments_scalar(x0, y0, x1, y1, w: int = 256, h: int = 256) -> np.ndarray:
    """Per-sample Python loop stating the pixel rule directly — the unit
    test pins the vectorized kernel against it (the golden generator keeps
    its own third copy)."""
    img = np.zeros((h, w), np.uint8)
    for a, b, c, d in zip(x0, y0, x1, y1):
        a, b, c, d = int(a), int(b), int(c), int(d)
        n = max(abs(c - a), abs(d - b)) + 1
        for k in range(n):
            px = a + ((c - a) * k) // max(n - 1, 1)
            py = b + ((d - b) * k) // max(n - 1, 1)
            if 0 <= px < w and 0 <= py < h:
                img[py, px] = 255
    return img
