"""Quadkey / Z-order cell algebra over web-mercator space (SURVEY.md §2.4 T2/T4).

Models the COORDS quadtree tile addressing (REF? src/tiles.h/.cc [M],
SURVEY.md §0 — reference mount empty, rules per blueprint): the world is a
square in web-mercator unit space [0,1)^2; a cell at level L is one of
4^L equal squares; a geometry lives in the *deepest* cell that fully
contains its envelope.

Cell id packing (int64, always non-negative):

    cell_id = (zcode_at_level << 6) | level        0 <= level <= 26

``zcode_at_level`` interleaves the top ``level`` bits of the grid x
(even bit positions, bit 0 = x) and grid y (odd positions) coordinates.
Level 26 => 52 zcode bits => cell_id < 2^58, safely inside int64.

Everything here is pure numpy, vectorized over arrays; scalars work too
(returned as numpy scalars). No Spark imports.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 26
LEVEL_BITS = 6
LEVEL_MASK = np.uint64((1 << LEVEL_BITS) - 1)
GRID = 1 << MAX_LEVEL  # grid resolution at max level per axis

_U = np.uint64


def _as_u64(a) -> np.ndarray:
    return np.asarray(a).astype(np.uint64)


def part1by1(x) -> np.ndarray:
    """Spread the low 32 bits of x so bit i lands at position 2*i."""
    x = _as_u64(x) & _U(0xFFFFFFFF)
    x = (x | (x << _U(16))) & _U(0x0000FFFF0000FFFF)
    x = (x | (x << _U(8))) & _U(0x00FF00FF00FF00FF)
    x = (x | (x << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << _U(2))) & _U(0x3333333333333333)
    x = (x | (x << _U(1))) & _U(0x5555555555555555)
    return x


def compact1by1(z) -> np.ndarray:
    """Inverse of part1by1: gather even bits of z into the low 32 bits."""
    z = _as_u64(z) & _U(0x5555555555555555)
    z = (z | (z >> _U(1))) & _U(0x3333333333333333)
    z = (z | (z >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    z = (z | (z >> _U(4))) & _U(0x00FF00FF00FF00FF)
    z = (z | (z >> _U(8))) & _U(0x0000FFFF0000FFFF)
    z = (z | (z >> _U(16))) & _U(0x00000000FFFFFFFF)
    return z


def unit_to_grid(ux, uy) -> tuple[np.ndarray, np.ndarray]:
    """Unit-square [0,1) coords -> integer grid coords at MAX_LEVEL."""
    gx = np.clip((np.asarray(ux, dtype=np.float64) * GRID).astype(np.int64), 0, GRID - 1)
    gy = np.clip((np.asarray(uy, dtype=np.float64) * GRID).astype(np.int64), 0, GRID - 1)
    return gx, gy


def zencode(gx, gy) -> np.ndarray:
    """Grid coords at MAX_LEVEL -> 52-bit Z code (uint64)."""
    return part1by1(gx) | (part1by1(gy) << _U(1))


def zdecode(z) -> tuple[np.ndarray, np.ndarray]:
    z = _as_u64(z)
    return compact1by1(z).astype(np.int64), compact1by1(z >> _U(1)).astype(np.int64)


def cell_make(z_at_level, level) -> np.ndarray:
    """Pack (zcode truncated to `level`, level) into an int64 cell id."""
    z = _as_u64(z_at_level)
    lv = _as_u64(level)
    return ((z << _U(LEVEL_BITS)) | lv).astype(np.int64)


def cell_level(cell) -> np.ndarray:
    return (_as_u64(cell) & LEVEL_MASK).astype(np.int64)


def cell_zcode(cell) -> np.ndarray:
    """Z code right-aligned at the cell's own level (2*level bits)."""
    return (_as_u64(cell) >> _U(LEVEL_BITS)).astype(np.int64)


def cell_from_point(gx, gy, level) -> np.ndarray:
    """Cell at `level` containing grid point (gx, gy) (MAX_LEVEL units)."""
    z = zencode(gx, gy)
    lv = _as_u64(level)
    shift = _U(2) * (_U(MAX_LEVEL) - lv)
    return cell_make(z >> shift, lv)


def z_ancestor(cell, level) -> np.ndarray:
    """Ancestor of `cell` at `level` (level must be <= cell's level)."""
    cur = _as_u64(cell_level(cell))
    lv = _as_u64(level)
    z = _as_u64(cell_zcode(cell))
    shift = _U(2) * (cur - lv)
    return cell_make(z >> shift, lv)


def _bit_length_u64(x) -> np.ndarray:
    """Bit length for values < 2^53 (exact in float64)."""
    x = _as_u64(x)
    f = x.astype(np.float64)
    with np.errstate(divide="ignore"):
        bl = np.where(x == 0, 0, np.floor(np.log2(np.maximum(f, 1.0))).astype(np.int64) + 1)
    return bl


def deepest_common_cell(gx0, gy0, gx1, gy1, max_level: int = MAX_LEVEL) -> np.ndarray:
    """T4: the deepest cell fully containing the envelope [gx0,gx1]x[gy0,gy1].

    Closed form, no recursion (SURVEY.md §2.4): the answer is the longest
    common even-length Z-prefix of the two corner codes, capped at
    `max_level`. Matches COORDS' "geometry lives in the deepest tile that
    fully contains it" placement (REF? FileBackedTile::add [M]).
    """
    z0 = zencode(gx0, gy0)
    z1 = zencode(gx1, gy1)
    x = z0 ^ z1
    nbits = _bit_length_u64(x)  # highest differing bit position + 1
    # number of common leading bit-pairs out of MAX_LEVEL pairs
    common_pairs = (np.int64(2 * MAX_LEVEL) - nbits) // 2
    level = np.minimum(common_pairs, np.int64(max_level))
    level = np.maximum(level, 0)
    lv = _as_u64(level)
    shift = _U(2) * (_U(MAX_LEVEL) - lv)
    return cell_make(z0 >> shift, lv)


def cell_xy(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(x, y, level) of the cell in its own level's grid."""
    lv = cell_level(cell)
    z = _as_u64(cell_zcode(cell))
    return compact1by1(z).astype(np.int64), compact1by1(z >> _U(1)).astype(np.int64), lv


def cell_from_xy(x, y, level) -> np.ndarray:
    z = part1by1(x) | (part1by1(y) << _U(1))
    return cell_make(z, level)


def cell_bounds_units(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Half-open bounds [x0, y0, x1, y1) of the cell in MAX_LEVEL grid units."""
    x, y, lv = cell_xy(cell)
    size = np.int64(1) << (np.int64(MAX_LEVEL) - lv).astype(np.int64)
    return x * size, y * size, (x + 1) * size, (y + 1) * size


def cell_zrange_at_max(cell) -> tuple[np.ndarray, np.ndarray]:
    """Inclusive [zmin, zmax] of the cell's descendants' Z codes at MAX_LEVEL.

    Drives chunk-range pruning (S5): descendants of a cell form one
    contiguous Z range.
    """
    lv = _as_u64(cell_level(cell))
    z = _as_u64(cell_zcode(cell))
    shift = _U(2) * (_U(MAX_LEVEL) - lv)
    zmin = z << shift
    zmax = zmin | ((_U(1) << shift) - _U(1))
    return zmin.astype(np.int64), zmax.astype(np.int64)


def cell_children(cell) -> np.ndarray:
    """The 4 children of each cell; shape (..., 4). Level must be < MAX_LEVEL."""
    lv = _as_u64(cell_level(cell))
    z = _as_u64(cell_zcode(cell))
    base = (z << _U(2))[..., None] | np.arange(4, dtype=np.uint64)
    return cell_make(base, (lv + _U(1))[..., None])


def cell_parent(cell) -> np.ndarray:
    lv = cell_level(cell)
    return z_ancestor(cell, np.maximum(lv - 1, 0))


def cell_ring(cell: int, r: int) -> np.ndarray:
    """Cells at Chebyshev distance exactly r from `cell` at the same level
    (r=0 -> the cell itself), clipped to the grid (no wraparound). Scalar
    cell; used by the kNN ring expansion (J5)."""
    x, y, lv = cell_xy(np.asarray(cell))
    x, y, lv = int(x), int(y), int(lv)
    n = 1 << lv
    out = []
    if r == 0:
        return np.asarray([int(cell_from_xy(x, y, lv))], dtype=np.int64)
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            if max(abs(dx), abs(dy)) != r:
                continue
            nx, ny = x + dx, y + dy
            if 0 <= nx < n and 0 <= ny < n:
                out.append((nx, ny))
    if not out:
        return np.empty(0, dtype=np.int64)
    xs = np.asarray([p[0] for p in out], dtype=np.int64)
    ys = np.asarray([p[1] for p in out], dtype=np.int64)
    return cell_from_xy(xs, ys, lv).astype(np.int64)


def cell_disk(cell: int, r: int) -> np.ndarray:
    """All cells within Chebyshev distance <= r (the union of rings 0..r)."""
    parts = [cell_ring(cell, i) for i in range(r + 1)]
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)


def _merge_ranges(lo: np.ndarray, hi: np.ndarray) -> list[tuple[int, int]]:
    """Merge sorted [lo, hi] inclusive integer ranges that touch/overlap."""
    out: list[tuple[int, int]] = []
    for a, b in zip(lo.tolist(), hi.tolist()):
        if out and a <= out[-1][1] + 1:
            if b > out[-1][1]:
                out[-1] = (out[-1][0], b)
        else:
            out.append((a, b))
    return out


def bbox_cover_ranges(
    gx0: int, gy0: int, gx1: int, gy1: int, zoom: int, max_level: int = MAX_LEVEL,
    max_cover_cells: int = 1024,
) -> list[tuple[int, int]]:
    """Inclusive CELL-ID ranges covering every cell at levels 0..max_level
    that may intersect the envelope [gx0,gx1]x[gy0,gy1] (MAX_LEVEL grid
    units) — the quadtree walk of a bbox+zoom render query, as ranges.

    Construction per level L (driver-side, bounded by |cover at zoom| x
    levels — never data-sized):
      * L <  zoom: the EXACT set of level-L cells intersecting the bbox is
        the ancestor set of the zoom-level cover (a level-L cell intersects
        the bbox iff one of its zoom-level descendants does);
      * L >= zoom: the descendants of each cover cell form ONE contiguous
        zcode range of width 4^(L-zoom) — a conservative superset of the
        intersecting cells (exactness is not needed: readers re-filter
        rows by the bbox; ranges only drive file/row-group pruning).
    Adjacent/overlapping ranges merge per level, so a viewport's range
    count stays ~O(rows-of-cover x levels). The effective cover level
    auto-coarsens until the cover holds <= max_cover_cells cells (a deep
    zoom over a wide viewport stays conservative rather than unbounded —
    exactness is never required above the exact row filter)."""
    zoom = int(min(max(zoom, 0), MAX_LEVEL))
    max_level = int(min(max_level, MAX_LEVEL))
    while zoom > 0:
        shift = MAX_LEVEL - zoom
        n_cells = ((int(gx1) >> shift) - (int(gx0) >> shift) + 1) * (
            (int(gy1) >> shift) - (int(gy0) >> shift) + 1
        )
        if n_cells <= max_cover_cells:
            break
        zoom -= 1
    cover = cover_envelope(gx0, gy0, gx1, gy1, zoom)
    zc = np.sort(cell_zcode(cover).astype(np.int64))
    ranges: list[tuple[int, int]] = []
    for lv in range(0, max_level + 1):
        if lv < zoom:
            anc = np.unique(zc >> np.int64(2 * (zoom - lv)))
            lo = hi = anc
        else:
            shift = np.int64(2 * (lv - zoom))
            lo = zc << shift
            hi = ((zc + 1) << shift) - 1
        for a, b in _merge_ranges(lo, hi):
            ranges.append((int(cell_make(a, lv)), int(cell_make(b, lv))))
    return ranges


def cover_envelope(gx0, gy0, gx1, gy1, level: int) -> np.ndarray:
    """All level-`level` cells intersecting the envelope (scalar envelope).

    Used to pre-rasterize polygons into covering cell sets for the PIP
    broadcast join (J4)."""
    shift = MAX_LEVEL - level
    x0, x1 = int(gx0) >> shift, int(gx1) >> shift
    y0, y1 = int(gy0) >> shift, int(gy1) >> shift
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    xx, yy = np.meshgrid(xs, ys)
    return cell_from_xy(xx.ravel(), yy.ravel(), level).astype(np.int64)
