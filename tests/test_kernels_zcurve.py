"""Kernel unit tests: zcurve cell algebra (no Spark). SURVEY.md §5.3.1."""

import numpy as np
import pytest

from coords_spark.kernels import zcurve as zc


def rng(seed=7):
    return np.random.default_rng(seed)


def test_interleave_roundtrip():
    r = rng()
    x = r.integers(0, zc.GRID, 10000)
    y = r.integers(0, zc.GRID, 10000)
    z = zc.zencode(x, y)
    x2, y2 = zc.zdecode(z)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)


def test_cell_pack_unpack():
    r = rng(1)
    x = r.integers(0, zc.GRID, 1000)
    y = r.integers(0, zc.GRID, 1000)
    for level in (0, 1, 5, 13, 26):
        c = zc.cell_from_point(x, y, level)
        assert np.all(zc.cell_level(c) == level)
        cx, cy, lv = zc.cell_xy(c)
        np.testing.assert_array_equal(cx, x >> (zc.MAX_LEVEL - level))
        np.testing.assert_array_equal(cy, y >> (zc.MAX_LEVEL - level))
        assert np.all(np.asarray(c) >= 0)


def test_ancestor_consistency():
    r = rng(2)
    x = r.integers(0, zc.GRID, 1000)
    y = r.integers(0, zc.GRID, 1000)
    c26 = zc.cell_from_point(x, y, 26)
    for level in (0, 3, 12, 25):
        np.testing.assert_array_equal(
            zc.z_ancestor(c26, level), zc.cell_from_point(x, y, level)
        )


def test_deepest_common_cell_brute_force():
    r = rng(3)
    for _ in range(300):
        x0, x1 = sorted(r.integers(0, zc.GRID, 2).tolist())
        y0, y1 = sorted(r.integers(0, zc.GRID, 2).tolist())
        got = int(zc.deepest_common_cell(x0, y0, x1, y1))
        # brute force: deepest level where both corners land in the same cell
        want_level = 0
        for lv in range(zc.MAX_LEVEL, -1, -1):
            s = zc.MAX_LEVEL - lv
            if (x0 >> s) == (x1 >> s) and (y0 >> s) == (y1 >> s):
                want_level = lv
                break
        want = int(zc.cell_from_point(x0, y0, want_level))
        assert got == want


def test_deepest_common_cell_point_is_max_level():
    c = zc.deepest_common_cell(12345, 67890, 12345, 67890)
    assert int(zc.cell_level(c)) == zc.MAX_LEVEL


def test_children_parent():
    c = zc.cell_from_point(np.asarray([100]), np.asarray([200]), 10)
    kids = zc.cell_children(c)
    assert kids.shape == (1, 4)
    for k in kids[0]:
        assert int(zc.cell_parent(k)) == int(c[0])
        assert int(zc.cell_level(k)) == 11


def test_zrange_contains_descendants():
    r = rng(4)
    x = int(r.integers(0, zc.GRID))
    y = int(r.integers(0, zc.GRID))
    c = zc.cell_from_point(x, y, 8)
    zmin, zmax = zc.cell_zrange_at_max(c)
    z = int(zc.zencode(x, y))
    assert int(zmin) <= z <= int(zmax)
    # a point outside the cell is outside the range
    ox = x ^ (1 << 25)  # flip the top x bit -> different level-1 subtree
    zo = int(zc.zencode(ox, y))
    assert not (int(zmin) <= zo <= int(zmax))


def test_ring_counts_and_clipping():
    # interior cell: ring r has 8r cells
    c = int(zc.cell_from_xy(np.asarray([16]), np.asarray([16]), np.asarray([6]))[0])
    assert zc.cell_ring(c, 0).shape[0] == 1
    assert zc.cell_ring(c, 1).shape[0] == 8
    assert zc.cell_ring(c, 2).shape[0] == 16
    # corner cell: clipped
    corner = int(zc.cell_from_xy(np.asarray([0]), np.asarray([0]), np.asarray([6]))[0])
    assert zc.cell_ring(corner, 1).shape[0] == 3
    assert zc.cell_disk(c, 2).shape[0] == 25


def test_cover_envelope():
    cells = zc.cover_envelope(0, 0, zc.GRID - 1, zc.GRID - 1, 1)
    assert sorted(int(zc.cell_level(c)) for c in cells) == [1, 1, 1, 1]
    assert len(set(cells.tolist())) == 4
    one = zc.cover_envelope(5, 5, 6, 6, zc.MAX_LEVEL)
    assert one.shape[0] == 4  # 2x2 cells at max level


def test_bounds():
    c = zc.cell_from_point(np.asarray([12345]), np.asarray([54321]), 5)
    x0, y0, x1, y1 = zc.cell_bounds_units(c)
    assert x0[0] <= 12345 < x1[0]
    assert y0[0] <= 54321 < y1[0]
    assert x1[0] - x0[0] == 1 << (zc.MAX_LEVEL - 5)


@pytest.mark.parametrize("level", [0, 7, 26])
def test_scalar_inputs(level):
    c = zc.cell_from_point(1000, 2000, level)
    assert int(zc.cell_level(c)) == level


def test_bbox_cover_ranges_complete_and_tight():
    """Every cell at every level intersecting the bbox must fall inside some
    range (completeness — file pruning must never drop a viewport file);
    below the query zoom the ranges must be EXACT (no spurious cells)."""
    from coords_spark.kernels import zcurve

    rng = np.random.default_rng(7)
    for _ in range(20):
        zoom = int(rng.integers(2, 9))
        max_level = int(rng.integers(zoom, 11))
        gx0 = int(rng.integers(0, zcurve.GRID - 2))
        gy0 = int(rng.integers(0, zcurve.GRID - 2))
        gx1 = min(gx0 + int(rng.integers(1, zcurve.GRID // 64)), zcurve.GRID - 1)
        gy1 = min(gy0 + int(rng.integers(1, zcurve.GRID // 64)), zcurve.GRID - 1)
        ranges = zcurve.bbox_cover_ranges(gx0, gy0, gx1, gy1, zoom, max_level)
        by_level: dict[int, list[tuple[int, int]]] = {}
        for lo, hi in ranges:
            lv = int(zcurve.cell_level(np.asarray(lo)))
            assert lv == int(zcurve.cell_level(np.asarray(hi)))
            by_level.setdefault(lv, []).append((lo, hi))
        assert sorted(by_level) == list(range(max_level + 1))
        for lv in range(max_level + 1):
            cells = zcurve.cover_envelope(gx0, gy0, gx1, gy1, lv)
            rs = by_level[lv]
            for c in cells.tolist():
                assert any(lo <= c <= hi for lo, hi in rs), (lv, c)
            if lv <= zoom:
                # exactness below/at the zoom: total range width == |cells|
                width = sum(
                    (int(zcurve.cell_zcode(np.asarray(hi))) - int(zcurve.cell_zcode(np.asarray(lo))) + 1)
                    for lo, hi in rs
                )
                assert width == len(cells), (lv, width, len(cells))


def test_bbox_cover_ranges_bounded_for_wide_deep_viewports():
    """A deep zoom over a huge viewport must auto-coarsen: the range list
    stays small and bounded, and completeness survives (every level-L cell
    intersecting the bbox falls in some range) — file pruning must never
    drop a viewport file no matter the zoom/extent combination."""
    from coords_spark.kernels import zcurve

    g = zcurve.GRID
    # half the planet at zoom 20: raw cover would be ~2^38 cells
    ranges = zcurve.bbox_cover_ranges(0, 0, g // 2, g // 2, zoom=20, max_level=12)
    assert len(ranges) < 5000, len(ranges)
    for lv in (0, 3, 6):
        cells = zcurve.cover_envelope(0, 0, g // 2, g // 2, lv)
        rs = [
            (lo, hi)
            for lo, hi in ranges
            if int(zcurve.cell_level(np.asarray(lo))) == lv
        ]
        for c in cells.tolist():
            assert any(lo <= c <= hi for lo, hi in rs), (lv, c)
