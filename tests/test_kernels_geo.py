"""Kernel unit tests: mercator, PIP, simplify, geomblob (no Spark)."""

import numpy as np

from coords_spark.kernels import geomblob, mercator, pip, simplify


def test_mercator_roundtrip():
    r = np.random.default_rng(11)
    lat = r.integers(-850000000, 850000000, 5000)
    lon = r.integers(-1800000000, 1799999999, 5000)
    ux, uy = mercator.latlon_i32_to_unit(lat, lon)
    assert np.all((ux >= 0) & (ux < 1) & (uy >= 0) & (uy < 1))
    lat2, lon2 = mercator.unit_to_latlon_deg(ux, uy)
    np.testing.assert_allclose(lat2, lat * 1e-7, atol=1e-9)
    np.testing.assert_allclose(lon2, lon * 1e-7, atol=1e-9)


def test_mercator_known_points():
    ux, uy = mercator.latlon_i32_to_unit(np.asarray([0]), np.asarray([0]))
    np.testing.assert_allclose([ux[0], uy[0]], [0.5, 0.5], atol=1e-12)
    # north pole clamp -> y ~ 0
    ux, uy = mercator.latlon_i32_to_unit(np.asarray([900000000]), np.asarray([0]))
    assert uy[0] < 1e-9


def test_haversine():
    # London->Paris ~343 km
    d = mercator.haversine_m(51.5074, -0.1278, 48.8566, 2.3522)
    assert 330000 < float(d) < 350000
    assert float(mercator.haversine_m(10, 20, 10, 20)) == 0.0


def _segments_crossing_count(px, py, rx, ry):
    """Independent PIP oracle: count proper crossings of ray (px,py)->(+inf,py)."""
    n = len(rx)
    cnt = 0
    for i in range(n):
        j = (i + 1) % n
        y1, y2 = ry[i], ry[j]
        x1, x2 = rx[i], rx[j]
        if (y1 > py) != (y2 > py):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            if px < xint:
                cnt += 1
    return cnt


def test_pip_matches_bruteforce_random_polygons():
    r = np.random.default_rng(12)
    for trial in range(20):
        nv = int(r.integers(3, 12))
        ang = np.sort(r.uniform(0, 2 * np.pi, nv))
        rad = r.uniform(0.5, 1.5, nv)
        rx = rad * np.cos(ang)
        ry = rad * np.sin(ang)
        px = r.uniform(-2, 2, 200)
        py = r.uniform(-2, 2, 200)
        got = pip.points_in_ring(px, py, rx, ry)
        want = np.asarray(
            [_segments_crossing_count(px[i], py[i], rx, ry) % 2 == 1 for i in range(200)]
        )
        np.testing.assert_array_equal(got, want)


def test_pip_with_holes():
    outer_x = np.asarray([0.0, 10.0, 10.0, 0.0])
    outer_y = np.asarray([0.0, 0.0, 10.0, 10.0])
    inner_x = np.asarray([4.0, 6.0, 6.0, 4.0])
    inner_y = np.asarray([4.0, 4.0, 6.0, 6.0])
    px = np.asarray([5.0, 2.0, 11.0])
    py = np.asarray([5.0, 2.0, 5.0])
    res = pip.points_in_polygon(px, py, outer_x, outer_y, [(inner_x, inner_y)])
    np.testing.assert_array_equal(res, [False, True, False])


def test_ring_area_orientation():
    x = np.asarray([0.0, 1.0, 1.0, 0.0])
    y = np.asarray([0.0, 0.0, 1.0, 1.0])
    assert pip.ring_area2(x, y) > 0  # CCW
    assert pip.ring_area2(x[::-1], y[::-1]) < 0


def test_ring_contains_ring():
    ox = np.asarray([0.0, 10.0, 10.0, 0.0])
    oy = np.asarray([0.0, 0.0, 10.0, 10.0])
    ix = np.asarray([1.0, 2.0, 2.0, 1.0])
    iy = np.asarray([1.0, 1.0, 2.0, 2.0])
    assert pip.ring_contains_ring(ox, oy, ix, iy)
    assert not pip.ring_contains_ring(ix, iy, ox, oy)


def test_dp_simplify_straight_line_collapses():
    x = np.arange(100, dtype=float)
    y = np.zeros(100)
    sx, sy = simplify.simplify(x, y, 0.5)
    assert len(sx) == 2


def test_dp_simplify_keeps_big_deviations():
    x = np.asarray([0.0, 5.0, 10.0])
    y = np.asarray([0.0, 3.0, 0.0])
    sx, sy = simplify.simplify(x, y, 1.0)
    assert len(sx) == 3
    sx, sy = simplify.simplify(x, y, 5.0)
    assert len(sx) == 2


def test_dp_invariants_random():
    r = np.random.default_rng(13)
    x = np.cumsum(r.uniform(0.1, 1, 200))
    y = r.uniform(-5, 5, 200)
    for eps in (0.1, 1.0, 10.0):
        m = simplify.dp_mask(x, y, eps)
        assert m[0] and m[-1]
        # monotone: larger eps keeps a subset
    m1 = simplify.dp_mask(x, y, 0.5)
    m2 = simplify.dp_mask(x, y, 2.0)
    assert m2.sum() <= m1.sum()


def test_geomblob_roundtrip():
    rings = [
        (np.asarray([1, 2, 3], dtype=np.int32), np.asarray([-1, -2, -3], dtype=np.int32)),
        (np.asarray([10, 20], dtype=np.int32), np.asarray([30, 40], dtype=np.int32)),
    ]
    tags = [("name", "Ümlautstraße"), ("natural", "water")]
    blob = geomblob.encode_geom(geomblob.GTYPE_POLYGON, -42, rings, tags)
    gtype, gid, rings2, tags2 = geomblob.decode_geom(blob)
    assert gtype == geomblob.GTYPE_POLYGON and gid == -42
    assert tags2 == tags
    for (a1, b1), (a2, b2) in zip(rings, rings2):
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)
    # deterministic bytes
    assert blob == geomblob.encode_geom(geomblob.GTYPE_POLYGON, -42, rings, tags)


def test_envelope():
    rings = [(np.asarray([5, -3]), np.asarray([7, 100]))]
    assert geomblob.envelope_of_rings(rings) == (-3, 7, 5, 100)
