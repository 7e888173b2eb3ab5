"""Property-based kernel tests (hypothesis; SURVEY.md §5.3.1 "property-based,
fixed seeds"). No Spark."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from coords_spark.kernels import codec, simplify, zcurve

coord = st.integers(min_value=0, max_value=zcurve.GRID - 1)
level = st.integers(min_value=0, max_value=zcurve.MAX_LEVEL)


@settings(max_examples=200, deadline=None)
@given(coord, coord)
def test_z_roundtrip(x, y):
    z = zcurve.zencode(np.asarray([x]), np.asarray([y]))
    rx, ry = zcurve.zdecode(z)
    assert (int(rx[0]), int(ry[0])) == (x, y)


@settings(max_examples=200, deadline=None)
@given(coord, coord, level, level)
def test_ancestor_transitive(x, y, l1, l2):
    la, lb = sorted([l1, l2])
    deep = zcurve.cell_from_point(np.asarray([x]), np.asarray([y]), zcurve.MAX_LEVEL)
    via = zcurve.z_ancestor(zcurve.z_ancestor(deep, lb), la)
    direct = zcurve.z_ancestor(deep, la)
    assert int(via[0]) == int(direct[0])


@settings(max_examples=200, deadline=None)
@given(coord, coord, coord, coord)
def test_deepest_cell_contains_both_corners(x0, y0, x1, y1):
    gx0, gx1 = sorted([x0, x1])
    gy0, gy1 = sorted([y0, y1])
    c = zcurve.deepest_common_cell(gx0, gy0, gx1, gy1)
    bx0, by0, bx1, by1 = zcurve.cell_bounds_units(c)
    assert bx0 <= gx0 and gx1 < bx1
    assert by0 <= gy0 and gy1 < by1
    # maximality: no child of c contains both corners (unless at max level)
    if int(zcurve.cell_level(c)) < zcurve.MAX_LEVEL:
        for kid in zcurve.cell_children(c).ravel():
            kx0, ky0, kx1, ky1 = zcurve.cell_bounds_units(kid)
            inside = kx0 <= gx0 and gx1 < kx1 and ky0 <= gy0 and gy1 < ky1
            assert not inside


@settings(max_examples=100, deadline=None)
@given(coord, coord, level)
def test_zrange_matches_ancestor_membership(x, y, lv):
    cell = zcurve.cell_from_point(np.asarray([x]), np.asarray([y]), lv)
    zmin, zmax = zcurve.cell_zrange_at_max(cell)
    z = int(zcurve.zencode(np.asarray([x]), np.asarray([y]))[0])
    assert int(zmin[0]) <= z <= int(zmax[0])


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_codec_roundtrips(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(codec.decode_raw(codec.encode_raw(img), w, h), img)
    assert np.array_equal(codec.decode_pngz(codec.encode_pngz(img)), img)
    dec = codec.decode_q6(codec.encode_q6(img), w, h)
    assert codec.psnr(img, dec) >= 40.0


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=3, max_value=120), st.integers(min_value=0, max_value=2**32 - 1))
def test_dp_monotone_and_endpoints(n, seed):
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.uniform(0.1, 1.0, n))
    y = rng.uniform(-10, 10, n)
    m_small = simplify.dp_mask(x, y, 0.1)
    m_big = simplify.dp_mask(x, y, 5.0)
    assert m_small[0] and m_small[-1] and m_big[0] and m_big[-1]
    assert m_big.sum() <= m_small.sum()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varint_roundtrip_property(vals):
    from coords_spark.kernels import varint as V

    v = np.asarray(vals, dtype=np.uint64)
    assert V.decode_uvarints(V.encode_uvarints(v)).tolist() == v.tolist()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200))
def test_zigzag_roundtrip_property(vals):
    from coords_spark.kernels import varint as V

    v = np.asarray(vals, dtype=np.int64)
    assert V.unzigzag(V.zigzag(v)).tolist() == v.tolist()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=20),
        max_size=20,
    )
)
def test_segmented_delta_roundtrip_property(segments):
    from coords_spark.kernels import varint as V

    lens = np.asarray([len(s) for s in segments], dtype=np.int64)
    flat = np.asarray([x for s in segments for x in s], dtype=np.int64)
    starts = np.zeros(len(segments), dtype=np.int64)
    if len(segments):
        np.cumsum(lens[:-1], out=starts[1:])
    deltas = V.delta_encode(flat)
    if flat.size:
        nz = lens > 0
        deltas[starts[nz]] = flat[starts[nz]]
    out = V.segmented_delta_decode(deltas, starts, lens)
    assert out.tolist() == flat.tolist()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=200),  # field number
            st.one_of(
                st.integers(min_value=0, max_value=2**64 - 1),  # varint
                st.binary(max_size=40),  # length-delimited
            ),
        ),
        max_size=20,
    )
)
def test_proto_wire_walk_roundtrip_property(fields):
    """Arbitrary field sequences encode -> walk back in order with values
    and spans intact (kernels/proto.py, the .osm.pbf wire layer)."""
    from coords_spark.kernels import proto as P

    buf = b"".join(
        P.enc_field_varint(f, v) if isinstance(v, int) else P.enc_field_len(f, v)
        for f, v in fields
    )
    walked = list(P.walk_fields(buf, 0, len(buf)))
    assert len(walked) == len(fields)
    for (f, v), (fno, wt, val) in zip(fields, walked):
        assert fno == f
        if isinstance(v, int):
            assert wt == P.WT_VARINT and val == v
        else:
            s, e = val
            assert wt == P.WT_LEN and buf[s:e] == v


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**50), max_size=8),
        min_size=1,
        max_size=30,
    )
)
def test_proto_bulk_packed_span_property(segments):
    """concat_spans + count_varints_per_span reconstruct per-message packed
    payloads exactly, including empty fields (span (0,0))."""
    from coords_spark.kernels import proto as P
    from coords_spark.kernels import varint as V

    payloads = [
        P.enc_packed_uvarints(5, np.asarray(seg, dtype=np.uint64)) for seg in segments
    ]
    buf = b"".join(payloads)
    spans, pos = [], 0
    for p in payloads:
        if not p:
            spans.append((0, 0))
            continue
        fd = P.fields_dict(buf, pos, pos + len(p))
        spans.append(fd[5][0])
        pos += len(p)
    starts = np.asarray([a for a, _ in spans], dtype=np.int64)
    ends = np.asarray([b for _, b in spans], dtype=np.int64)
    tc = np.cumsum(np.frombuffer(buf, dtype=np.uint8) < 0x80) if buf else np.zeros(0, dtype=np.int64)
    counts = P.count_varints_per_span(tc, starts, ends) if buf else np.zeros(len(spans))
    assert (counts == np.asarray([len(s) for s in segments])).all()
    if buf:
        vals = V.decode_uvarints(P.concat_spans(buf, starts, ends))
        flat = [v for seg in segments for v in seg]
        assert vals.tolist() == flat
