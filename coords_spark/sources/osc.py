"""Real `.osc` (osmChange XML) front door for the continuous-update family
(SURVEY.md §2.1 S1 × §2.9; REF? COORDS' update path consumes OSM
replication diffs [M] — mount empty, format from the public spec
https://wiki.openstreetmap.org/wiki/OsmChange). Public OSM replication
publishes minutely diffs as (gzip'd) osmChange XML:

    <osmChange version="0.6">
      <create> <node id=".." version=".." lat=".." lon=".."><tag k v/></node> </create>
      <modify> <way id=".." version=".."><nd ref=".."/><tag k v/></way> </modify>
      <delete> <relation id=".." version=".."><member type ref role/></relation> </delete>
    </osmChange>

Parsed rows land EXACTLY in `update_stream.DIFF_SCHEMA` so a directory of
replication intervals drives `stream_apply_diffs` unchanged: create and
modify both map to action='upsert' (OSC apply semantics — a create of an
existing id and a modify of a missing one both mean "this is the entity's
new state"), delete keeps id+version only. Coordinates parse by INTEGER
string math to the same 1e-7 fixed-point grid as the pbf reader
(granularity 100 nanodegrees -> lat_i7), never through a float.

100 TB posture: minutely diffs are small (~1-5 MB gzip'd) and numerous —
the right unit of parallelism is ONE FILE PER TASK, which is exactly what
binaryFile gives here (the opposite call from osmpbf.py, where one planet
file must fan out to blob-level tasks); parse work is proportional to the
diff, never to the table.
"""

from __future__ import annotations

import gzip
import io
import xml.etree.ElementTree as ET
from xml.sax.saxutils import quoteattr

from pyspark.sql import DataFrame, SparkSession

_KIND = {"node": 0, "way": 1, "relation": 2}
_KIND_NAME = {v: k for k, v in _KIND.items()}


def _coord_to_i7(s: str) -> int:
    """'51.5074' -> 515074000 by integer string math (exact; no float
    round-trip). Handles sign, missing fraction, and >7 fraction digits
    (truncated toward zero, matching fixed-point storage)."""
    s = s.strip()
    neg = s.startswith("-")
    if neg or s.startswith("+"):
        s = s[1:]
    if "." in s:
        ip, fp = s.split(".", 1)
    else:
        ip, fp = s, ""
    fp = (fp + "0000000")[:7]
    v = int(ip or "0") * 10_000_000 + int(fp or "0")
    return -v if neg else v


def _i7_to_coord(v: int) -> str:
    sign = "-" if v < 0 else ""
    v = abs(v)
    return f"{sign}{v // 10_000_000}.{v % 10_000_000:07d}"


def parse_osc_bytes(data: bytes) -> list[tuple]:
    """One .osc payload (plain or gzip'd XML) -> DIFF_SCHEMA rows
    (kind, action, id, version, lat, lon, refs, members, tags) in document
    order — replication files are already one-final-state-per-entity, and
    apply_diff_batch's per-(kind,id) consolidation covers merged files."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    root = ET.fromstring(data)
    rows: list[tuple] = []
    for block in root:
        action = block.tag
        if action not in ("create", "modify", "delete"):
            continue
        act = "delete" if action == "delete" else "upsert"
        for ent in block:
            kind = _KIND.get(ent.tag)
            if kind is None:
                continue
            eid = int(ent.get("id"))
            ver = int(ent.get("version", "1"))
            if act == "delete":
                rows.append((kind, act, eid, ver, None, None, None, None, None))
                continue
            tags = {t.get("k"): t.get("v") for t in ent if t.tag == "tag"}
            if kind == 0:
                rows.append(
                    (0, act, eid, ver, _coord_to_i7(ent.get("lat")),
                     _coord_to_i7(ent.get("lon")), None, None, tags)
                )
            elif kind == 1:
                refs = [int(nd.get("ref")) for nd in ent if nd.tag == "nd"]
                rows.append((1, act, eid, ver, None, None, refs, None, tags))
            else:
                members = [
                    (_KIND[m.get("type")], int(m.get("ref")), m.get("role", ""))
                    for m in ent
                    if m.tag == "member"
                ]
                rows.append((2, act, eid, ver, None, None, None, members, tags))
    return rows


def write_osc(path: str, rows: list[tuple], compress: bool | None = None) -> None:
    """Spec-valid osmChange writer (the test/bench inverse of
    parse_osc_bytes): DIFF_SCHEMA rows -> .osc / .osc.gz. Consecutive rows
    sharing an action land in one block; 'upsert' writes <modify> (OSC
    apply semantics make create/modify interchangeable on replay)."""
    if compress is None:
        compress = path.endswith(".gz")
    out = io.StringIO()
    out.write('<?xml version="1.0" encoding="UTF-8"?>\n')
    out.write('<osmChange version="0.6" generator="coords_spark">\n')
    prev = None
    for kind, action, eid, ver, lat, lon, refs, members, tags in rows:
        block = "delete" if action == "delete" else "modify"
        if block != prev:
            if prev is not None:
                out.write(f" </{prev}>\n")
            out.write(f" <{block}>\n")
            prev = block
        name = _KIND_NAME[kind]
        attrs = f'id="{int(eid)}" version="{int(ver)}"'
        if action == "delete":
            out.write(f"  <{name} {attrs}/>\n")
            continue
        if kind == 0:
            attrs += f' lat={quoteattr(_i7_to_coord(int(lat)))} lon={quoteattr(_i7_to_coord(int(lon)))}'
        body = []
        if kind == 1:
            body += [f'   <nd ref="{int(r)}"/>' for r in (refs or [])]
        if kind == 2:
            body += [
                f'   <member type={quoteattr(_KIND_NAME[int(m[0])])} ref="{int(m[1])}" role={quoteattr(m[2] or "")}/>'
                for m in (members or [])
            ]
        body += [
            f"   <tag k={quoteattr(k)} v={quoteattr(v)}/>"
            for k, v in (tags or {}).items()
        ]
        if body:
            out.write(f"  <{name} {attrs}>\n" + "\n".join(body) + f"\n  </{name}>\n")
        else:
            out.write(f"  <{name} {attrs}/>\n")
    if prev is not None:
        out.write(f" </{prev}>\n")
    out.write("</osmChange>\n")
    payload = out.getvalue().encode()
    if compress:
        # mtime=0 -> byte-deterministic output for golden checksums
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(payload)
        payload = buf.getvalue()
    with open(path, "wb") as f:
        f.write(payload)


def _parse_partition(iterator):
    """mapInPandas worker: (path, content) batches -> DIFF_SCHEMA batches.
    Parse work is per-file and bounded by diff size; bytes arrive via
    Arrow once and never round-trip back."""
    import pandas as pd

    cols = ["kind", "action", "id", "version", "lat", "lon", "refs", "members", "tags"]
    for pdf in iterator:
        out = []
        for content in pdf["content"]:
            for r in parse_osc_bytes(bytes(content)):
                if r[7] is not None:
                    # struct columns cross Arrow as dicts, not tuples
                    r = r[:7] + (
                        [{"mtype": m[0], "ref": m[1], "role": m[2]} for m in r[7]],
                        r[8],
                    )
                out.append(r)
        yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
            {c: pd.Series([], dtype=object) for c in cols}
        )


def read_osc(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of .osc/.osc.gz diff files -> DIFF_SCHEMA DataFrame.
    binaryFile is the RIGHT source here (one small file = one task),
    unlike planet .osm.pbf where osmpbf.py plans blob-level splits."""
    from coords_spark.streaming.update_stream import DIFF_SCHEMA

    files = (
        spark.read.format("binaryFile")
        # real replication dirs carry non-XML sidecars (state.txt) that
        # would crash ET.fromstring — only pick up diff payloads (ADVICE r6)
        .option("pathGlobFilter", "*.osc*")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(_parse_partition, DIFF_SCHEMA)


def stream_osc_diffs(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """Streaming source over a replication directory: each arriving
    .osc(.gz) file is one diff interval; maxFilesPerTrigger=1 keeps one
    interval per micro-batch so stream_apply_diffs sees OSC ordering
    semantics, exactly like the parquet diff stream."""
    from coords_spark.streaming.update_stream import DIFF_SCHEMA

    files = (
        spark.readStream.format("binaryFile")
        # streaming sources must state their schema; binaryFile's is fixed
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("maxFilesPerTrigger", max_files)
        # skip replication-state sidecars, same as the batch reader
        .option("pathGlobFilter", "*.osc*")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(_parse_partition, DIFF_SCHEMA)
