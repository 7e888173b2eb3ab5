"""M6 + training-data ops: payload verification, features, dedup family,
similarity search, text analysis, streaming facade."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from coords_spark.operators import dedup, images, similarity, text


@pytest.fixture(scope="module")
def imgs(spark, fixture_dir):
    return spark.read.parquet(os.path.join(fixture_dir, "images.parquet")).limit(300).cache()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()


# --- images -----------------------------------------------------------------


def test_payload_verification_all_ok(spark, imgs):
    v = images.with_payload_verification(imgs)
    rows = v.select("payload_ok", "psnr", "fmt").collect()
    assert all(r["payload_ok"] for r in rows)
    assert all(r["psnr"] >= 40.0 for r in rows)


def test_payload_verification_detects_corruption(spark, imgs):
    corrupted = imgs.withColumn(
        "bytes",
        F.when(F.col("fmt") == "raw", F.concat(F.expr("substring(bytes, 1, 8)"), F.expr("substring(bytes, 9, length(bytes))"))).otherwise(F.col("bytes")),
    )
    # flip payload by replacing first 8 bytes with zeros for raw rows
    corrupted = imgs.withColumn(
        "bytes",
        F.when(
            F.col("fmt") == "raw",
            F.concat(F.lit(bytearray(8)), F.expr("substring(bytes, 9, length(bytes) - 8)")),
        ).otherwise(F.col("bytes")),
    )
    v = images.with_payload_verification(corrupted)
    bad = v.filter((F.col("fmt") == "raw") & ~F.col("payload_ok")).count()
    assert bad > 0


def test_malformed_payload_flags_row_not_job(spark, imgs):
    """A truncated buffer / empty payload / garbage stream must mark the ROW
    payload_ok=False — never raise out of the UDF and kill the job."""
    mangled = imgs.limit(12).withColumn(
        "_r", F.monotonically_increasing_id() % 3
    ).withColumn(
        "bytes",
        F.when(F.col("_r") == 0, F.expr("substring(bytes, 1, 5)"))  # truncated
        .when(F.col("_r") == 1, F.lit(b""))  # empty
        .otherwise(F.lit(b"\x00\xff garbage not a codec stream")),
    ).drop("_r")
    v = images.with_payload_verification(mangled)
    rows = v.select("payload_ok").collect()  # must not raise
    assert all(not r["payload_ok"] for r in rows)

    c = images.with_decode_check(mangled)
    crows = c.select("decode_ok").collect()
    assert all(not r["decode_ok"] for r in crows)


def test_pixel_features_shape(spark, imgs):
    f = images.with_pixel_features(imgs.limit(20), grid=4)
    rows = f.select("features").collect()
    assert all(len(r["features"]) == 48 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r["features"])


def test_resize_op(spark, imgs):
    r = imgs.limit(10).select(
        images.resized_bytes_col(F.col("bytes"), F.col("fmt"), F.col("w"), F.col("h"), 8, 8).alias("rb")
    )
    assert all(len(bytes(x["rb"])) == 8 * 8 * 3 for x in r.collect())


def test_stub_format_raises(spark, imgs):
    stub = imgs.limit(2).withColumn("fmt", F.lit("jpeg"))
    v = images.with_payload_verification(stub)
    rows = v.select("payload_ok").collect()
    assert all(not r["payload_ok"] for r in rows)  # stub -> not verifiable, flagged


# --- dedup ------------------------------------------------------------------


def test_exact_dedup_with_planted_duplicates(spark, docs):
    base = docs.select("doc_id", "text")
    dup = base.limit(10).withColumn("doc_id", F.col("doc_id") + 100000)
    d = dedup.exact_dedup(base.unionAll(dup))
    assert d.count() == base.count()  # 10 dupes collapsed
    assert d.filter(F.col("dup_count") == 2).count() == 10
    # survivor is the smaller key
    assert d.filter((F.col("dup_count") == 2) & (F.col("doc_id") >= 100000)).count() == 0


def test_minhash_lsh_finds_planted_near_dups(spark, docs):
    base = docs.select("doc_id", "text")
    # plant near-duplicates: copy with one appended word
    near = base.limit(8).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
    )
    alld = base.unionAll(near)
    cand = dedup.minhash_lsh_candidates(alld, n_bands=8, rows_per_band=2)
    verified = dedup.jaccard_verify(alld, cand, threshold=0.8)
    pairs = {(r["doc_a"], r["doc_b"]) for r in verified.collect()}
    planted = {(i, i + 200000) for i in range(8)}
    assert planted <= pairs, f"missing {planted - pairs}"


def test_lsh_bucket_cap_bounds_pathological_cluster(spark, docs):
    """A planted 10k-duplicate cluster would emit ~50M candidate pairs per
    band without the bucket cap; capped_buckets drops those buckets, the
    candidate count stays bounded by the untouched corpus, and the drop is
    quantified by lsh_bucket_drop_stats."""
    base = docs.select("doc_id", "text")
    cluster = (
        spark.range(10_000)
        .select(
            (F.col("id") + 500_000).alias("doc_id"),
            F.lit("the same viral document text repeated everywhere verbatim").alias(
                "text"
            ),
        )
    )
    alld = base.unionAll(cluster)
    baseline_pairs = dedup.minhash_lsh_candidates(base, n_bands=8, rows_per_band=2).count()
    capped_pairs = dedup.minhash_lsh_candidates(alld, n_bands=8, rows_per_band=2).count()
    # the 10k-cluster contributes ZERO pairs (its buckets exceed the cap);
    # the organic corpus' candidates are unaffected
    assert capped_pairs == baseline_pairs
    # drop stats surface exactly the cluster's buckets (8 bands x 1 bucket)
    sh = dedup.shingles(alld)
    n_hashes = 16
    mins = (
        sh.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {n_hashes - 1}), i -> "
                    f"struct(i as hi, xxhash64(cast(i as string), shingle) as hv))"
                )
            ).alias("s"),
        )
        .groupBy("doc_id", F.col("s.hi").alias("hi"))
        .agg(F.min("s.hv").alias("mh"))
    )
    bands = mins.withColumn("band", (F.col("hi") / 2).cast("int")).groupBy(
        "doc_id", "band"
    ).agg(F.concat_ws(",", F.sort_array(F.collect_list(F.col("mh").cast("string")))).alias("sig"))
    stats = dedup.lsh_bucket_drop_stats(bands, ["band", "sig"], 1024).first()
    assert stats["n_dropped_buckets"] == 8
    assert stats["n_dropped_rows"] == 8 * 10_000
    # simhash path: same cap, same boundedness
    sim_base = dedup.simhash_near_dups(base.limit(200), max_hamming=3).count()
    sim_capped = dedup.simhash_near_dups(
        base.limit(200).unionAll(cluster), max_hamming=3
    ).count()
    assert sim_capped == sim_base


def test_simhash_near_dups(spark, docs):
    base = docs.select("doc_id", "text")
    clones = base.limit(5).select((F.col("doc_id") + 300000).alias("doc_id"), "text")
    alld = base.unionAll(clones)
    got = dedup.simhash_near_dups(alld, max_hamming=3)
    pairs = {(r["doc_a"], r["doc_b"]) for r in got.collect()}
    planted = {(i, i + 300000) for i in range(5)}  # identical text -> hamming 0
    assert planted <= pairs
    assert all(r["hamming"] == 0 for r in got.collect() if (r["doc_a"], r["doc_b"]) in planted)
    # determinism across runs (stable token hash)
    got2 = {(r["doc_a"], r["doc_b"]) for r in dedup.simhash_near_dups(alld, max_hamming=3).collect()}
    assert pairs == got2
    # near-variants (one appended token) land at SMALL hamming on average
    near = base.limit(20).select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    sh = {
        r["doc_id"]: r["sh"]
        for r in base.limit(20)
        .unionAll(near)
        .select("doc_id", dedup.simhash64_col(F.col("text")).alias("sh"))
        .collect()
    }
    hams = [bin((sh[i] ^ sh[i + 400000]) & ((1 << 64) - 1)).count("1") for i in range(20)]
    assert sum(hams) / len(hams) <= 10


def _simhash_blocks(max_h):
    """The variable-width split used by simhash_near_dups: 64 bits into
    exactly max_h+1 non-empty blocks (mirrors the SQL expression)."""
    n_blocks = max_h + 1
    base, rem = divmod(64, n_blocks)
    widths = [base + 1 if b < rem else base for b in range(n_blocks)]
    starts = [sum(widths[:b]) for b in range(n_blocks)]
    return [(s, (1 << w) - 1) for s, w in zip(starts, widths)]


def test_simhash_block_lsh_complete_for_radius():
    """Pigeonhole completeness of the variable-width block split: any pair
    within max_hamming bits must share at least one block. Shifts emulate
    the JVM (mod 64) so a degenerate past-bit-63 block can't fake a match
    the engine wouldn't see."""
    import random

    rnd = random.Random(42)
    for max_h in (3, 5, 8, 15):
        blocks = _simhash_blocks(max_h)
        assert len(blocks) == max_h + 1
        assert sum(m.bit_length() for _, m in blocks) == 64  # full partition
        for _ in range(200):
            a = rnd.getrandbits(64)
            flips = rnd.sample(range(64), rnd.randint(0, max_h))
            b = a
            for f in flips:
                b ^= 1 << f
            shared = any(
                ((a >> (s % 64)) & m) == ((b >> (s % 64)) & m) for s, m in blocks
            )
            assert shared, (max_h, flips)


def test_simhash_old_uniform_split_was_incomplete():
    """Regression pin: the previous uniform ceil-width split left block 8
    past bit 63 for max_hamming=8 (JVM shift wraps to a duplicate of block
    0), so only 8 real blocks covered 8 allowed differences — one flip per
    block evades every bucket. The adversarial pair below proves it."""
    max_h = 8
    width = (64 + max_h) // (max_h + 1)  # old: ceil(64/9) = 8
    a = 0
    b = sum(1 << (i * 8) for i in range(8))  # one flipped bit in each 8-bit block
    old_shared = any(
        ((a >> ((i * width) % 64)) & ((1 << width) - 1))
        == ((b >> ((i * width) % 64)) & ((1 << width) - 1))
        for i in range(max_h + 1)
    )
    assert not old_shared  # old scheme would MISS this hamming-8 pair
    new_shared = any(
        ((a >> s) & m) == ((b >> s) & m) for s, m in _simhash_blocks(max_h)
    )
    assert new_shared  # variable-width split catches it


def test_ngram_candidates_bounded_under_dominant_bucket(spark):
    """One ultra-frequent shingle shared by every doc in a dominant
    (lang, source) bucket must NOT generate O(n^2) candidates: the DF cap
    drops it from candidate generation, leaving only pairs that share a
    discriminative shingle."""
    from coords_spark.operators import dedup

    n = 80
    rows = []
    for i in range(n):
        # every doc opens with the same 3-gram; tails are unique
        rows.append((i, "en", "web", f"alpha beta gamma tail{i}a tail{i}b tail{i}c tail{i}d"))
    # planted near-dup pair sharing a long rare phrase
    rows.append((900, "en", "web", "alpha beta gamma rare one two three four five six"))
    rows.append((901, "en", "web", "alpha beta gamma rare one two three four five seven"))
    d = spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")
    sh = dedup.bucketed_shingles(d, n=3)
    cand = dedup.ngram_candidates(sh, df_cap=32).collect()
    # without the cap this would be C(82,2) = 3321 candidates
    assert len(cand) == 1
    assert (cand[0]["doc_a"], cand[0]["doc_b"]) == (900, 901)


def test_embedding_near_dups(spark, emb):
    base = emb.select("vec_id", "embedding")
    clones = base.limit(6).select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    got = dedup.embedding_near_dups(base.unionAll(clones), threshold=0.999)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert {(i, i + 10000) for i in range(6)} <= pairs


# --- similarity ---------------------------------------------------------------


def _brute_topk_py(rows, qv, k):
    qv = np.asarray(qv, dtype=np.float64)
    scored = []
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        c = float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
        scored.append((-c, r["vec_id"]))
    scored.sort()
    return [vid for _, vid in scored[:k]]


def test_brute_force_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    qv = list(rows[0]["embedding"])
    got = [r["vec_id"] for r in similarity.brute_force_topk(emb, qv, 10).collect()]
    want = _brute_topk_py(rows, qv, 10)
    assert got == want
    assert got[0] == rows[0]["vec_id"]  # self-similarity = 1


def test_ann_recall_on_planted_neighbors(spark, emb):
    """LSH-bucketed ANN must retrieve planted near-copies of the query
    (the workload LSH exists for); uniform-random vectors carry no
    neighbor structure, so recall is asserted on the planted cluster."""
    rows = emb.collect()
    qv = np.asarray(rows[3]["embedding"], dtype=np.float64)
    planted = []
    for i in range(10):
        noise = (np.asarray([((i * 64 + j) * 2654435761 % 1000) for j in range(64)]) / 1000.0 - 0.5) * 0.02
        planted.append((20000 + i, (qv + noise).astype("float32").tolist()))
    extra = spark.createDataFrame(
        [(vid, v, 0) for vid, v in planted], "vec_id long, embedding array<float>, label int"
    )
    alld = emb.unionByName(extra)
    ann = {
        r["vec_id"]
        for r in similarity.ann_topk(alld, qv.tolist(), 11, n_planes=8, probe_hamming=2).collect()
    }
    found = len(ann & {vid for vid, _ in planted})
    assert found >= 8, f"only {found}/10 planted neighbors retrieved"
    assert rows[3]["vec_id"] in ann  # the query vector itself


def test_knn_topk_join_multi_query(spark, emb):
    rows = emb.limit(3).collect()
    queries = spark.createDataFrame(
        [(str(r["vec_id"]), list(r["embedding"])) for r in rows], "qid string, qe array<float>"
    )
    got = similarity.knn_topk_join(emb, queries, k=5)
    assert got.count() == 15
    top1 = {r["qid"]: r["vec_id"] for r in got.filter(F.col("rank") == 1).collect()}
    for r in rows:
        assert top1[str(r["vec_id"])] == r["vec_id"]


# --- text ---------------------------------------------------------------------


def test_lang_scores_and_quality(spark, docs):
    d = text.with_lang_scores(docs)
    assert d.filter(F.col("lang_pred").isin("en", "de", "fr", "es")).count() == docs.count()
    q = text.with_quality(docs)
    row = q.first()
    assert 0 <= row["stopword_ratio"] <= 1 and 0 <= row["alpha_ratio"] <= 1
    t = text.with_token_counts(docs)
    r2 = t.first()
    assert r2["bpe_tokens_est"] >= r2["alnum_tokens"] * 0  # defined
    assert t.filter(F.col("ws_tokens") <= 0).count() == 0


def test_rolling_fingerprint_deterministic_and_robust(spark, docs):
    d = docs.limit(20).select("doc_id", text.rolling_fingerprint_col(F.col("text")).alias("fp"))
    a = {r["doc_id"]: r["fp"] for r in d.collect()}
    b = {r["doc_id"]: r["fp"] for r in d.collect()}
    assert a == b
    # appending a suffix usually keeps the min-window fingerprint
    d2 = docs.limit(20).select(
        "doc_id",
        text.rolling_fingerprint_col(F.concat(F.col("text"), F.lit(" tail"))).alias("fp"),
    )
    c = {r["doc_id"]: r["fp"] for r in d2.collect()}
    same = sum(1 for k in a if a[k] == c[k])
    assert same >= 15


# --- streaming ------------------------------------------------------------------


def test_streaming_windows_match_batch(spark, tmp_path):
    from coords_spark.streaming import (
        stream_events_from_dir,
        tumbling_window_counts,
        watermark_dedup,
    )

    batch = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    # batch-mode semantics of the same transform
    expected = tumbling_window_counts(batch).collect()
    assert len(expected) > 10

    # stream the same data through a file source into a memory sink
    src = str(tmp_path / "stream_src")
    batch.withColumn("ts", F.col("ts").cast("timestamp")).coalesce(2).write.parquet(src)
    stream = stream_events_from_dir(spark, src, max_files=1)
    assert stream.isStreaming
    q = (
        tumbling_window_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .start()
    )
    q2 = (
        watermark_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_events")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        q2.processAllAvailable()
        got = spark.sql("select * from win_counts").collect()
        n_dedup = spark.sql("select count(*) from dedup_events").collect()[0][0]
    finally:
        q.stop()
        q2.stop()
    assert n_dedup == batch.count()  # event_ids unique -> dedup is identity
    norm = lambda rows: sorted((r["win_start"], r["event_type"], r["n"], r["total"]) for r in rows)
    assert norm(got) == norm(expected)


def test_session_windows(spark):
    from coords_spark.streaming import session_window_stats

    batch = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    s = session_window_stats(batch)
    rows = s.limit(5).collect()
    assert all(r["sess_end"] >= r["sess_start"] for r in rows)
    assert s.count() > 0


def test_stateful_running_user_stats_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    the FINAL update-mode row per user must equal the batch aggregate over
    all drops (state survived the trigger boundary)."""
    from coords_spark.streaming import running_user_stats, stream_events_from_dir

    batch = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .filter(F.col("user_id") < 50)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    src = str(tmp_path / "stateful_src")
    # two file drops -> at least two micro-batches with maxFilesPerTrigger=1.
    # repartition (NOT coalesce: from a single input split coalesce(2) keeps
    # 1 partition -> 1 file -> 1 batch, and state.exists is never exercised)
    # round-robins rows so users span BOTH batches and state is re-read.
    batch.repartition(2).write.parquet(src)
    expected = {
        r["user_id"]: (r["n_events"], round(r["total"], 6), r["last_event_us"])
        for r in running_user_stats(batch).collect()
    }
    assert len(expected) > 10

    stream = stream_events_from_dir(spark, src, max_files=1)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_state")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "select * from (select *, row_number() over "
            "(partition by user_id order by n_events desc) rn from user_state) where rn = 1"
        ).collect()
    finally:
        q.stop()
    got = {
        r["user_id"]: (r["n_events"], round(r["total"], 6), r["last_event_us"])
        for r in rows
    }
    assert got == expected


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join: pairs spanning micro-batch boundaries
    must all be found (both sides buffer state); the streaming result set
    equals the batch join exactly."""
    from coords_spark.streaming import click_purchase_interval_join, stream_events_from_dir

    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .filter(F.col("user_id") < 100)
        .select("event_id", "ts", "user_id", "event_type")
    )
    batch = click_purchase_interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        lookback="7 days",
    )
    expected = {(r["purchase_id"], r["click_id"]) for r in batch.collect()}
    assert len(expected) > 20

    src = str(tmp_path / "ssjoin_src")
    ev.repartition(2).write.parquet(src)  # users span both micro-batches
    clicks = stream_events_from_dir(spark, src).filter(F.col("event_type") == "click")
    purchases = stream_events_from_dir(spark, src).filter(F.col("event_type") == "purchase")
    q = (
        click_purchase_interval_join(clicks, purchases, lookback="7 days")
        .writeStream.format("memory")
        .queryName("ssjoin_mem")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["purchase_id"], r["click_id"])
            for r in spark.table("ssjoin_mem").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_ann_topk_join_bucketed_recall(spark, emb):
    """Query-set ANN bucket join: every query must retrieve itself at rank 1
    (cosine 1), and results must agree with the single-query ann_topk path
    for the same parameters."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("string").alias("qid"), F.col("embedding").alias("qe")
    )
    got = similarity.ann_topk_join(emb, queries, k=5, n_planes=8, probe_hamming=2)
    rows = got.collect()
    assert len(rows) == 15
    top1 = {r["qid"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert top1 == {"0": 0, "1": 1, "2": 2}
    # parity with the single-query path
    for qid in ("0", "1", "2"):
        qv = [float(x) for x in emb.filter(F.col("vec_id") == int(qid)).first()["embedding"]]
        single = [
            r["vec_id"]
            for r in similarity.ann_topk(emb, qv, 5, n_planes=8, probe_hamming=2).collect()
        ]
        joined = [r["vec_id"] for r in sorted(
            (r for r in rows if r["qid"] == qid), key=lambda r: r["rank"])]
        assert joined == single, qid


def test_ivf_topk_join_self_retrieval(spark, emb):
    """IVF query-set ANN: each in-corpus query retrieves itself at rank 1
    (cosine 1), ranks are contiguous per query, and the quantizer is
    deterministic across invocations."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("string").alias("qid"), F.col("embedding").alias("qe")
    )
    got = similarity.ivf_topk_join(emb, queries, k=5, n_centroids=16, nprobe=3)
    rows = got.collect()
    assert len(rows) == 15
    top1 = {r["qid"]: (r["vec_id"], round(r["cosine"], 6)) for r in rows if r["rank"] == 1}
    assert top1 == {"0": (0, 1.0), "1": (1, 1.0), "2": (2, 1.0)}
    for qid in ("0", "1", "2"):
        assert sorted(r["rank"] for r in rows if r["qid"] == qid) == [1, 2, 3, 4, 5]
    rows2 = similarity.ivf_topk_join(emb, queries, k=5, n_centroids=16, nprobe=3).collect()
    assert {(r["qid"], r["vec_id"], r["rank"]) for r in rows} == {
        (r["qid"], r["vec_id"], r["rank"]) for r in rows2
    }


def test_caption_equality_verification(spark, imgs):
    """input_hint invariant: captions verified equal. Pristine rows pass;
    a mutated caption is flagged."""
    v = images.with_payload_verification(imgs)
    assert v.filter(~F.col("caption_ok")).count() == 0
    tampered = imgs.withColumn(
        "caption",
        F.when(F.col("image_id") == imgs.first()["image_id"],
               F.lit("not the original caption")).otherwise(F.col("caption")),
    )
    v2 = images.with_payload_verification(tampered)
    assert v2.filter(~F.col("caption_ok")).count() == 1


def test_streaming_chunk_ingest_exactly_once(spark, tmp_path):
    """Image drops stream into an icepick table with one atomic commit per
    micro-batch; a RESTARTED query (same checkpoint) re-ingests nothing,
    and new drops land exactly once."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from coords_spark.fixtures import gen_images
    from coords_spark.operators import ingest, tiling
    from coords_spark.sources.icepick import IcepickTable
    from coords_spark.streaming import stream_images_from_dir, stream_ingest_images

    src = tmp_path / "drops"
    src.mkdir()
    pq.write_table(gen_images(300), str(src / "drop-0.parquet"))
    pq.write_table(gen_images(200, offset=300), str(src / "drop-1.parquet"))

    # split set from the first batch's anchor distribution (a production
    # job derives it from history; any fixed set keeps assignment stable)
    pts = ingest.with_anchor_cell(
        spark.createDataFrame(gen_images(300, with_bytes=False)).select("image_id", "phash"),
        tiling.DEFAULT_BASE_LEVEL,
    ).withColumn("nbytes", F.lit(4096).cast("long"))
    split = tiling.compute_split_set(pts, max_bytes=256 * 1024, base_level=tiling.DEFAULT_BASE_LEVEL)

    table_path = str(tmp_path / "stream_table")
    ckpt = str(tmp_path / "ckpt")

    q = stream_ingest_images(
        stream_images_from_dir(spark, str(src), max_files=1),
        table_path, split, tiling.DEFAULT_BASE_LEVEL, ckpt,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    t = IcepickTable(table_path)
    assert t.total_rows() == 500
    assert t.verify_checksums()
    groups1 = t.committed_groups()
    assert len(groups1) >= 2  # one commit per micro-batch

    # restart with the same checkpoint: nothing re-ingested; new drop lands once
    pq.write_table(gen_images(150, offset=500), str(src / "drop-2.parquet"))
    q2 = stream_ingest_images(
        stream_images_from_dir(spark, str(src), max_files=1),
        table_path, split, tiling.DEFAULT_BASE_LEVEL, ckpt,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    t2 = IcepickTable(table_path)
    assert t2.total_rows() == 650
    ids = spark.read.parquet(*t2.data_paths()).select("image_id")
    assert ids.count() == ids.distinct().count() == 650

    # chunk assignments in the table match the batch path exactly
    batch = ingest.with_anchor_cell(
        spark.createDataFrame(gen_images(650, with_bytes=False)).select("image_id", "phash"),
        tiling.DEFAULT_BASE_LEVEL,
    )
    expect = {
        (r["image_id"], r["chunk_id"])
        for r in tiling.with_chunk(batch, split, base_level=tiling.DEFAULT_BASE_LEVEL)
        .select("image_id", "chunk_id").collect()
    }
    got = {
        (r["image_id"], r["chunk_id"])
        for r in spark.read.parquet(*t2.data_paths()).select("image_id", "chunk_id").collect()
    }
    assert got == expect


def test_decode_error_counts_reach_driver(spark, imgs):
    """The decode-error tally must aggregate to the DRIVER through the
    Spark accumulator (ADVICE r3: a module dict only lives in worker
    processes) — truncate some payloads and read the counts driver-side."""
    before = dict(images.decode_error_counts())
    mangled = imgs.limit(10).withColumn("bytes", F.expr("substring(bytes, 1, 3)"))
    out = images.with_decode_check(mangled)
    n_bad = out.filter(~F.col("decode_ok")).count()
    assert n_bad == 10
    after = images.decode_error_counts()
    gained = sum(after.values()) - sum(before.values())
    assert gained >= 10, (before, after)
    assert any(isinstance(k, tuple) and len(k) == 2 for k in after)


def test_dup_clusters_connected_components(spark):
    """Chain a-b-c plus pair d-e: two components labeled by their min id;
    convergence within diameter iterations; singletons absent."""
    from coords_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (3, 4), (4, 5)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_dup_clusters_path_graph_sublinear_rounds(spark):
    """VERDICT r4 ask #4: a planted 1000-node path component (diameter
    999) must converge in O(log d) star rounds, not O(d) propagation
    passes — and every node must land on the component min."""
    from coords_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1000)], "doc_a long, doc_b long"
    )
    stats: dict = {}
    got = dedup.dup_clusters(pairs, max_iter=20, _stats=stats).collect()
    assert stats["converged"], stats
    # log2(1000) ~ 10; star alternation + every-2 convergence checks should
    # land well under 14 rounds — and FAR under the 1000 propagation needs
    assert stats["iterations"] <= 14, stats
    assert {r["doc_id"] for r in got} == set(range(1001))
    assert {r["cluster_id"] for r in got} == {0}


def test_dup_clusters_nonconvergence_signalled(spark):
    """max_iter too small must warn (default) or raise — never silently
    return under-merged clusters (ADVICE r4)."""
    import pytest as _pytest

    from coords_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_a long, doc_b long"
    )
    with _pytest.raises(ValueError, match="did not stabilize"):
        dedup.dup_clusters(pairs, max_iter=1, on_nonconverged="raise").collect()


def test_keep_canonical_applies_cluster_decision(spark):
    from coords_spark.operators import dedup

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(1, 8)], "doc_id long, text string")
    pairs = spark.createDataFrame([(2, 1), (2, 3), (5, 6)], "doc_a long, doc_b long")
    kept = sorted(r["doc_id"] for r in dedup.keep_canonical(docs, pairs).collect())
    # clusters {1,2,3}->1 and {5,6}->5; 4 and 7 are singletons
    assert kept == [1, 4, 5, 7]
