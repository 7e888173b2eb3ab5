"""Deduplication operators for training-data pipelines (task brief:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup).

Everything scale-shaped: candidate generation is always a shuffle on a
SMALL derived key (hash / band / bucket), never a cross join; verification
is confined to candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from coords_spark.kernels.phash import splitmix64

_WORDS = "filter(split({c}, '\\\\s+'), x -> x != '')"


def exact_dedup(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep the smallest key per normalized-text hash (deterministic
    survivor). Pure built-ins: md5 + min-by groupBy."""
    h = F.md5(F.lower(F.col(text_col)))
    return (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min(key_col).alias(key_col), F.count("*").alias("dup_count"))
        .drop("_h")
    )


def shingles(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    extra_cols: tuple[str, ...] = (),
    alias: str = "shingle",
) -> DataFrame:
    """(doc_id, *extra_cols, <alias>): distinct n-word shingles per doc,
    built with higher-order functions (JVM-side). The tokenization and
    shingle expression here is THE single definition — the DuckDB oracle
    twins replicate it in SQL, so never fork it."""
    words = _WORDS.format(c=text_col)
    parts = ", ".join(f"words[i{'+' + str(j) if j else ''}]" for j in range(n))
    return (
        df.selectExpr("*", f"{words} as words")
        .selectExpr(
            "doc_id",
            *extra_cols,
            f"explode(CASE WHEN size(words) >= {n} THEN transform(sequence(0, size(words) - {n}), "
            f"i -> concat_ws(' ', {parts})) ELSE array() END) as {alias}",
        )
        .distinct()
    )


def minhash_lsh_candidates(
    df: DataFrame, n_bands: int = 8, rows_per_band: int = 2, text_col: str = "text"
) -> DataFrame:
    """Banded MinHash-LSH near-dup candidates: signature = min(xxhash64(
    seed_i || shingle)) per hash i; docs sharing a band (concatenated
    rows_per_band minima) become a candidate pair. One shuffle per stage,
    pairs generated per-bucket (self-join on band value)."""
    sh = shingles(df, text_col)
    n_hashes = n_bands * rows_per_band
    # one row per (doc, hash_i): min over shingles of xxhash64(i, shingle)
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
    bands = mins.withColumn("band", (F.col("hi") / rows_per_band).cast("int")).groupBy(
        "doc_id", "band"
    ).agg(F.concat_ws(",", F.sort_array(F.collect_list(F.col("mh").cast("string")))).alias("sig"))
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def bucketed_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                      bucket_cols: tuple[str, ...] = ("lang", "source")) -> DataFrame:
    """(doc_id, *bucket_cols, sh): shingles() carrying the natural bucket
    keys (delegates — one shingle definition in the codebase)."""
    return shingles(df, text_col, n, extra_cols=bucket_cols, alias="sh")


def ngram_candidates(
    sh: DataFrame, df_cap: int = 32, bucket_cols: tuple[str, ...] = ("lang", "source")
) -> DataFrame:
    """Near-dup candidate pairs from a bucketed shingle table: the self-join
    runs only on DISCRIMINATIVE shingles (document frequency <= df_cap
    within the bucket), so one ultra-frequent shingle can never make the
    join quadratic. A pair is missed only if every shared shingle is
    frequent — the documented recall trade-off of DF capping."""
    keys = [*bucket_cols, "sh"]
    rare_keys = (
        sh.groupBy(*keys).agg(F.count("*").alias("df")).filter(F.col("df") <= df_cap).drop("df")
    )
    rare = sh.join(rare_keys, keys)
    a = rare.select(F.col("doc_id").alias("doc_a"), *keys)
    b = rare.select(
        F.col("doc_id").alias("doc_b"), *[F.col(k).alias(f"_{k}2") for k in keys]
    )
    cond = F.col("doc_a") < F.col("doc_b")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_{k}2"))
    return a.join(b, cond).select("doc_a", "doc_b").distinct()


def jaccard_verify(df: DataFrame, candidates: DataFrame, threshold: float, text_col: str = "text") -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs only (verification stage)."""
    sh = shingles(df, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b2"), F.col("shingle").alias("shingle_b"))
    common = (
        candidates.join(a, "doc_a")
        .join(
            b,
            (F.col("doc_b") == F.col("doc_b2")) & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("ncommon"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.col("ncommon") / (F.col("na") + F.col("nb") - F.col("ncommon")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash64_col(text_col) -> F.Column:
    """SimHash-64 over whitespace tokens: weighted bit-vote of per-token
    splitmix64 hashes — vectorized numpy inside an Arrow UDF (the bit-vote
    matrix math has no built-in equivalent)."""

    import zlib

    @F.pandas_udf(LongType())
    def _sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = [w for w in (t or "").lower().split() if w]
            if not toks:
                out[i] = 0
                continue
            # stable token hash (crc32 seed -> splitmix64); NEVER python
            # hash() — it is salted per process and would break determinism
            hs = splitmix64(
                np.asarray([zlib.crc32(w.encode()) for w in toks], dtype=np.uint64)
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            )
            votes = bits.sum(axis=0) * 2 - len(toks)  # +1 for set bits, -1 for clear
            sim = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sim |= np.uint64(1) << np.uint64(b)
            out[i] = int(np.uint64(sim).view(np.int64))
        return pd.Series(out)

    return _sh(text_col)


def simhash_near_dups(df: DataFrame, max_hamming: int = 3, text_col: str = "text") -> DataFrame:
    """SimHash near-dup candidates via block LSH, verified by exact popcount.

    Completeness by pigeonhole: the 64 bits are partitioned into
    max_hamming+1 blocks, so two fingerprints within `max_hamming` differing
    bits MUST agree on at least one whole block — candidate generation is
    recall-complete for the requested radius (the block count adapts;
    a fixed 4-block split would silently miss pairs for max_hamming > 3)."""
    n_blocks = max_hamming + 1
    if n_blocks > 32:
        raise ValueError("max_hamming > 31 makes blocks narrower than 2 bits")
    # Partition the 64 bits into EXACTLY n_blocks non-empty blocks of
    # near-equal width (64 = n_blocks*base + rem; first `rem` blocks get an
    # extra bit). A uniform ceil-width split would leave high blocks past
    # bit 63 degenerate (JVM shifts wrap mod 64) — those blocks duplicate
    # low-bit slices AND shrink the effective block count below the
    # pigeonhole requirement of max_hamming+1 real blocks.
    base, rem = divmod(64, n_blocks)
    widths = [base + 1 if b < rem else base for b in range(n_blocks)]
    starts = [sum(widths[:b]) for b in range(n_blocks)]
    masks = [(1 << w) - 1 for w in widths]
    starts_sql = ",".join(str(s) for s in starts)
    masks_sql = ",".join(str(m) for m in masks)
    d = df.select("doc_id", simhash64_col(F.col(text_col)).alias("sh"))
    blocks = d.select(
        "doc_id",
        "sh",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_blocks - 1}), b -> struct(b as blk, "
                f"(shiftrightunsigned(sh, element_at(array({starts_sql}), b + 1)) "
                f"& element_at(array({masks_sql}), b + 1)) as bv))"
            )
        ).alias("s"),
    ).select("doc_id", "sh", F.col("s.blk").alias("blk"), F.col("s.bv").alias("bv"))
    a = blocks.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), "blk", "bv")
    b = blocks.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), "blk", "bv")
    return (
        a.join(b, ["blk", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.expr("bit_count(sh_a ^ sh_b)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    n_bands: int = 4,
    planes_per_band: int = 4,
    key: str = "vec_id",
    vec: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup: BANDED random-hyperplane LSH (candidate if
    any band's sign-signature matches — a single wide signature has ~28%
    recall at cosine 0.95; 4 bands of 4 planes give ~96%) + exact cosine
    verification on collision pairs only."""
    from coords_spark.operators.similarity import cosine_expr, lsh_bucket_col

    d = df.select(key, vec)
    for band in range(n_bands):
        d = d.withColumn(
            f"b{band}", lsh_bucket_col(F.col(vec), planes_per_band, seed + 101 * band)
        )
    cands = None
    for band in range(n_bands):
        a = d.select(F.col(key).alias("id_a"), F.col(f"b{band}").alias("bv"))
        b = d.select(F.col(key).alias("id_b"), F.col(f"b{band}").alias("bv"))
        j = a.join(b, "bv").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        cands = j if cands is None else cands.unionAll(j)
    cands = cands.distinct()
    va = df.select(F.col(key).alias("id_a"), F.col(vec).alias("va"))
    vb = df.select(F.col(key).alias("id_b"), F.col(vec).alias("vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.expr(cosine_expr("va", "vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
