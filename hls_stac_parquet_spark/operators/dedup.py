"""Deduplication operators for large-scale document corpora.

Four families, all shuffle-conscious:

- exact: hash-groupBy on a 32-char fingerprint (never on full text —
  the shuffle carries the digest, not the document)
- MinHash + LSH: shingle → per-seed min-hash signature → banded
  bucket join → candidate pairs (the Broder construction); at 100 TB
  only the (band, bucket) keys shuffle, candidates are verified
  against signatures without re-reading text
- SimHash: 64-bit sign-sum sketch; near-dup = small Hamming distance,
  candidates via band-equality buckets
- n-gram Jaccard: exact set overlap via a shingle self-join —
  quadratic in bucket size, used as ground truth at test scale and as
  the verifier stage after LSH at production scale
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hls_stac_parquet_spark.functions.text import doc_fingerprint, shingles


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: one row per distinct normalized content.

    Returns (fp, keep_id, n_copies): keep the min id per group —
    deterministic, unlike dropDuplicates' arbitrary pick.
    """
    return (
        df.select(F.col(id_col), doc_fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document MinHash signature (array<bigint> of length
    ``num_hashes``).

    One explode + one groupBy: the shuffle key is (id, shingle) pairs,
    each hashed JVM-side with seeded xxhash64 — no Python, no UDF.
    """
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(text_col, shingle_k))).alias("shingle"),
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    min_est_jaccard: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """LSH-banded MinHash near-duplicate candidate pairs.

    signature → ``bands`` band-hashes → explode → self-join on
    (band, hash) → distinct pairs → estimate Jaccard as the matching
    fraction of the two signatures (zip_with, JVM-side).

    ``max_bucket`` drops degenerate buckets (e.g. the empty-document
    bucket) whose quadratic blow-up would dominate at scale — the
    standard guard; dropped buckets are all-identical docs anyway,
    which exact dedup already catches.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)

    band_cols = F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[F.element_at("signature", b * rows_per_band + r + 1)
                  for r in range(rows_per_band)],
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(
        id_col, "signature", F.posexplode(band_cols).alias("band", "band_hash")
    )

    bucket_sizes = banded.groupBy("band", "band_hash").count()
    banded = banded.join(
        bucket_sizes.filter(F.col("count") <= max_bucket).drop("count"),
        ["band", "band_hash"],
        "left_semi",
    )

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )

    est = pairs.withColumn(
        "est_jaccard",
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(num_hashes),
    )
    return est.filter(F.col("est_jaccard") >= min_est_jaccard).select(
        "doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 63,
) -> DataFrame:
    """63-bit SimHash sketch per document (sign-sum of token hashes).

    explode tokens → xxhash64 → per-bit ±1 sums in ONE aggregate (63
    conditional-sum columns, all codegen) → recombine to a bigint.
    63 not 64: keeps the key positive in a signed bigint.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = out + F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(0)
    return sums.select(id_col, out.alias("simhash"))


def simhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidates: equal 16-bit SimHash band → bucket join →
    exact Hamming distance filter (popcount via bit_count)."""
    sh = simhash(df, text_col, id_col)
    band_width = 63 // bands + 1
    banded = sh.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", b * band_width).bitwiseAND(
                        F.lit((1 << band_width) - 1)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via shingle self-join.

    |A∩B| from the join, |A|,|B| from per-doc counts, Jaccard by
    inclusion-exclusion. Oracle-expressible (see q_ngram_jaccard).
    Quadratic in per-shingle doc frequency — at scale, run *after*
    LSH candidate generation, not instead of it.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    base = df.select(F.col(id_col), toks.alias("ts")).filter(F.size("ts") >= n)
    grams = base.select(
        id_col,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at("ts", (i + j).cast("int")) for j in range(n)]
                    ),
                )
            )
        ).alias("shingle"),
    )
    counts = grams.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a = grams.alias("a")
    b = grams.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    j = (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return j.filter(F.col("jaccard") >= min_jaccard).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )
