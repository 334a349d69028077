"""LLM-training-data pipeline queries (SURVEY.md §2.B phase 4 +
north-star extension): text analysis, dedup, similarity search.

Everything that is deterministic arithmetic/string work carries a full
DuckDB oracle; sketch-based ops (MinHash/SimHash via xxhash64, LSH)
are rows-only for the driver but property-tested in tests/.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hls_stac_parquet_spark.functions.text import (
    EN_STOPWORDS,
    TOKEN_PATTERN,
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    token_hashes,
    tokens,
    winnow_fingerprints,
)
from hls_stac_parquet_spark.operators.dedup import (
    dedup_exact,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_candidate_pairs,
)
from hls_stac_parquet_spark.operators.similarity import (
    cosine_pairs_above,
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_candidates,
)
from hls_stac_parquet_spark.queries.registry import query, t

_STOPS_SQL = "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"
_SW_RATIO_SQL = (
    "len(list_filter(string_split(lower(text), ' '), x -> x IN "
    + _STOPS_SQL
    + ")) * 1.0 / greatest(len(string_split(lower(text), ' ')), 1)"
)
_PUNCT_RATIO_SQL = (
    "(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))"
    " * 1.0 / greatest(length(text), 1)"
)
_FP_SQL = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


# --- text analysis -------------------------------------------------------

@query(
    "q_text_stats",
    oracle=(
        "SELECT doc_id, CAST(length(text) AS INT) AS text_len, "
        "CAST(len(string_split(text, ' ')) AS INT) AS n_tokens, "
        "round(length(text) * 1.0 / greatest(len(string_split(text, ' ')), 1), 6) "
        "AS avg_tok_len FROM documents"
    ),
)
def q_text_stats(spark, sf_dir):
    """Token/length statistics over documents (north star)."""
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(tokens("text"))
    return d.select(
        "doc_id",
        F.length("text").alias("text_len"),
        n_tok.alias("n_tokens"),
        F.round(F.length("text") / F.greatest(n_tok, F.lit(1)), 6).alias(
            "avg_tok_len"
        ),
    )


@query(
    "q_token_count",
    oracle=(
        "SELECT doc_id, CAST(len(regexp_extract_all(text, "
        f"'{TOKEN_PATTERN}')) AS INT) AS n_bpe_tokens FROM documents"
    ),
)
def q_token_count(spark, sf_dir):
    """BPE-ish regex token count (word/number/punct classes) —
    portable regex, runs in codegen on both engines."""
    return t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_bpe_tokens")
    )


@query(
    "q_lang_id",
    oracle=(
        "SELECT doc_id, CASE WHEN " + _SW_RATIO_SQL + " >= 0.08 "
        "THEN 'en' ELSE 'unknown' END AS lang_pred FROM documents"
    ),
)
def q_lang_id(spark, sf_dir):
    """Heuristic language ID via English stopword density."""
    return t(spark, sf_dir, "documents").select(
        "doc_id", language_id("text").alias("lang_pred")
    )


@query(
    "q_quality_score",
    oracle=(
        "SELECT doc_id, round("
        "0.5 * least(length(text) / 500.0, 1.0) "
        "+ 0.4 * least((" + _SW_RATIO_SQL + ") * 4, 1.0) "
        "- 0.3 * least((" + _PUNCT_RATIO_SQL + ") * 5, 1.0)"
        ", 6) AS quality FROM documents"
    ),
)
def q_quality_score(spark, sf_dir):
    """Composite quality score (C4/Gopher-filter shape)."""
    return t(spark, sf_dir, "documents").select(
        "doc_id", quality_score("text").alias("quality")
    )


@query(
    "q_fingerprint",
    oracle=f"SELECT doc_id, {_FP_SQL} AS fp FROM documents",
)
def q_fingerprint(spark, sf_dir):
    """Deterministic md5 content fingerprint (normalized text)."""
    return t(spark, sf_dir, "documents").select(
        "doc_id", doc_fingerprint("text").alias("fp")
    )


@query("q_winnow_fingerprint", oracle=None)  # xxhash64 k-grams — rows-only
def q_winnow_fingerprint(spark, sf_dir):
    """Winnowing (rolling local-minimum) fingerprints per document —
    the MOSS scheme: any shared run of ≥ k+window-1 tokens between two
    documents yields a shared fingerprint. Pure JVM HOFs, no shuffle;
    guarantee property-tested in tests/test_text_functions.py."""
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", token_hashes("text").alias("_th"))
        .select(
            "doc_id",
            winnow_fingerprints("_th").alias("fingerprints"),
        )
        .withColumn("n_fingerprints", F.size("fingerprints"))
    )


# --- dedup ------------------------------------------------------------------

@query(
    "q_dedup_exact",
    oracle=(
        f"SELECT {_FP_SQL} AS fp, min(doc_id) AS keep_id, count(*) AS n_copies "
        "FROM documents GROUP BY fp"
    ),
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup groups: hash-groupBy on the 32-char fingerprint;
    the shuffle carries digests, never full documents."""
    return dedup_exact(t(spark, sf_dir, "documents"))


@query(
    "q_ngram_jaccard",
    oracle=(
        "WITH base AS (SELECT doc_id, string_split(lower(text), ' ') AS ts "
        "FROM documents WHERE len(string_split(lower(text), ' ')) >= 2), "
        "grams AS (SELECT DISTINCT doc_id, shingle FROM (SELECT doc_id, "
        "unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) "
        "AS shingle FROM base)), "
        "counts AS (SELECT doc_id, count(*) AS n_shingles FROM grams GROUP BY doc_id), "
        "common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common "
        "FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2) "
        "SELECT doc_a, doc_b, round(n_common / (ca.n_shingles + cb.n_shingles "
        "- n_common), 6) AS jaccard "
        "FROM common JOIN counts ca ON ca.doc_id = doc_a "
        "JOIN counts cb ON cb.doc_id = doc_b "
        "WHERE n_common / (ca.n_shingles + cb.n_shingles - n_common) >= 0.5"
    ),
    bench=False,  # quadratic ground-truth path; LSH is the bench/scale path
)
def q_ngram_jaccard(spark, sf_dir):
    """Exact bigram-Jaccard near-dup pairs (ground truth for LSH)."""
    return ngram_jaccard_pairs(t(spark, sf_dir, "documents"), n=2, min_jaccard=0.5)


@query("q_minhash_dedup", oracle=None)  # xxhash64 sketch — engine-specific
def q_minhash_dedup(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs (banded bucket join)."""
    return minhash_candidate_pairs(t(spark, sf_dir, "documents"))


@query("q_simhash_dedup", oracle=None)  # xxhash64 sketch — engine-specific
def q_simhash_dedup(spark, sf_dir):
    """SimHash near-dup candidate pairs (Hamming ≤ 3 via band buckets)."""
    return simhash_candidate_pairs(t(spark, sf_dir, "documents"))


# --- similarity search -----------------------------------------------------

@query(
    "q_cosine_topk",
    oracle=(
        "SELECT vec_id, neighbor_id, cosine, CAST(rnk AS INT) AS rnk FROM ("
        "SELECT vec_id, neighbor_id, cosine, row_number() OVER ("
        "PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rnk FROM ("
        "SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, "
        "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])), 6) AS cosine "
        "FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id)) "
        "WHERE rnk <= 5"
    ),
)
def q_cosine_topk(spark, sf_dir):
    """Exact top-5 cosine neighbors per vector — broadcast GEMM via
    mapInPandas (no shuffle); ranking on rounded score + id tiebreak
    keeps the row set engine-portable."""
    return cosine_topk(t(spark, sf_dir, "embeddings"), k=5)


@query(
    "q_cosine_pairs",
    oracle=(
        "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
        "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])), 6) AS cosine "
        "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id "
        "AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])), 6) >= 0.35"
    ),
)
def q_cosine_pairs(spark, sf_dir):
    """Embedding near-duplicate pairs (cosine ≥ threshold).

    0.35 sits in the top ~0.2% of this synthetic corpus's pair
    distribution (max ≈ 0.51) — a production near-dup filter would
    use ≥0.95; the operator is identical.
    """
    return cosine_pairs_above(t(spark, sf_dir, "embeddings"), threshold=0.35)


@query("q_ann_lsh", oracle=None)  # seeded random hyperplanes — rows-only
def q_ann_lsh(spark, sf_dir):
    """Random-hyperplane LSH candidate pairs — the no-broadcast scale
    path; recall vs brute force is asserted in tests/test_similarity."""
    return lsh_cosine_candidates(t(spark, sf_dir, "embeddings"))


@query("q_ann_ivf", oracle=None)  # KMeans quantizer — rows-only
def q_ann_ivf(spark, sf_dir):
    """IVF approximate top-k: MLlib-KMeans coarse quantizer, per-
    cluster cogrouped GEMM, n_probe fan-out. Recall vs the exact
    brute-force top-k is asserted in tests/test_similarity."""
    return ivf_cosine_topk(
        t(spark, sf_dir, "embeddings"), k=5, n_clusters=8, n_probe=3
    )
