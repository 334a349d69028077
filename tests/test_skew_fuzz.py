"""Hot-key skew parity: the oracle sweep re-run on a deliberately
SKEWED copy of sf0.001 — the dirty-data axis the NULL/unicode/row-order
sweeps don't cover. At 100 TB the failure mode of a skewed corpus is
a wrong-or-dead hot task (one giant dedup cluster, one whale user, one
dominant foreign key), so every key-oriented operator must stay
CORRECT when a single key owns a large fraction of the table — the
plans may slow down (that's what salting/AQE are for) but the results
must be byte-identical to the oracle replaying the same skewed data.

The recipe (deterministic, id-arithmetic only):

- documents: 30% of docs share ONE identical paragraph (a 150-doc
  exact-dup/near-dup mega-cluster hitting every dedup family, with
  n_chars kept consistent), and even doc_ids collapse onto source
  'src0' (hot group key).
- events: 40% of events belong to user_id 7 as 'click' events (hot
  session/window/funnel key).
- lineitem: 30% of rows point at supplier 1 and ~29% at part 1 (hot
  join keys for the TPC-H block).
- orders: 30% of orders belong to the min customer (hot agg key).
- embeddings: 30% of vectors are byte-identical to vec_id-min's
  vector (degenerate ANN/kmeans/dbscan cells, massive cosine ties).

The FULL registry sweep was run on this copy when the fixture landed
(251/251 — see ROUND3_NOTES.md); this module keeps the skew-sensitive
representatives pinned so a regression localizes here.
"""

import duckdb
import pytest

from hls_stac_parquet_spark.testing import check_query
from tests.conftest import SF0001

#: the shared hot paragraph — long enough to carry shingles/windows
#: through every text operator (8-token windows, bigrams, 3-grams)
HOT_TEXT = (
    "the quick brown fox jumps over the lazy dog while the spark "
    "engine shuffles partitions across the cluster and the merge "
    "join streams sorted runs into the final aggregate stage"
)


def build_skew_dir(src: str, out: str) -> None:
    """Write the skewed copy of testdata dir ``src`` into ``out``."""
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT doc_id,
          CASE WHEN doc_id % 10 < 3 THEN '{HOT_TEXT}' ELSE text END AS text,
          lang,
          CASE WHEN doc_id % 2 = 0 THEN 'src0' ELSE source END AS source,
          CASE WHEN doc_id % 10 < 3 THEN length('{HOT_TEXT}')
               ELSE n_chars END AS n_chars
         FROM read_parquet('{src}/documents.parquet'))
        TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT event_id, ts,
          CASE WHEN event_id % 5 < 2 THEN 7 ELSE user_id END AS user_id,
          CASE WHEN event_id % 5 < 2 THEN 'click' ELSE event_type
            END AS event_type,
          value, props
         FROM read_parquet('{src}/events.parquet'))
        TO '{out}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT * REPLACE (
          CASE WHEN l_orderkey % 10 < 3 THEN 1 ELSE l_suppkey
            END AS l_suppkey,
          CASE WHEN l_orderkey % 7 < 2 THEN 1 ELSE l_partkey
            END AS l_partkey)
         FROM read_parquet('{src}/lineitem.parquet'))
        TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT * REPLACE (
          CASE WHEN o_orderkey % 10 < 3 THEN
            (SELECT min(c_custkey)
             FROM read_parquet('{src}/customer.parquet'))
          ELSE o_custkey END AS o_custkey)
         FROM read_parquet('{src}/orders.parquet'))
        TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (WITH hot AS (SELECT embedding AS hot_vec
                FROM read_parquet('{src}/embeddings.parquet')
                ORDER BY vec_id LIMIT 1)
          SELECT vec_id,
            CASE WHEN vec_id % 10 < 3 THEN hot.hot_vec
                 ELSE embedding END AS embedding,
            label
          FROM read_parquet('{src}/embeddings.parquet') CROSS JOIN hot)
        TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    for tbl in ["region", "nation", "customer", "supplier", "part"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{tbl}.parquet')) "
            f"TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skewfuzz"))
    build_skew_dir(SF0001, out)
    return out


# the skew-sensitive representatives: one per hot-key family
SKEW_QUERIES = [
    # 150-doc identical-text mega-cluster
    "q_dedup_exact",
    "q_dedup_clusters",
    "q_dedup_survivors",
    "q_jaccard_prefix_join",
    "q_substring_dup_pairs",
    "q_containment_pairs",
    "q_boilerplate_removal",
    "q_source_overlap",
    "q_tfidf",
    "q_perplexity_filter",
    "q_url_canonical_dedup",
    "q_token_fertility",
    # whale user / hot group key
    "q_sessionize",
    "q_ohlc_bars",
    "q_cuped",
    "q_funnel_windowed",
    "q_session_paths",
    "q_hash_agg",
    "q_topk",
    # hot join keys (TPC-H block)
    "q_join_inner_hash",
    "q_join_skew_salted",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_market_basket",
    # degenerate embedding cells / massive cosine ties
    "q_cosine_topk",
    "q_embedding_dedup",
    "q_kmeans_clusters",
    "q_dbscan",
    "q_knn_classifier",
]


@pytest.mark.parametrize("name", SKEW_QUERIES)
def test_parity_on_skewed_data(spark, skew_dir, name):
    r = check_query(spark, skew_dir, name)
    assert r.match, f"{name} diverged on skewed data: {r.detail}"


def test_skew_dir_is_actually_skewed(skew_dir):
    con = duckdb.connect()
    hot_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{skew_dir}/documents.parquet') "
        "WHERE text = ?", [HOT_TEXT]
    ).fetchone()[0]
    total_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{skew_dir}/documents.parquet')"
    ).fetchone()[0]
    assert hot_docs >= 0.25 * total_docs
    whale = con.execute(
        f"SELECT count(*) FILTER (user_id = 7) * 1.0 / count(*) "
        f"FROM read_parquet('{skew_dir}/events.parquet')"
    ).fetchone()[0]
    assert whale >= 0.35
    hot_vecs = con.execute(
        f"SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM "
        f"read_parquet('{skew_dir}/embeddings.parquet') "
        f"GROUP BY embedding::VARCHAR)"
    ).fetchone()[0]
    assert hot_vecs >= 0.25 * total_docs


# ---- whale-doc robustness ------------------------------------------------
# One enormous document (50k tokens) — the per-DOC hot row. Distinct
# failure mode from hot KEYS: every operator that collects a per-doc
# array (ordered NLL folds, chunk lists, shingle sets, bigram arrays)
# must stay correct when a single row is 1000x the median, because a
# 100 TB crawl always contains a few book-length outliers.

WHALE_QUERIES = [
    "q_perplexity_filter",
    "q_boilerplate_removal",
    "q_text_stats",
    "q_doc_repetition",
    "q_token_count",
    "q_distinct_ngrams",
    "q_minhash_dedup",
    "q_substring_dup_pairs",
    "q_pack_sequences",
    "q_keywords_rake",
    "q_token_fertility",
]


@pytest.fixture(scope="module")
def whale_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("whaledoc"))
    con = duckdb.connect()
    # doc 1 becomes ~50k tokens (deterministic pseudo-words so the
    # vocab is realistic, not one token repeated)
    con.execute(f"""
        COPY (SELECT doc_id,
          CASE WHEN doc_id = 1 THEN (
            SELECT string_agg('w' || (i * 2654435761 % 997), ' ')
            FROM range(50000) t(i))
          ELSE text END AS text,
          lang, source,
          CASE WHEN doc_id = 1 THEN 300000 ELSE n_chars END AS n_chars
         FROM read_parquet('{SF0001}/documents.parquet'))
        TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "embeddings"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF0001}/{tbl}.parquet')) "
            f"TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    return out


@pytest.mark.parametrize("name", WHALE_QUERIES)
def test_parity_with_whale_doc(spark, whale_dir, name):
    r = check_query(spark, whale_dir, name)
    assert r.match, f"{name} diverged with a whale doc: {r.detail}"
