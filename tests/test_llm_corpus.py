"""Unit tests for the corpus-curation plan (plans/llm_corpus.py).

Each gate gets a handcrafted document that only IT rejects, so a
regression in any stage flips a specific assertion. The end-to-end
chain is also oracle-gated as q_corpus_pipeline (test_oracle_parity /
driver correctness)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hls_stac_parquet_spark.plans.llm_corpus import curate_corpus

# diverse vocabulary: no word exceeds 2/45 ≈ 4% (repetition gate caps
# the top-word fraction at 12%), with enough stopwords for quality
GOOD = (
    "the quick brown fox jumps over a lazy dog and then quietly runs "
    "toward that distant river for one refreshing drink of cool water "
    "while golden sunlight fades behind tall western mountains as "
    "evening birds sing softly in ancient oak trees above the quiet "
    "green meadow near a winding stone path"
)
# word-shuffled copy of GOOD: same bag of words, different order
SHUFFLED = " ".join(sorted(GOOD.split(), reverse=True))
REPETITIVE = "spam " * 60 + "the a of and to in is it that for end"
LOW_QUALITY = "zzz qqq xxx"  # short, no stopwords → quality < 0.3


def _docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 20, 30, 40],
                "text": [GOOD, SHUFFLED, REPETITIVE, LOW_QUALITY],
            }
        )
    )


def test_curate_corpus_gates_and_dedup(spark):
    out = curate_corpus(_docs(spark)).collect()
    by_id = {r.doc_id: r for r in out}
    # repetitive and low-quality docs are gated out; the shuffled
    # twin collapses onto the min-id survivor
    assert set(by_id) == {10}
    assert by_id[10].split in ("train", "test")
    assert by_id[10].n_tokens == len(GOOD.split())


def test_curate_corpus_split_is_deterministic(spark):
    a = curate_corpus(_docs(spark)).collect()
    b = curate_corpus(_docs(spark)).collect()
    assert {(r.doc_id, r.split) for r in a} == {(r.doc_id, r.split) for r in b}


def test_curate_corpus_no_python_udfs(spark):
    """The whole chain must stay JVM-side (whole-stage codegen):
    BatchEvalPython / ArrowEvalPython in the plan means a stage
    silently fell off the fast path."""
    plan = (
        curate_corpus(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
