"""BPE training pinned against a pure-Python reference implementation
(greedy left-to-right merge application, count-then-lexicographic
tiebreak — the textbook Sennrich et al. algorithm)."""

from __future__ import annotations

from hls_stac_parquet_spark.operators.tokenizer import (
    bpe_segment,
    bpe_train,
    word_frequencies,
)
from hls_stac_parquet_spark.queries.registry import t
from tests.conftest import SF0001


def _py_bpe(word_freqs: dict[str, int], num_merges: int):
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, c))
        new: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + f
        vocab = new
    return merges, vocab


def test_bpe_train_matches_python_reference(spark):
    words = word_frequencies(t(spark, SF0001, "documents"))
    wf = {r.word: r.freq for r in words.collect()}
    got = bpe_train(words, num_merges=10)
    want, _ = _py_bpe(wf, 10)
    assert got == want


def test_bpe_adjacent_run_and_suffix_safety(spark):
    """Two classic traps: (1) runs of the same pair must merge
    greedily left-to-right ('aaaa' → [aa, aa]); (2) a merged symbol
    whose suffix equals the next rule's left symbol must not match
    mid-symbol ('xar'+'rq' must not merge its inner 'ar'+'r')."""
    df = spark.createDataFrame(
        [("aaaa aaaa aaa xar rq",)] * 5, "text string"
    )
    words = word_frequencies(df)
    wf = {r.word: r.freq for r in words.collect()}
    # 2 merges: (a,a) wins round 1; round 2's winner must be counted
    # and applied with greedy-run semantics identical to the reference
    got = bpe_train(words, num_merges=2)
    want, want_vocab = _py_bpe(wf, 2)
    assert got == want
    seg = {
        r.word: list(r.pieces)
        for r in bpe_segment(df, got).distinct().collect()
    }
    py_seg = {"".join(k): list(k) for k in want_vocab}
    assert seg == py_seg
    # suffix trap: 'xar' must stay unmerged-at-the-boundary — its
    # inner chars can merge, but never ACROSS the word-symbol boundary
    # with the following word's pieces (words are independent rows)
    assert "".join(seg["xar"]) == "xar" and "".join(seg["rq"]) == "rq"


def test_bpe_segment_round_trip(spark):
    """Segmentation is lossless: concat(pieces) == word."""
    docs = t(spark, SF0001, "documents")
    merges = bpe_train(word_frequencies(docs), num_merges=6)
    seg = bpe_segment(docs.limit(50), merges)
    for r in seg.collect():
        assert "".join(r.pieces) == r.word


def test_bpe_segment_keeps_id_cols(spark):
    """bpe_segment with id_cols carries the document key so encode
    accounting can group per doc; piece arrays reconstruct the word."""
    docs = t(spark, SF0001, "documents").limit(20)

    merges = bpe_train(word_frequencies(docs), num_merges=5)
    seg = bpe_segment(docs, merges, id_cols=["doc_id"])
    assert seg.columns == ["doc_id", "word", "pieces"]
    rows = seg.collect()
    assert rows and all("".join(r.pieces) == r.word for r in rows)
