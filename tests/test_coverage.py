"""Greedy max-cover operator: exact replay + submodularity properties."""

from __future__ import annotations


def _greedy(posts, k):
    """Independent dict/set replay of the greedy with the same tie rule."""
    docs = {}
    for d, t in posts:
        docs.setdefault(d, set()).add(t)
    covered: set = set()
    out = []
    for rank in range(1, k + 1):
        best = None
        for d, toks in docs.items():
            g = len(toks - covered)
            if g <= 0:
                continue
            key = (-g, d)
            if best is None or key < best[0]:
                best = (key, d, g)
        if best is None:
            break
        _, d, g = best
        covered |= docs.pop(d)
        out.append((rank, d, g, len(covered)))
    return out


def test_greedy_max_cover_matches_replay(spark):
    from hls_stac_parquet_spark.operators.coverage import greedy_max_cover

    posts = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "b"), (2, "c"), (2, "d"), (2, "e"),
        (3, "e"), (3, "f"),
        (4, "f"),
        (5, "g"), (5, "a"),
    ]
    df = spark.createDataFrame(posts, "doc_id long, tok string")
    got = sorted(
        (r.rank, r.doc_id, r.gain, r.covered_total)
        for r in greedy_max_cover(df, k=4).collect()
    )
    assert got == _greedy([(d, t) for d, t in posts], 4)


def test_greedy_max_cover_gains_non_increasing_and_stops(spark):
    from hls_stac_parquet_spark.operators.coverage import greedy_max_cover

    # coverage gain is submodular: the greedy's marginal gains can
    # never increase; and once everything is covered the loop stops
    # early instead of emitting zero-gain picks
    posts = [(d, f"t{t}") for d in range(10) for t in range(d, d + 3)]
    df = spark.createDataFrame(posts, "doc_id long, tok string")
    rows = sorted(greedy_max_cover(df, k=50).collect(), key=lambda r: r.rank)
    gains = [r.gain for r in rows]
    assert gains == sorted(gains, reverse=True)
    assert all(g > 0 for g in gains)
    assert rows[-1].covered_total == 12  # tokens t0..t11 all covered
    assert len(rows) < 50  # early stop, not k zero-gain picks
