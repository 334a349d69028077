"""Registry rotation — the driver checks only the first 50 entries,
so ordering IS the correctness-gate coverage policy."""

from hls_stac_parquet_spark.queries import CONTRACT_QUERIES, REGISTRY


def test_contract_queries_register_first_in_survey_order():
    names = list(REGISTRY)
    assert names[: len(CONTRACT_QUERIES)] == CONTRACT_QUERIES


def test_contract_set_fits_driver_window():
    assert len(CONTRACT_QUERIES) <= 50


def test_rotation_prefers_unverified_tail():
    """Behind the contract block: failed-last-round first (prove the
    fix), then never-checked, then verified (least-verified first) —
    so every registered query eventually earns a CORRECTNESS row."""
    from hls_stac_parquet_spark.queries import load_check_history

    hist = load_check_history()
    if not hist:
        return  # fresh clone: nothing to assert beyond contract order
    tail = list(REGISTRY)[len(CONTRACT_QUERIES):]

    def tier(name):
        ent = hist.get(name, {"checked": [], "green": []})
        if ent["checked"] and not ent["green"]:
            return 0
        if not ent["checked"]:
            return 1
        return 2 + len(ent["green"])

    tiers = [tier(n) for n in tail]
    assert tiers == sorted(tiers)


def test_rows_only_driver_rows_count_as_green():
    """A driver row with err == "no_oracle" and spark_rows >= 0 is the
    rows-only pass — it must go green, not clog tier 0 forever.
    Regression test for the round-2 verdict's top finding."""
    from hls_stac_parquet_spark.queries import load_check_history

    hist = load_check_history()
    if not hist:
        return
    # q_ann_ivf/q_ann_lsh/q_approx_percentile/q_minhash_dedup/
    # q_count_distinct_approx all got no_oracle rows in round 2
    for name in ("q_ann_ivf", "q_ann_lsh", "q_approx_percentile"):
        ent = hist.get(name)
        if ent and ent["checked"]:
            assert ent["green"], f"{name} checked-but-never-green: rows-only clog"


def test_no_already_green_query_in_rotating_slots():
    """Rotating slots (window positions 36..49) must be spent on
    queries without a driver-green row — never on re-checking green
    ones while never-checked queries wait."""
    from hls_stac_parquet_spark.queries import load_check_history

    hist = load_check_history()
    if not hist:
        return
    window = list(REGISTRY)[:50]
    never_green = [n for n in REGISTRY if not hist.get(n, {}).get("green")]
    for n in window[len(CONTRACT_QUERIES):]:
        if hist.get(n, {}).get("green") and len(never_green) >= 14:
            raise AssertionError(f"green query {n} occupies a rotating slot")


def test_priority_queries_exist_in_registry():
    from hls_stac_parquet_spark.queries import PRIORITY_QUERIES

    missing = [n for n in PRIORITY_QUERIES if n not in REGISTRY]
    assert not missing, missing


def test_every_query_callable_and_oracle_typed():
    for name, spec in REGISTRY.items():
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
