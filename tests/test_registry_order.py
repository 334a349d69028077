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


def test_every_query_callable_and_oracle_typed():
    for name, spec in REGISTRY.items():
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
