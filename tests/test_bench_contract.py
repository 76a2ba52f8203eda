"""Guards on the two driver-facing registries: every bench.py entry must
resolve to a registered query (a typo would crash the driver's per-round
bench run), and the driver-gate window invariants must hold."""


def test_bench_queries_all_registered():
    import bench
    from mit_spark.queries import QUERIES

    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing, f"bench.py names not in the registry: {missing}"


def test_every_query_has_oracle_or_is_rows_only():
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    # oracle_sql keys must be a subset of queries (dangling oracles would
    # make the driver compare against a missing Spark side)
    dangling = [n for n in o if n not in q]
    assert not dangling, f"oracle_sql entries without a query: {dangling}"


def test_driver_window_is_exactly_50():
    import __spark_entry__ as E

    names = list(E.queries().keys())
    from mit_spark.queries import _WINDOW_BACK

    front = [n for n in names if n not in _WINDOW_BACK]
    assert len(front) == 50
    assert names[:50] == front
