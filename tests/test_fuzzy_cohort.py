"""Semantics of the blocked fuzzy join (fuzzy_match_join) and the cohort
retention matrix (cohort_retention) on hand corpora.

fuzzy_match_join: the blocking key must never split a synthesized mirror
pair, the verify gate must drop blocked-but-distant candidates, and the
reported distances are the hand-computed edit distances (1 for the
deletion class, 2 for the substitution class, 0 for natural exact dups).

cohort_retention: cohorts are first-ATTRIBUTABLE-event ISO weeks (the
event_id % 13 == user_id % 13 thinning), offsets count Monday-to-Monday
weeks, offset-0 retention is always 10000 bp, and non-attributable events
never create activity.
"""

import pytest


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("fuzzy_docs")
    t0 = "aaaaaaaaaa" + "bcdefghijklmnopqrstuvwxy" + "0123456789abcd"  # 48
    t1 = "bbbbbbbbbb" + "cdefghijklmnopqrstuvwxya" + "0123456789abcd"  # 48
    t2 = "cccccccccc" + "defghijklmnopqrstuvwxyab" + "0123456789abcd"  # 48
    t8 = "cccccccccc" + "ZZZZZZZZZZZZZZZZZZZZZZZZ" + "YYYYYYYYYYYYYY"  # 48
    rows = [
        (0, t0),  # 0 % 3 == 0 -> deletion mirror, dist 1
        (1, t1),  # 1 % 3 == 1 -> 'zq' substitution mirror, dist 2
        (2, t2),  # no mirror (2 % 3 == 2)
        (5, t2),  # identical to doc 2 -> natural pair, dist 0
        (8, t8),  # same blocking prefix as doc 2, body far -> filtered
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    con.execute(f"COPY t TO '{d}/documents.parquet' (FORMAT PARQUET)")
    return str(d)


def test_fuzzy_join_pairs_and_distances(spark, docs_dir):
    import mit_spark.queries as Q

    got = sorted(map(tuple, Q.fuzzy_match_join(spark, docs_dir).collect()))
    assert got == [
        (0, 100000, 1),  # deletion mirror
        (1, 100001, 2),  # substitution mirror
        (2, 5, 0),  # natural exact dup, recovered inside the block
    ]
    # the blocked-but-distant candidates (2,8) and (5,8) must be generated
    # by the block and then dropped by the levenshtein gate — i.e. absent.


def test_fuzzy_join_matches_duckdb_oracle_on_hand_corpus(spark, docs_dir):
    import duckdb

    import mit_spark.queries as Q

    sql = Q.QUERIES["fuzzy_match_join"][1]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{docs_dir}/documents.parquet'"
    )
    oracle = sorted(map(tuple, con.execute(sql).fetchall()))
    ours = sorted(map(tuple, Q.fuzzy_match_join(spark, docs_dir).collect()))
    assert ours == oracle


def test_fuzzy_join_plan_is_blocked_not_all_pairs(spark, docs_dir):
    import mit_spark.queries as Q

    plan = Q.fuzzy_match_join(spark, docs_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.fixture(scope="module")
def cohort_events_dir(tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("cohort_events")
    # attributable <=> event_id % 13 == user_id % 13
    rows = [
        # u1 (1 % 13 = 1): weeks W0, W1, W3 -> cohort W0, offsets 0/1/3
        (1, 1, "2024-01-02 10:00:00"),
        (14, 1, "2024-01-09 10:00:00"),
        (27, 1, "2024-01-24 10:00:00"),
        # u1 NON-attributable event in W2 (5 % 13 = 5 != 1): must NOT
        # create offset-2 activity
        (5, 1, "2024-01-17 10:00:00"),
        # u2 (2 % 13 = 2): first touch W1, active W1+W2
        (2, 2, "2024-01-08 09:00:00"),
        (15, 2, "2024-01-15 09:00:00"),
        # u3 (3 % 13 = 3): W0 only
        (3, 3, "2024-01-03 08:00:00"),
        # u14 (14 % 13 = 1, event 40 % 13 = 1): cohort W2 alone
        (40, 14, "2024-01-16 12:00:00"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (event_id BIGINT, user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.execute(f"COPY t TO '{d}/events.parquet' (FORMAT PARQUET)")
    return str(d)


def test_cohort_matrix_hand_corpus(spark, cohort_events_dir):
    import mit_spark.queries as Q

    w0 = 1704067200  # 2024-01-01 (Monday) UTC
    wk = 604800
    got = sorted(map(tuple, Q.cohort_retention(spark, cohort_events_dir).collect()))
    assert got == sorted(
        [
            (w0, 0, 2, 2, 10000),  # u1, u3
            (w0, 1, 1, 2, 5000),  # u1
            (w0, 3, 1, 2, 5000),  # u1 — NO offset-2 row (thinning)
            (w0 + wk, 0, 1, 1, 10000),  # u2
            (w0 + wk, 1, 1, 1, 10000),  # u2
            (w0 + 2 * wk, 0, 1, 1, 10000),  # u14
        ]
    )


def test_cohort_matches_duckdb_oracle_on_hand_corpus(spark, cohort_events_dir):
    import duckdb

    import mit_spark.queries as Q

    sql = Q.QUERIES["cohort_retention"][1]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{cohort_events_dir}/events.parquet'"
    )
    oracle = sorted(map(tuple, con.execute(sql).fetchall()))
    ours = sorted(map(tuple, Q.cohort_retention(spark, cohort_events_dir).collect()))
    assert ours == oracle
