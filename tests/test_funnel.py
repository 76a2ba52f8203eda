"""Semantics of the multi-step funnel (funnel_conversion).

First-touch, strictly-increasing rules on a hand corpus: a click before
the user's first view never converts, a purchase needs a committed click
(a view->purchase user is NOT a purchase conversion), the committed step
time is the EARLIEST qualifying event, and delays sum exactly.
"""

import pytest


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("funnel_events")
    rows = [
        # u1: full funnel — delays 300 s (view->click) and 900 s
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:05:00"),
        (1, "purchase", "2024-01-01 10:20:00"),
        # u2: click BEFORE first view, none after -> view-only
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 09:30:00"),
        # u3: view then purchase with no click -> purchase must not count
        (3, "view", "2024-01-01 08:00:00"),
        (3, "purchase", "2024-01-01 08:10:00"),
        # u4: pre-view click ignored, post-view click commits at 07:30;
        # purchase at 07:29 precedes the committed click -> no purchase
        (4, "click", "2024-01-01 06:50:00"),
        (4, "view", "2024-01-01 07:00:00"),
        (4, "click", "2024-01-01 07:30:00"),
        (4, "purchase", "2024-01-01 07:29:00"),
        # u5: never viewed -> contributes nothing
        (5, "click", "2024-01-01 12:00:00"),
        (5, "purchase", "2024-01-01 12:30:00"),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (user_id BIGINT, event_type VARCHAR, ts TIMESTAMP)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.execute(f"COPY t TO '{d}/events.parquet' (FORMAT PARQUET)")
    return str(d)


def test_funnel_step_semantics(spark, events_dir):
    import mit_spark.queries as Q

    row = Q.funnel_conversion(spark, events_dir).collect()[0].asDict()
    assert row == {
        "users_view": 4,  # u1 u2 u3 u4
        "users_click": 2,  # u1 u4
        "users_purchase": 1,  # u1 only
        "click_delay_total_sec": 300 + 1800,
        "purchase_delay_total_sec": 900,
    }


def test_funnel_matches_duckdb_oracle_on_hand_corpus(spark, events_dir):
    import duckdb

    import mit_spark.queries as Q

    sql = Q.QUERIES["funnel_conversion"][1]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{events_dir}/events.parquet'"
    )
    oracle = sorted(map(tuple, con.execute(sql).fetchall()))
    ours = sorted(map(tuple, Q.funnel_conversion(spark, events_dir).collect()))
    assert ours == oracle
