"""Semantics of the positional phrase search (phrase_search_topk).

The anchor formulation (posting at pos matching slot s votes for anchor
pos - s; an anchor with all k distinct slots is an occurrence) must count
EXACT adjacent-term occurrences: overlapping occurrences each count,
duplicate-term phrases need slot-distinctness (not term-distinctness),
and a doc containing both words non-adjacently must NOT match.
"""

import contextlib
import io

import pytest


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("phrase_corpus")
    docs = [
        # "table table table" = TWO overlapping "table table" occurrences
        ("d1", "table table table window join"),
        # both phrase words present but never adjacent -> no match
        ("d2", "fast slow spark fast slow spark"),
        ("d3", "fast spark fast spark value table part"),
        # trigram present once; prefix bigram alone must not count for it
        ("d4", "value table part value table x"),
        ("d5", "window join window join window join"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", docs)
    con.execute(f"COPY t TO '{d}/documents.parquet' (FORMAT PARQUET)")
    return str(d)


def _rows(spark, corpus_dir):
    import mit_spark.queries as Q

    df = Q.phrase_search_topk(spark, corpus_dir)
    return {
        (r.query_id, r.doc_id): (r.occurrences, r.rn) for r in df.collect()
    }


def test_phrase_occurrence_counts(spark, corpus_dir):
    got = _rows(spark, corpus_dir)
    # q0 "table table": d1 has the overlapping double (2 anchors), no one else
    assert got[(0, "d1")] == (2, 1)
    assert (0, "d2") not in got and (0, "d4") not in got
    # q1 trigram "value table part": d3 once, d4 once (second start is cut)
    assert got[(1, "d3")][0] == 1 and got[(1, "d4")][0] == 1
    # q2 "fast spark": adjacency required — d2 (non-adjacent) absent, d3 twice
    assert got[(2, "d3")] == (2, 1)
    assert (2, "d2") not in got
    # q3 "window join": d5 three occurrences beats d1's one
    assert got[(3, "d5")] == (3, 1)
    assert got[(3, "d1")] == (1, 2)


def test_matches_duckdb_oracle_on_hand_corpus(spark, corpus_dir):
    import duckdb

    import mit_spark.queries as Q

    sql = Q.QUERIES["phrase_search_topk"][1]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{corpus_dir}/documents.parquet'"
    )
    oracle = sorted(map(tuple, con.execute(sql).fetchall()))
    ours = sorted(map(tuple, Q.phrase_search_topk(spark, corpus_dir).collect()))
    assert ours == oracle


def test_plan_has_no_hof_and_broadcasts_phrases(spark, corpus_dir):
    import mit_spark.queries as Q

    df = Q.phrase_search_topk(spark, corpus_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
