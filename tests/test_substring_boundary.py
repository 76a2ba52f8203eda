"""Token-exact boundary refinement of substring_dedup_runs, exercised in
BOTH directions on a hand-built corpus (the synthetic documents tables only
ever fire the END extension — their shared passages are doc prefixes — so
this is the value test for the START path and for exact extension widths).

Corpus construction (8-word chunks):
  doc 1:  u0..u4  S0..S23  v0..v2           (same S tokens, MISALIGNED)
  doc 2:  p0..p7           S0..S23  q0..q7  (S chunk-aligned at chunk 1)
  doc 3:  x0 x1 x2 p3..p7  S0..S23  q0..q6 z0
Docs 2/3 share exactly three full chunks (S0..S23 at chunks 1..3 — their
boundary chunks differ, so the chunk-level run is chunks 1..3), plus a
5-token anchored START extension (both chunk-0s end in p3..p7, and the
anchored suffix signature stops at k=5 where doc 2 has p2 but doc 3 has
x2) and a 7-token END extension (both chunk-4s start with q0..q6 and
diverge at the 8th token — also the k<=7 cap: a shared 8th token would
have made chunk 4 itself duplicated and part of the run). Expected run,
token-exact, for each of docs 2/3: start_tok = 8-5 = 3,
run_tokens = 24+5+7 = 36. Doc 1 holds the same S tokens at a different
alignment, proving misaligned copies do NOT join the run (the documented
chunk-alignment trade, unchanged by boundary refinement).
"""

import duckdb
import pytest


def _mk_docs():
    S = [f"s{i}" for i in range(24)]
    doc1 = [f"u{i}" for i in range(5)] + S + [f"v{i}" for i in range(3)]
    doc2 = [f"p{i}" for i in range(8)] + S + [f"q{i}" for i in range(8)]
    doc3 = (
        ["x0", "x1", "x2"]
        + [f"p{i}" for i in range(3, 8)]
        + S
        + [f"q{i}" for i in range(7)]
        + ["z0"]
    )
    return [
        (1, " ".join(doc1)),
        (2, " ".join(doc2)),
        (3, " ".join(doc3)),
    ]


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("substr_sf")
    spark.createDataFrame(_mk_docs(), "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_token_exact_boundaries_both_directions(spark, sf_dir):
    from mit_spark.queries import QUERIES

    builder, sql = QUERIES["substring_dedup_runs"]
    got = sorted(tuple(r) for r in builder(spark, sf_dir).collect())

    assert got == [
        (2, 3, 3, 36),
        (3, 3, 3, 36),
    ], got

    # the DuckDB oracle agrees on the same corpus
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
