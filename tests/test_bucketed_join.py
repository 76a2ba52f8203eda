"""Proof for the bucketed-join scale claims the operator docstrings make
(e.g. incremental_dedup: "a corpus bucketed on content_hash makes [the
semi-join] shuffle-free on the big side"; SURVEY.md §7.8): writing the
corpus with bucketBy on the join key must make Spark elide the Exchange
on the bucketed side, while the unbucketed plan shuffles both sides."""

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # managed tables need a warehouse; the session fixture sets one under
    # /tmp — just verify it is usable and clean our tables afterwards
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    yield "bktest"
    spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def _exchanges_below_join(plan: str) -> int:
    return plan.count("Exchange hashpartitioning")


def test_bucketby_elides_big_side_shuffle(spark, warehouse):
    from pyspark.sql import functions as F

    from mit_spark.sources.docs_source import read_table

    SF = "/root/testdata/sf0.001"
    docs = read_table(spark, SF, "documents").select(
        "doc_id", F.md5(F.trim("text")).alias("content_hash")
    )
    batch = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "content_hash"
    )
    spark.sql(f"DROP TABLE IF EXISTS {warehouse}.corpus_bucketed")
    spark.sql(f"DROP TABLE IF EXISTS {warehouse}.corpus_plain")
    (
        docs.write.bucketBy(8, "content_hash")
        .sortBy("content_hash")
        .saveAsTable(f"{warehouse}.corpus_bucketed")
    )
    docs.write.saveAsTable(f"{warehouse}.corpus_plain")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j_b = spark.table(f"{warehouse}.corpus_bucketed").join(
            batch, "content_hash", "left_semi"
        )
        j_p = spark.table(f"{warehouse}.corpus_plain").join(
            batch, "content_hash", "left_semi"
        )
        plan_b = j_b._jdf.queryExecution().executedPlan().toString()
        plan_p = j_p._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    # plain: both join inputs shuffle; bucketed: only the batch side does
    assert _exchanges_below_join(plan_p) == 2, plan_p[:500]
    assert _exchanges_below_join(plan_b) == 1, plan_b[:500]
    # and the results are identical
    got = sorted(r["doc_id"] for r in j_b.collect())
    want = sorted(r["doc_id"] for r in j_p.collect())
    assert got == want and len(got) > 0


def test_bucketby_elides_corpus_shuffle_in_stage1_shape(spark, warehouse):
    """incremental_dedup stage 1 verbatim: the BATCH is the left side of a
    LEFT SEMI join and the corpus is the right (big) side. With the corpus
    bucketed on the join key, only the batch side exchanges — the corpus's
    bucket layout feeds the sort-merge join directly, which is the claim
    the operator docstring makes for the 10^12-doc case."""
    from pyspark.sql import functions as F

    from mit_spark.sources.docs_source import read_table

    SF = "/root/testdata/sf0.001"
    docs = read_table(spark, SF, "documents").select(
        "doc_id", F.md5(F.trim("text")).alias("content_hash")
    )
    batch = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "content_hash"
    )
    spark.sql(f"DROP TABLE IF EXISTS {warehouse}.corpus_bucketed2")
    (
        docs.write.bucketBy(8, "content_hash")
        .sortBy("content_hash")
        .saveAsTable(f"{warehouse}.corpus_bucketed2")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        corpus_hashes = spark.table(f"{warehouse}.corpus_bucketed2").select(
            "content_hash"
        )
        j = batch.join(corpus_hashes, "content_hash", "left_semi")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    # exactly ONE exchange (the small batch side); the corpus side reads
    # its buckets shuffle-free
    assert _exchanges_below_join(plan) == 1, plan[:800]
    assert sorted(r["doc_id"] for r in j.collect())  # non-empty, runs
