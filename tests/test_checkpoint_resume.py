"""Resume-without-recompute tests (FIXTURES.md F6 / SURVEY.md §5.iv):
run k waves, kill, rerun; finished buckets untouched, final output equals
the oracle."""

import os

import pytest

from mit_spark.config import DetectorOptions, PipelineConfig
from mit_spark.oracle import extract_docs
from mit_spark.plans.checkpoint import (
    done_buckets,
    read_extracted,
    read_lineage,
    run_extraction,
)
from mit_spark.schema import DOCS
from mit_spark.synth import gen_docs

CFG = PipelineConfig(detector=DetectorOptions(detect_size=512), n_buckets=8, regroup_salt=4)


def _tuples(rows):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
        for r in rows
    }


def test_kill_and_resume(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    docs = gen_docs(16)
    docs_df = spark.createDataFrame(docs, schema=DOCS)

    # phase 1: "killed" after 2 waves of 2 buckets
    m1 = run_extraction(spark, docs_df, out_dir, CFG, wave_size=2, max_waves=2)
    assert m1["buckets_processed"] == 4
    done1 = done_buckets(spark, out_dir)
    assert len(done1) == 4
    finished1 = {
        r["bucket_id"]: r["finished_at"]
        for r in read_lineage(spark, out_dir).filter("status = 'done'").collect()
    }

    # phase 2: resume
    m2 = run_extraction(spark, docs_df, out_dir, CFG, wave_size=2)
    assert m2["buckets_done_prior"] == 4
    assert m2["buckets_processed"] == CFG.n_buckets - 4

    # finished buckets were not recomputed: their lineage rows are unchanged
    lin = read_lineage(spark, out_dir).filter("status = 'done'").collect()
    by_bucket = {}
    for r in lin:
        by_bucket.setdefault(r["bucket_id"], []).append(r["finished_at"])
    for b in done1:
        assert len(by_bucket[b]) == 1, f"bucket {b} has duplicate lineage rows"
        assert by_bucket[b][0] == finished1[b]

    # final output == oracle (span-sequence equality)
    got = _tuples(read_extracted(spark, out_dir).collect())
    want = _tuples(
        [
            {"doc_id": d["doc_id"], "spans": d["spans"]}
            for d in extract_docs(docs, CFG)
        ]
    )
    assert got == want


def test_idempotent_full_rerun(spark, tmp_path):
    out_dir = str(tmp_path / "out2")
    docs_df = spark.createDataFrame(gen_docs(6), schema=DOCS)
    run_extraction(spark, docs_df, out_dir, CFG)
    n1 = read_extracted(spark, out_dir).count()
    m = run_extraction(spark, docs_df, out_dir, CFG)  # everything done -> no-op
    assert m["buckets_processed"] == 0
    assert read_extracted(spark, out_dir).count() == n1


def test_resume_refuses_mismatched_spec_version(spark, tmp_path):
    """A resumed run must not mix cleaning-spec versions in one output
    table: run_extraction stamps _meta.json and refuses resume=True when
    the stamp differs from this build's PIPELINE_SPEC_VERSION."""
    import json

    import pytest

    from mit_spark.config import DetectorOptions, PipelineConfig
    from mit_spark.plans.checkpoint import run_extraction
    from mit_spark.schema import DOCS
    from mit_spark.synth import gen_docs

    cfg = PipelineConfig(detector=DetectorOptions(detect_size=256), n_buckets=4)
    docs = spark.createDataFrame(gen_docs(6), schema=DOCS)
    out = str(tmp_path / "out")
    run_extraction(spark, docs, out, cfg, max_waves=1)
    meta = json.load(open(f"{out}/_meta.json"))
    assert meta["pipeline_spec_version"]

    # simulate output written by an older build
    json.dump({"pipeline_spec_version": "0-old"}, open(f"{out}/_meta.json", "w"))
    with pytest.raises(RuntimeError, match="spec"):
        run_extraction(spark, docs, out, cfg, resume=True)
