"""Streaming micro-batch extraction == batch oracle on a bounded stream."""

from mit_spark.config import DetectorOptions, PipelineConfig
from mit_spark.oracle import extract_docs
from mit_spark.schema import DOCS
from mit_spark.streaming.micro_batch import run_stream
from mit_spark.synth import gen_docs

CFG = PipelineConfig(detector=DetectorOptions(detect_size=512))


def test_stream_available_now_matches_oracle(spark, tmp_path):
    docs = gen_docs(8)
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckp = str(tmp_path / "ckp")
    # two "arrival" files -> at least one multi-file micro-batch drain
    spark.createDataFrame(docs[:4], schema=DOCS).write.parquet(inp)
    spark.createDataFrame(docs[4:], schema=DOCS).write.mode("append").parquet(inp)

    run_stream(spark, inp, out, ckp, CFG, available_now=True)

    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
        for r in spark.read.parquet(out).collect()
    }
    want = {
        d["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in d["spans"]]
        for d in extract_docs(docs, CFG)
    }
    assert got == want

    # drain again: no new files -> no duplicate outputs (streaming checkpoint)
    run_stream(spark, inp, out, ckp, CFG, available_now=True)
    assert spark.read.parquet(out).count() == len(docs)


def test_streaming_drain_builder_idempotent(spark):
    """Registry builder contract: invoking the streaming_drain builder twice
    (as a hashing gate may) yields identical rows and re-stages nothing —
    the arrival files live behind a deterministic _STAGED marker."""
    import glob
    import hashlib
    import os
    import tempfile

    from mit_spark.queries import QUERIES

    builder, _ = QUERIES["streaming_drain"]
    sf_dir = "/root/testdata/sf0.001"
    r1 = sorted(tuple(r) for r in builder(spark, sf_dir).collect())
    key = hashlib.md5((os.path.abspath(sf_dir) + ":v2").encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"mit_stream_{key}")
    files_before = sorted(glob.glob(f"{base}/in/*.parquet"))
    r2 = sorted(tuple(r) for r in builder(spark, sf_dir).collect())
    assert r1 == r2
    assert sorted(glob.glob(f"{base}/in/*.parquet")) == files_before
