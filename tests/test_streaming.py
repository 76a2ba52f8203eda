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
