"""Decompose media_channel_stats cost: JVM-only scan vs raw Arrow
JVM->Python transfer vs full decode+stats.

Usage: python BENCH/media_probe.py   (expects /tmp/mit_bench_media from a
bench.py run; builds it from sf0.1 if missing)

Findings this sandbox reproduces (see BENCH/BASELINE.md):
  * jvm-only length agg      ~0.6-1 s   (stable)
  * transfer-only mapInPandas 1.5 s in quiet host phases, 4-15 s in noisy
    ones — the ~400 MB of binary cells crossing the local socket is
    memory-bandwidth-bound and rides host contention;
  * full decode+histogram stats adds <1.5 s over transfer in every phase.
So the entry's wall-clock variance is the Arrow transfer of large binary
cells, not the operator; on a real cluster the equivalent cost is the
columnar read + IPC, sized by payload bytes.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from mit_spark.operators.multimodal import channel_stats, media_table
    from mit_spark.session import make_session
    from mit_spark.sources.docs_source import load_docs

    spark = make_session(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    media_dir = os.path.join(tempfile.gettempdir(), "mit_bench_media")
    if not os.path.isdir(media_dir):
        media_table(spark, load_docs(spark, SF_DIR, max_doc_no=120)).write.parquet(media_dir)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 * 1024))
    media = spark.read.parquet(media_dir)

    schema = StructType(
        [StructField("media_ref", StringType()), StructField("n", IntegerType())]
    )

    def transfer_only(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "n": [len(c) for c in pdf["content"]]}
            )

    probes = {
        "jvm_only_length_agg": media.select(F.sum(F.length("content")).alias("b")),
        "transfer_only_udf": media.mapInPandas(transfer_only, schema=schema),
        "full_decode_stats": channel_stats(media),
    }
    out = {}
    for label, df in probes.items():
        walls = []
        for _ in range(4):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 2))
        out[label] = walls
        print(label, walls, flush=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
