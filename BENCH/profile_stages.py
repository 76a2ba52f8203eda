"""Stage-level scaling profile: times each sub-plan of the flagship
extraction separately at one parallelism level (run it twice with different
CPUS to compare). Identifies WHICH stage fails to scale N -> 4N.

Usage: python BENCH/profile_stages.py <cpus> [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(cpus: int, n_docs: int) -> None:
    from pyspark.sql import functions as F

    from mit_spark.config import DetectorOptions, PipelineConfig
    from mit_spark.plans.pipeline import extract, extract_flat, regroup
    from mit_spark.session import make_session
    from mit_spark.sources.docs_source import load_docs

    spark = make_session(master=f"local[{cpus}]", app_name=f"profile-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig(detector=DetectorOptions(detect_size=512, emit_mask=False))

    replicate = max(n_docs // 5000, 1)
    docs = load_docs(spark, SF_DIR, replicate=replicate).cache()
    docs.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup full path
    warm = load_docs(spark, SF_DIR, limit=max(cpus * 6, 100))
    noop(extract(spark, warm, cfg))

    timings = {}

    def timeit(name, thunk, reps=2):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            thunk()
            walls.append(round(time.time() - t0, 2))
        timings[name] = walls

    flat = extract_flat(spark, docs, cfg)
    # NB: a filter on the UNION output cannot prune through the opaque
    # mapInPandas, so "text_only" still executes the media UDF — its
    # timing is (media + text); the text branch's true cost is
    # full_extract - media_branch. "media_only" is ~the media stage
    # (the text branch it also runs costs only Catalyst expressions).
    media_only = flat.filter(F.col("media_ref") != "")
    text_only = flat.filter(F.col("kind") == "text")

    timeit("scan_explode_count", lambda: docs.select(F.explode("spans")).count())
    timeit("text_branch", lambda: noop(text_only))
    timeit("media_branch", lambda: noop(media_only))
    timeit("flat_union", lambda: noop(flat))
    timeit("full_extract", lambda: noop(extract(spark, docs, cfg)))
    # regroup over a cached flat (isolates the shuffle+collect cost)
    flat_cached = flat.cache()
    flat_cached.count()
    timeit("regroup_only", lambda: noop(regroup(flat_cached, cfg)))

    print(json.dumps({"cpus": cpus, "n_docs": n_docs, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 5000)
