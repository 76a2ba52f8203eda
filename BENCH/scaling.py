"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 between N and 4N executors).

No real cluster exists in this sandbox, so the same flagship extraction job
runs at local[8] and local[32] on IDENTICAL input (the BASELINE.json-
sanctioned stand-in), and we report throughput at both plus
    efficiency = (throughput_32 / throughput_8) / 4.
Results land in BENCH/BASELINE.md.

Run:  python BENCH/scaling.py [n_docs]
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
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1200


def run_at(cpus: int, n_docs: int) -> dict:
    from mit_spark.config import DetectorOptions, PipelineConfig
    from mit_spark.plans.pipeline import extract
    from mit_spark.session import make_session
    from mit_spark.sources.docs_source import load_docs

    spark = make_session(master=f"local[{cpus}]", app_name=f"mit-scaling-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig(detector=DetectorOptions(detect_size=1024))
    docs = load_docs(spark, SF_DIR, limit=n_docs).cache()
    n = docs.count()
    n_spans = docs.selectExpr("sum(size(spans))").collect()[0][0]
    # warm python workers (arena/page-fault warmup is per worker process,
    # amortized in any long-running job; excluded like the reference's
    # criterion benches exclude model load, onnx_bench.rs:130-166)
    extract(spark, docs.limit(max(cpus, 8)), cfg).write.format("noop").mode(
        "overwrite"
    ).save()
    t0 = time.time()
    extract(spark, docs, cfg).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "n_docs": int(n),
        "n_spans": int(n_spans),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n / wall, 3),
        "spans_per_sec": round(n_spans / wall, 3),
    }


def main() -> int:
    low = run_at(8, N_DOCS)
    high = run_at(32, N_DOCS)
    eff = (high["docs_per_sec"] / low["docs_per_sec"]) / (32 / 8)
    out = {"low": low, "high": high, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO_ROOT, "BENCH", "scaling_result.json"), "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
