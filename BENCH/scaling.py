"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 between N and 4N executors).

No real cluster exists in this sandbox, so the same flagship extraction job
runs at local[N] and local[4N] on IDENTICAL input (the BASELINE.json-
sanctioned stand-in) and we report throughput at both plus
    efficiency = (throughput_4N / throughput_N) / 4.

Default pair is N=4 -> 4N=16. A single box shares one memory bus across
all workers: the per-image numpy work is partially DRAM-bound, so 32
co-located workers see ~1.25x per-image slowdown (measured intrinsic
efficiency 8->32 ~= 0.8, 4->16 ~= 0.99). On a real 4N-executor cluster
each node brings its own memory channels, so the 4->16 pair is the
faithful proxy; we report 8->32 alongside it when asked (PAIR env).

Method notes:
  * one full warmup pass over a small doc slice first — python workers are
    long-lived daemons (spark.python.worker.reuse), so arena/page-fault
    warmup is a one-time per-worker cost, excluded exactly like the
    reference's criterion benches exclude model load (onnx_bench.rs:130-166);
  * the measured pass is sized to dominate Spark fixed costs (>= ~1 min at
    the high parallelism).

Run:  python BENCH/scaling.py [n_docs]    (env PAIR="8,32" to override)
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
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
PAIR = tuple(int(x) for x in os.environ.get("PAIR", "4,16").split(","))


def run_at(cpus: int, n_docs: int) -> dict:
    from mit_spark.config import DetectorOptions, PipelineConfig
    from mit_spark.plans.pipeline import extract
    from mit_spark.session import make_session
    from mit_spark.sources.docs_source import load_docs

    spark = make_session(master=f"local[{cpus}]", app_name=f"mit-scaling-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig(detector=DetectorOptions(detect_size=512, emit_mask=False))
    docs = load_docs(spark, SF_DIR, limit=n_docs).cache()
    n = docs.count()
    n_spans = docs.selectExpr("sum(size(spans))").collect()[0][0]
    # warmup pass: touch every worker/code path once
    warm = load_docs(spark, SF_DIR, limit=max(cpus * 6, 100))
    extract(spark, warm, cfg).write.format("noop").mode("overwrite").save()
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
    low = run_at(PAIR[0], N_DOCS)
    high = run_at(PAIR[1], N_DOCS)
    eff = (high["docs_per_sec"] / low["docs_per_sec"]) / (PAIR[1] / PAIR[0])
    out = {"low": low, "high": high, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO_ROOT, "BENCH", f"scaling_result_{PAIR[0]}_{PAIR[1]}.json"), "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
