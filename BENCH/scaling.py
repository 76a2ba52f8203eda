"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 between N and 4N executors).

No real cluster exists in this sandbox, so the same flagship extraction job
runs at local[N] and local[4N] on IDENTICAL input (the BASELINE.json-
sanctioned stand-in) and we report throughput at both plus
    efficiency = (throughput_4N / throughput_N) / 4.

Each parallelism level runs in its OWN subprocess: a PySpark JVM pins its
master at first SparkContext creation, so two levels in one process would
silently share the first context's core count.

Method notes:
  * one full warmup pass over a small doc slice first — python workers are
    long-lived daemons (reused across tasks), so arena/page-fault warmup is
    a one-time per-worker cost, excluded exactly like the reference's
    criterion benches exclude model load (onnx_bench.rs:130-166);
  * the measured pass is sized to dominate Spark fixed costs.

Run:  python BENCH/scaling.py [n_docs]     (env PAIR="8,32" to override)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_at(cpus: int, n_docs: int) -> dict:
    """Executed inside a dedicated subprocess (see __main__ dispatch)."""
    from mit_spark.config import DetectorOptions, PipelineConfig
    from mit_spark.plans.pipeline import extract
    from mit_spark.session import make_session
    from mit_spark.sources.docs_source import load_docs

    spark = make_session(master=f"local[{cpus}]", app_name=f"mit-scaling-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.sparkContext.defaultParallelism == cpus, "master not honored"
    cfg = PipelineConfig(detector=DetectorOptions(detect_size=512, emit_mask=False))
    # exact deterministic corpus: n_docs must be a multiple of the base id
    # count (5000 at sf0.1) — a limit() over a union would pick an arbitrary
    # subset and the two parallelism levels must see IDENTICAL input
    replicate = max(n_docs // 5000, 1)
    docs = load_docs(spark, SF_DIR, replicate=replicate).cache()
    n = docs.count()
    n_spans = docs.selectExpr("sum(size(spans))").collect()[0][0]
    # Warmup: TWO full-size passes, not a token slice. Stage-level profiling
    # (BENCH/profile_stages.py) showed the first pass in a fresh JVM runs up
    # to 1.7x slower than steady state — C2 JIT of codegen'd stages, shuffle
    # and Arrow paths all compile during it — which systematically inflates
    # the low-parallelism level less than the high one and corrupts the
    # efficiency ratio. The reference's criterion benches exclude the same
    # class of one-time cost (model load, onnx_bench.rs:130-166).
    for _ in range(2):
        extract(spark, docs, cfg).write.format("noop").mode("overwrite").save()
    # best-of-3 (criterion-style): the sandbox VM shows +-25% run noise
    walls = []
    for _ in range(3):
        t0 = time.time()
        extract(spark, docs, cfg).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    wall = min(walls)
    spark.stop()
    return {
        "cpus": cpus,
        "n_docs": int(n),
        "n_spans": int(n_spans),
        "wall_sec": round(wall, 2),
        "walls_all": [round(w, 2) for w in walls],
        "docs_per_sec": round(n / wall, 3),
        "spans_per_sec": round(n_spans / wall, 3),
    }


def main() -> int:
    pair = tuple(int(x) for x in os.environ.get("PAIR", "4,16").split(","))
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    results = []
    for cpus in pair:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus), str(n_docs)],
            capture_output=True,
            text=True,
            cwd=REPO_ROOT,
        )
        line = out.stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
    low, high = results
    eff = (high["docs_per_sec"] / low["docs_per_sec"]) / (pair[1] / pair[0])
    res = {"low": low, "high": high, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(res, indent=2))
    with open(
        os.path.join(REPO_ROOT, "BENCH", f"scaling_result_{pair[0]}_{pair[1]}.json"), "w"
    ) as f:
        json.dump(res, f, indent=2)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        print(json.dumps(run_at(int(sys.argv[2]), int(sys.argv[3]))))
        raise SystemExit(0)
    raise SystemExit(main())
