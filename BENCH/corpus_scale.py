"""Corpus-scale evidence: the flagship extraction at replicate=1 (sf0.1,
5k docs) vs replicate=N (default 10: ~50k docs / ~490k spans, the sf1
equivalent) on the SAME worker count. The north rule's scale story needs
per-span cost to stay flat as the corpus grows — parallelism is constant,
so a flat ratio means no super-linear stage (regroup, shuffle, driver
state) is hiding in the plan.

Usage:  python BENCH/corpus_scale.py [N]      (default N=10)
Writes BENCH/corpus_scale_result.json (replicate_1 / replicate_N rows +
throughput ratio) and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def measure(replicate: int) -> dict:
    from bench import _host_probe, _wait_for_quiet
    from mit_spark.config import DetectorOptions, PipelineConfig
    from mit_spark.plans.pipeline import extract
    from mit_spark.session import make_session
    from mit_spark.sources.docs_source import load_docs

    probe = _wait_for_quiet()
    spark = make_session(master=f"local[{CPUS}]", app_name=f"corpus-scale-{replicate}")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig(detector=DetectorOptions(detect_size=512, emit_mask=False))
    docs = load_docs(spark, SF_DIR, replicate=replicate).cache()
    n_docs = docs.count()
    n_spans = docs.selectExpr("sum(size(spans))").collect()[0][0]

    walls = []
    for i in range(2):  # pass 0 = full-size JIT/import warmup, pass 1 = timed
        t0 = time.time()
        extract(spark, docs, cfg).write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 2))
    wall = walls[-1]
    out = {
        "n_docs": int(n_docs),
        "n_spans": int(n_spans),
        "wall_sec": wall,
        "walls_all": walls,
        "docs_per_sec": round(n_docs / wall, 2),
        "spans_per_sec": round(n_spans / wall, 2),
        "probe_before": probe,
        "probe_after": _host_probe(),
    }
    spark.stop()
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    r1 = measure(1)
    rn = measure(n)
    result = {
        "replicate_1": r1,
        f"replicate_{n}": rn,
        "cpus": int(CPUS),
        f"throughput_ratio_{n}x_vs_1x": round(
            rn["spans_per_sec"] / r1["spans_per_sec"], 3
        ),
        "per_span_cost_ratio": round(r1["spans_per_sec"] / rn["spans_per_sec"], 3),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "corpus_scale_result.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
