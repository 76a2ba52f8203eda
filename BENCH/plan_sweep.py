"""Registry-wide executed-plan anti-pattern sweep.

Executes EVERY registry entry at $SWEEP_SF (default /root/testdata/sf0.001)
on local[4] with the noop sink, then scans the executed plan string for the
shapes that do not survive 100 TB: CartesianProduct, row-at-a-time Python
(BatchEvalPython), and tallies the bounded exceptions (Arrow islands,
BroadcastNestedLoopJoin) so the PLANS.md appendix can name them. Prints one
JSON line.

Usage: python BENCH/plan_sweep.py
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    from mit_spark import queries
    from mit_spark.session import make_session

    sf_dir = os.environ.get("SWEEP_SF", "/root/testdata/sf0.001")
    spark = make_session(master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    cartesian, python_rows, arrow, bnlj, errors = [], [], [], [], {}
    names = list(queries.QUERIES)
    for name in names:
        fn, _ = queries.QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BatchEvalPython" in plan:
            python_rows.append(name)
        if any(
            t in plan
            for t in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        ):
            arrow.append(name)
        if "BroadcastNestedLoopJoin" in plan:
            bnlj.append(name)
    spark.stop()

    print(
        json.dumps(
            {
                "entries": len(names),
                "executed": len(names) - len(errors),
                "cartesian": cartesian,
                "row_python": python_rows,
                "arrow_islands": sorted(arrow),
                "bnlj": sorted(bnlj),
                "errors": errors or None,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
