"""Staging equivalence for the exact recall-panel ground truth: the parquet
artifact `_staged_exact_panel` serves to every recall eval must be row-equal
to the live brute-force pass `_exact_panel_topk` it materializes — staging
may never change WHAT the evals compare against, only how often it is paid.
Also pins the idempotence contract: a second call must be a pure read (the
_STAGED marker short-circuits the build)."""

import os

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted((r["q_id"], r["n_id"]) for r in df.collect())


def test_staged_panel_equals_live(spark):
    from mit_spark.queries import _exact_panel_topk, _staged_exact_panel, _staging_dir

    staged = _rows(_staged_exact_panel(spark, SF_DIR))
    live = _rows(_exact_panel_topk(spark, SF_DIR))
    assert staged == live
    assert len(staged) > 0

    # second call reads the marker-complete dir without rebuilding
    base = _staging_dir(SF_DIR, "exact_panel", "v1")
    marker = os.path.join(base, "_STAGED")
    mtime = os.path.getmtime(marker)
    again = _rows(_staged_exact_panel(spark, SF_DIR))
    assert again == staged
    assert os.path.getmtime(marker) == mtime
