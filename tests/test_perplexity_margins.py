"""Float-safety guards for lm_perplexity_buckets: the only cross-engine
float risk is (a) floor(1000*log2(N/c)) flipping when the millibit value
sits within libm-ulp of an integer, and (b) a document score sitting
within ulp of a quartile boundary. Both margins are measured here against
the same corpus the oracle gate uses — the kmeans assignment-margin
discipline (round-3): commit to a value oracle only after measuring that
the inputs keep a comfortable distance from every rounding cliff.
"""

import os

import duckdb
import pytest

SF_DIR = os.environ.get("MIT_SPARK_TEST_SF", "/root/testdata/sf0.001")

# libm implementations differ in the last ulp (~1e-13 relative); anything
# above 1e-6 absolute is 7 orders of magnitude of headroom
MARGIN = 1e-6


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return c


def test_millibit_floor_margin(con):
    lo, hi = con.execute(
        """
        WITH toks AS (SELECT unnest(split(trim(text), ' ')) AS t FROM documents),
        lm AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY t),
        nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM lm),
        v AS (SELECT 1000.0 * log2(CAST(n AS DOUBLE) / c) AS x FROM lm, nn)
        SELECT min(x - floor(x)) FILTER (x != floor(x)),
               min(ceil(x) - x) FILTER (x != ceil(x))
        FROM v
        """
    ).fetchone()
    # exact-integer millibits are only possible for exact powers of two of
    # N/c, where both engines' log2 is exact — the risk is NEAR-integers
    assert lo is None or lo > MARGIN
    assert hi is None or hi > MARGIN


def test_quartile_boundary_margin(con):
    m1, m3 = con.execute(
        """
        WITH toks AS (SELECT doc_id, unnest(split(trim(text), ' ')) AS t FROM documents),
        lm AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY t),
        nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM lm),
        s AS (SELECT t, CAST(floor(1000.0 * log2(CAST(n AS DOUBLE) / c)) AS BIGINT) AS s
              FROM lm, nn),
        ds AS (SELECT doc_id, CAST(sum(s.s) AS DOUBLE) / count(*) AS score
               FROM toks JOIN s USING (t) GROUP BY doc_id),
        q AS (SELECT quantile_cont(score, 0.25) AS q1,
                     quantile_cont(score, 0.75) AS q3 FROM ds)
        SELECT min(abs(score - q1)) FILTER (score != q1),
               min(abs(score - q3)) FILTER (score != q3)
        FROM ds, q
        """
    ).fetchone()
    # scores EQUAL to the boundary are safe (identical doubles compare
    # equal in both engines); near-but-not-equal scores need the margin
    assert m1 is None or m1 > MARGIN
    assert m3 is None or m3 > MARGIN


def test_dsir_lambda_floor_margin(con):
    from mit_spark.queries import _DSIR_B as B

    lo, hi = con.execute(
        f"""
        WITH grams AS (
          SELECT lang, unnest(list_transform(ws[1 : greatest(len(ws) - 1, 0)],
                                (w, i) -> w || ' ' || ws[i + 1])) AS gram
          FROM (SELECT lang, split(trim(text), ' ') AS ws FROM documents)
        ), bkt AS (
          SELECT lang, ('0x' || substr(md5(gram), 1, 8))::BIGINT % {B} AS b FROM grams
        ), counts AS (
          SELECT b, CAST(count(*) AS BIGINT) AS rc,
                 CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS tc
          FROM bkt GROUP BY b
        ), tot AS (
          SELECT CAST(sum(rc) AS BIGINT) AS rtot, CAST(sum(tc) AS BIGINT) AS ttot
          FROM counts
        ), v AS (
          SELECT 1000.0 * log2((CAST(tc + 1 AS DOUBLE) / (ttot + {B}))
                               / (CAST(rc + 1 AS DOUBLE) / (rtot + {B}))) AS x
          FROM counts, tot
        )
        SELECT min(x - floor(x)) FILTER (x != floor(x)),
               min(ceil(x) - x) FILTER (x != ceil(x))
        FROM v
        """
    ).fetchone()
    assert lo is None or lo > MARGIN
    assert hi is None or hi > MARGIN
