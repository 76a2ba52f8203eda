"""Independent second gates for the round-5 sketch/graph/tokenizer entries
(cardinality_kmv_sketch, pagerank_dup_graph, bpe_merge_candidates).

Each test re-derives the expected answer with a pure-Python reference
implementation (collections.Counter / dict arithmetic) rather than SQL, so
a bug shared by the Spark plan and its DuckDB oracle (e.g. a common
misreading of the estimator or the iteration order) would still be caught.
"""

import collections
import hashlib

import duckdb

SF = "/root/testdata/sf0.001"


def _texts():
    rows = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet' ORDER BY source"
    ).fetchall()
    return rows


# ---------------------------------------------------------------------------
# cardinality_kmv_sketch


def test_kmv_matches_pure_python_estimator(spark):
    import mit_spark.queries as Q

    got = {
        r["source"]: (r["exact_distinct"], r["kmv_est"], r["abs_err"])
        for r in Q.cardinality_kmv_sketch(spark, SF).collect()
    }
    shingles = collections.defaultdict(set)
    for source, text in _texts():
        ws = text.strip().split(" ")
        for i in range(len(ws) - 2):
            shingles[source].add(" ".join(ws[i : i + 3]))
    assert set(got) == set(shingles)
    for source, ss in shingles.items():
        hs = sorted(
            int(hashlib.md5(s.encode()).hexdigest()[:12], 16) for s in ss
        )
        exact = len(ss)
        if exact < Q._KMV_K:
            est = exact
        else:
            est = Q._KMV_NUM // hs[Q._KMV_K - 1]
        assert got[source] == (exact, est, abs(est - exact))


def test_kmv_exact_branch_and_error_bound(spark):
    """Structural properties: when the group has fewer than K distinct
    values the sketch IS exact; otherwise the estimate should land within
    the loose 4/sqrt(K) = 50% relative-error envelope (KMV's std error is
    ~1/sqrt(K-2) ~= 12.7% at K=64; 4 sigma gives a non-flaky bound)."""
    import mit_spark.queries as Q

    rows = Q.cardinality_kmv_sketch(spark, "/root/testdata/sf0.01").collect()
    assert rows, "no sources"
    for r in rows:
        if r["exact_distinct"] < Q._KMV_K:
            assert r["kmv_est"] == r["exact_distinct"]
        else:
            assert r["abs_err"] / r["exact_distinct"] < 0.5, r


# ---------------------------------------------------------------------------
# heavy_hitters_cms


def test_cms_matches_pure_python_sketch(spark):
    import mit_spark.queries as Q

    exact = collections.Counter()
    for _source, text in _texts():
        ws = text.strip().split(" ")
        for i in range(len(ws) - 2):
            exact[" ".join(ws[i : i + 3])] += 1

    def bucket(j, s):
        return int(hashlib.md5(f"{j} {s}".encode()).hexdigest()[:8], 16) % Q._CMS_W

    counters = collections.Counter()
    for s, c in exact.items():
        for j in range(Q._CMS_D):
            counters[(j, bucket(j, s))] += c
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[: Q._CMS_TOPK]
    expected = []
    for rank, (s, c) in enumerate(top, start=1):
        est = min(counters[(j, bucket(j, s))] for j in range(Q._CMS_D))
        expected.append((rank, s, c, est, est - c))
    got = [
        (r["hh_rank"], r["shingle"], r["exact_count"], r["cms_est"], r["overestimate"])
        for r in Q.heavy_hitters_cms(spark, SF).collect()
    ]
    assert got == expected


def test_cms_one_sided_error(spark):
    """CMS never underestimates: counters only ever ADD colliding mass."""
    import mit_spark.queries as Q

    rows = Q.heavy_hitters_cms(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == Q._CMS_TOPK
    for r in rows:
        assert r["cms_est"] >= r["exact_count"]
        assert r["overestimate"] == r["cms_est"] - r["exact_count"]


# ---------------------------------------------------------------------------
# cluster_purity_eval


def test_cluster_purity_invariants(spark):
    """Members partition the embeddings table; the majority is a real
    plurality; purity is the exact count ratio."""
    import mit_spark.queries as Q

    rows = Q.cluster_purity_eval(spark, SF).collect()
    n_emb = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'"
    ).fetchone()[0]
    assert sum(r["n_members"] for r in rows) == n_emb
    for r in rows:
        assert 0 < r["n_majority"] <= r["n_members"]
        assert abs(r["purity"] - round(r["n_majority"] / r["n_members"], 6)) < 1e-12


# ---------------------------------------------------------------------------
# bpe_merge_candidates


def test_bpe_matches_pure_python_counter(spark):
    import mit_spark.queries as Q

    vocab = collections.Counter()
    for _source, text in _texts():
        for w in text.strip().split(" "):
            if len(w) >= 2:
                vocab[w] += 1
    pair_counts = collections.Counter()
    for w, cnt in vocab.items():
        for i in range(len(w) - 1):
            pair_counts[w[i : i + 2]] += cnt
    expected = sorted(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = [
        (rank + 1, pair, cnt) for rank, (pair, cnt) in enumerate(expected)
    ][: Q._BPE_TOPK]
    got = [
        (r["merge_rank"], r["pair"], r["pair_count"])
        for r in Q.bpe_merge_candidates(spark, SF).collect()
    ]
    assert got == expected


# ---------------------------------------------------------------------------
# pagerank_dup_graph


def _python_pagerank(pairs, iters, scale, base):
    adj = collections.defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    r = {v: scale for v in adj}
    deg = {v: len(ns) for v, ns in adj.items()}
    for _ in range(iters):
        recv = collections.defaultdict(int)
        for v, ns in adj.items():
            c = r[v] // deg[v]
            for n in ns:
                recv[n] += c
        r = {v: base + (85 * recv[v]) // 100 for v in adj}
    return r, deg


def test_pagerank_matches_pure_python_iteration(spark):
    """The graph itself comes from minhash_verified_dups (separately
    oracle-gated); this test independently re-runs the integer power
    iteration in plain Python dicts and demands bit-equality."""
    import mit_spark.queries as Q

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in Q.minhash_verified_dups(spark, SF).select("doc_a", "doc_b").collect()
    ]
    assert pairs, "verified-dup graph is empty at sf0.001"
    expect_r, expect_deg = _python_pagerank(
        pairs, Q._PR_ITERS, Q._PR_SCALE, Q._PR_BASE
    )
    got = Q.pagerank_dup_graph(spark, SF).collect()
    assert {r["doc_id"] for r in got} == set(expect_r)
    for row in got:
        assert row["degree"] == expect_deg[row["doc_id"]]
        assert row["pr"] == expect_r[row["doc_id"]]


def test_pagerank_rank_bounds(spark):
    """Every node's rank stays within [BASE, BASE + 0.85 * total mass]:
    the damped update can never drop below the teleport floor, and integer
    floor-divisions only ever lose mass."""
    import mit_spark.queries as Q

    rows = Q.pagerank_dup_graph(spark, SF).collect()
    n = len(rows)
    total = sum(r["pr"] for r in rows)
    for r in rows:
        assert r["pr"] >= Q._PR_BASE
    assert total <= n * Q._PR_SCALE  # floor divisions are lossy, never creative


def test_lsh_band_sweep_nested_candidates(spark):
    """The observable consequences of the docstring's nestedness claim
    (a pair matching an r-lane concatenated band matches every constituent
    lane, so the candidate sets form a chain 1x6 <= 2x3 <= 3x2 <= 6x1):
    candidate counts AND recall_vs_finest must both be monotone in
    n_bands, and the finest config's recall must be exactly 1."""
    import mit_spark.queries as Q

    rows = {r["n_bands"]: r for r in Q.lsh_band_sweep(spark, SF).collect()}
    assert set(rows) == {1, 2, 3, 6}
    # counts must be monotone in n_bands (necessary condition of nesting)
    assert (
        rows[1]["n_candidates"]
        <= rows[2]["n_candidates"]
        <= rows[3]["n_candidates"]
        <= rows[6]["n_candidates"]
    )
    assert rows[6]["recall_vs_finest"] == 1.0
    assert (
        rows[1]["recall_vs_finest"]
        <= rows[2]["recall_vs_finest"]
        <= rows[3]["recall_vs_finest"]
        <= rows[6]["recall_vs_finest"]
    )


def test_hard_negative_mining_contract(spark):
    """Per query: exactly k negatives, none sharing the query's kmeans
    cluster, ranked by ascending distance with rank 1..k dense."""
    import mit_spark.queries as Q

    rows = Q.hard_negative_mining(spark, SF).collect()
    by_q: dict = {}
    for r in rows:
        assert r["n_cluster"] != r["q_cluster"], "negative shares the query cluster"
        by_q.setdefault(r["q_id"], []).append(r)
    assert len(by_q) == Q._RECALL_N_QUERIES
    for q_id, rs in by_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, Q._RECALL_K + 1))
        ordered = sorted(rs, key=lambda x: x["rank"])
        dists = [x["d2"] for x in ordered]
        assert dists == sorted(dists), "ranks not ascending in distance"


# ---------------------------------------------------------------------------
# cardinality_hll_sketch


def test_hll_matches_pure_python_sketch(spark):
    import mit_spark.queries as Q

    got = {
        r["source"]: (
            r["exact_distinct"],
            r["hll_est"],
            r["abs_err"],
            r["empty_buckets"],
        )
        for r in Q.cardinality_hll_sketch(spark, SF).collect()
    }
    stream = collections.defaultdict(list)  # raw stream, duplicates included
    for source, text in _texts():
        ws = text.strip().split(" ")
        for i in range(len(ws) - 2):
            stream[source].append(" ".join(ws[i : i + 3]))
    assert set(got) == set(stream)
    for source, ss in stream.items():
        regs = [0] * Q._HLL_M
        for s in ss:
            h = int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
            b, v = h % Q._HLL_M, h // Q._HLL_M
            rho = Q._HLL_RHO_MAX if v == 0 else (v & -v).bit_length()
            regs[b] = max(regs[b], rho)
        scaled = sum(1 << (Q._HLL_CAP - min(r, Q._HLL_CAP)) for r in regs)
        est = Q._HLL_NUM // (1000 * scaled)
        exact = len(set(ss))
        empty = sum(1 for r in regs if r == 0)
        assert got[source] == (exact, est, abs(est - exact), empty)


def test_hll_error_bound_when_registers_full(spark):
    """Raw-HLL sanity at the operating point: with no empty registers the
    m=64 estimator's standard error is ~13%, so 50% relative error is a
    loose 3-sigma-plus gate (failure means a broken register build, not
    sketch noise)."""
    import mit_spark.queries as Q

    rows = Q.cardinality_hll_sketch(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        if r["empty_buckets"] == 0 and r["exact_distinct"] > 1000:
            assert r["abs_err"] < 0.5 * r["exact_distinct"]
