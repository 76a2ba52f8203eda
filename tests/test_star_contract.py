"""Direct tests of the star-contraction core (`queries._star_contract`)
on graphs the staged dedup pair list never produces.

The registry entry `dedup_clusters_logrounds` is oracle-gated and
cross-checked row-equal against the O(d) propagation entry, but the real
pair graph contracts in ~2 rounds — these tests drive the MULTI-ROUND path
(a 65-node path graph has diameter 64, forcing several large/small-star
alternations) and fuzz random graphs against a pure-python union-find
oracle, so the 3-shuffle round rewrite (no per-round canon_set, no
large_star distinct) is exercised where its invariants actually matter.
"""

from __future__ import annotations

import random

import pytest


def _uf_labels(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {n: n for n in n_nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min node id in the component
    return {n: find(n) for n in n_nodes}


def _run(spark, nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    from mit_spark.queries import _star_contract

    E = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)], "u long, v long"
    ).filter("u != v")
    N = spark.createDataFrame([(int(n),) for n in nodes], "n long")
    out = _star_contract(E, N)
    return {r["n"]: r["label"] for r in out.collect()}


def test_path_graph_many_rounds(spark):
    # a 65-node path: diameter 64 — min-label propagation would need ~64
    # rounds; star contraction must finish inside the 15-round cap, which
    # only holds if the alternation actually contracts (log2 64 = 6)
    nodes = list(range(65))
    edges = [(i, i + 1) for i in range(64)]
    got = _run(spark, nodes, edges)
    assert got == {n: 0 for n in nodes}


def test_two_paths_and_isolated_nodes(spark):
    # two disjoint paths labelled by their min ids + isolated nodes that
    # must label themselves through the left join
    edges = [(i, i + 1) for i in range(10, 20)] + [(i, i + 1) for i in range(40, 45)]
    nodes = list(range(10, 21)) + list(range(40, 46)) + [100, 200]
    got = _run(spark, nodes, edges)
    want = {n: 10 for n in range(10, 21)}
    want |= {n: 40 for n in range(40, 46)}
    want |= {100: 100, 200: 200}
    assert got == want


def test_duplicate_and_reversed_edges(spark):
    # duplicates and both orientations — the rewrite relies on small_star
    # tolerating duplicate large_star output, so feed duplicates at the seed
    edges = [(1, 2), (2, 1), (1, 2), (3, 2), (2, 3), (5, 4)]
    nodes = [1, 2, 3, 4, 5]
    got = _run(spark, nodes, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = sorted(rng.sample(range(1000), 60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(rng.randint(20, 80))
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, nodes, edges)
    assert got == _uf_labels(nodes, edges)
