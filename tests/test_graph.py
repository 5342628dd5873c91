"""PageRank over edge lists (kgap_spark/graph.py) — hand-computable
cases plus an exact differential check against a numpy power
iteration of the same formulation."""

from __future__ import annotations

import pytest

from kgap_spark.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _ranks(df) -> dict[str, float]:
    return {r.node: r.rank for r in df.collect()}


def test_pagerank_two_cycle_is_uniform(spark):
    """A↔B: perfectly symmetric, every iteration keeps 1/2 each."""
    r = _ranks(pagerank(_edges(spark, [("a", "b"), ("b", "a")]), iters=4))
    assert r == pytest.approx({"a": 0.5, "b": 0.5})


def test_pagerank_mass_conserved_with_dangling(spark):
    """b has no out-edges: its rank redistributes uniformly, so the
    total mass stays exactly 1 every iteration."""
    r = _ranks(pagerank(_edges(spark, [("a", "b"), ("c", "b")]), iters=5))
    assert sum(r.values()) == pytest.approx(1.0)
    assert r["b"] > r["a"] == pytest.approx(r["c"])


def test_pagerank_hub_ranks_highest(spark):
    # bidirectional star (one-way stars oscillate with period 2 and
    # need ~15 damped iterations to settle — not what this test pins)
    pairs = ([(f"s{i}", "hub") for i in range(8)]
             + [("hub", f"s{i}") for i in range(8)])
    r = _ranks(pagerank(_edges(spark, pairs), iters=10))
    assert max(r, key=r.get) == "hub"
    assert sum(r.values()) == pytest.approx(1.0)


def test_pagerank_matches_numpy_power_iteration(spark):
    """Exact agreement (1e-12) with an independent dense power
    iteration of the same formulation on a fixed 7-node graph with a
    cycle, a hub, a dangling node, and a multi-edge."""
    import numpy as np

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
             ("d", "a"), ("d", "c"), ("e", "d"), ("f", "d"),
             ("f", "d"),             # duplicate edge counts twice
             ("a", "g")]             # g dangles
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n, d, iters = len(nodes), 0.85, 6

    M = np.zeros((n, n))
    for s, t in pairs:
        M[idx[t], idx[s]] += 1.0
    outdeg = M.sum(axis=0)
    dangling = outdeg == 0
    # out= is REQUIRED with where=: unselected entries are otherwise
    # left uninitialized (this flaked as NaN, not a pagerank bug)
    M = np.divide(M, outdeg, out=np.zeros_like(M), where=outdeg > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - d) / n + d * (M @ r + r[dangling].sum() / n)

    got = _ranks(pagerank(_edges(spark, pairs), iters=iters))
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0)


def test_pagerank_validates_iters(spark):
    with pytest.raises(ValueError, match="iters"):
        pagerank(_edges(spark, [("a", "b")]), iters=0)


def test_triangle_counts_matches_bruteforce(spark):
    """Degree-ordered enumeration agrees exactly with an itertools
    brute force over a fixed graph (two overlapping cliques, a
    pendant, duplicate/reversed/self edges)."""
    from itertools import combinations

    from kgap_spark.graph import triangle_counts

    pairs = [("a", "b"), ("b", "c"), ("c", "a"),          # K3
             ("c", "d"), ("d", "e"), ("e", "c"),          # K3 sharing c
             ("d", "c"), ("x", "a"),                      # dup + pendant
             ("e", "e")]                                  # self loop
    adj: dict[str, set] = {}
    und = set()
    for s, t in pairs:
        if s != t:
            und.add((min(s, t), max(s, t)))
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expected: dict[str, int] = {}
    for trio in combinations(sorted(adj), 3):
        a, b, c = trio
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in trio:
                expected[n] = expected.get(n, 0) + 1

    got = {r.node: r.triangles
           for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert got == expected == {"a": 1, "b": 1, "c": 2, "d": 1, "e": 1}


def test_triangle_counts_clique(spark):
    """K5: every node sits in C(4,2)=6 triangles."""
    from itertools import combinations

    from kgap_spark.graph import triangle_counts

    nodes = [f"n{i}" for i in range(5)]
    pairs = list(combinations(nodes, 2))
    got = {r.node: r.triangles
           for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert got == {n: 6 for n in nodes}
