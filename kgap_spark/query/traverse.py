"""Iterative URI dereferencing — frontier joins with a visited set.

k-gap's notebooks follow object URIs N levels deep with an explicit
cycle-guard set (reference: ``docs/advanced-topics.md:226-277``,
``recursive_dereference(uri, depth, visited)``) — but do it row-at-a-
time over HTTP. Here the whole frontier advances in one join per hop:

    frontier(N) ⋈ triples on frontier.node == triples.subj
    minus already-visited nodes (anti join)

which is the same skeleton as connected-components (SURVEY §2.4 J7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recursive_dereference(
    triples: DataFrame,
    start: DataFrame,
    max_depth: int = 2,
    uri_only: bool = True,
) -> DataFrame:
    """start(node) → all (src, pred, node, depth) edges reachable in
    ≤ max_depth hops following subj→obj.

    ``uri_only`` mirrors the reference's ``obj.startswith('http')``
    guard (docs/advanced-topics.md:264): only URI-shaped objects are
    followed (literals are leaves).
    """
    frontier = start.select(F.col(start.columns[0]).alias("node")).distinct()
    visited = frontier
    out: DataFrame | None = None

    for depth in range(1, max_depth + 1):
        hop = frontier.join(
            triples, frontier["node"] == triples["subj"], "inner"
        ).select(
            F.col("subj").alias("src"),
            "pred",
            F.col("obj").alias("node"),
            F.lit(depth).alias("depth"),
        )
        out = hop if out is None else out.unionByName(hop)
        nxt = hop.select("node").distinct()
        if uri_only:
            nxt = nxt.filter(
                F.col("node").startswith("http") | F.col("node").startswith("urn:")
            )
        frontier = nxt.join(visited, "node", "left_anti").localCheckpoint(eager=True)
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
        if frontier.limit(1).count() == 0:
            break
    return out
