"""Graph analytics over KG edge lists — PageRank.

The reference is a Knowledge Graph *Analysis* Platform; its analysis
notebooks rank and profile entities over the harvested graph
(reference analog: the jupyter component's entity-centrality workflows,
``docs/components/jupyter.md``; degree profiling is ``kg_degree`` in
``workload.py``). PageRank is the canonical centrality measure for a
web-derived KG (it was invented for one), and like connected
components (``canonicalize/connected_components.py``) it is an
iterative DataFrame algorithm — no GraphFrames dependency.

Scale design (100 TB edge list):

- Per iteration exactly three keyed shuffles: rank⋈edges on ``src``,
  the contribution ``groupBy(dst)`` (map-side partial sums), and the
  node-table left join. Nothing is ever collected except ONE scalar
  per iteration (the dangling-rank mass — the standard driver-side
  reduction every distributed PR implementation performs).
- The edge list is pre-joined with out-degrees ONCE and
  ``localCheckpoint``-ed: iterations reuse the materialized relation,
  and the checkpoint truncates the otherwise exponentially growing
  lineage (same pattern as the CC module's rounds).
- Hub skew (a page linked by millions) is absorbed by the partial
  aggregation: contributions to a hub are pre-summed per partition
  before the shuffle, so the hot key receives one row per upstream
  partition, not one per in-edge; AQE's skew-join handles the
  rank⋈edges side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED graph given as a
    (possibly directed / duplicated) edge list — ``(node, triangles)``
    for every node in at least one triangle.

    Scale design: the standard degree-ordered orientation. Each
    undirected edge is oriented from the endpoint with (degree, node)
    rank LOWER to higher, so every wedge is enumerated exactly once at
    its lowest-degree corner — the wedge join's output is bounded by
    O(E^1.5) regardless of hub skew (a k-degree hub contributes
    wedges only for the ≤√E neighbors ranked below it, never k²).
    Three shuffles total: the orientation join, the wedge self-join,
    and the closing semi-join — all keyed equi-joins AQE can re-plan."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient by (deg, node): strict total order, deterministic
    ranked = (
        und.join(deg.withColumnRenamed("node", "u")
                 .withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v")
              .withColumnRenamed("deg", "dv"), "v")
        .select(
            F.when((F.col("du") < F.col("dv"))
                   | ((F.col("du") == F.col("dv"))
                      & (F.col("u") < F.col("v"))),
                   F.struct(F.col("u").alias("a"), F.col("v").alias("b")))
            .otherwise(
                F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e"))
        .select("e.a", "e.b")
    ).localCheckpoint(eager=True)
    wedges = (
        ranked.alias("e1")
        .join(ranked.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"),
                F.col("e2.b").alias("z"))
    )
    tris = wedges.join(
        ranked.alias("e3"),
        (F.col("x") == F.col("e3.a")) & (F.col("z") == F.col("e3.b")),
    ).select("x", "y", "z")
    node = tris.selectExpr("x AS node").unionByName(
        tris.selectExpr("y AS node")).unionByName(
        tris.selectExpr("z AS node"))
    return node.groupBy("node").agg(
        F.count(F.lit(1)).alias("triangles"))


def pagerank(edges: DataFrame, iters: int = 5,
             damping: float = 0.85) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``.

    Semantics (the textbook formulation, deterministic — no sampling):
    ranks start uniform at ``1/N``;

        PR'(v) = (1-d)/N + d * ( Σ_{u→v} PR(u)/outdeg(u) + D/N )

    where ``D`` is the summed rank of dangling nodes (no out-edges),
    redistributed uniformly so total rank mass stays 1 every
    iteration. Duplicate edges contribute multiply (pre-dedup if that
    is not wanted). Returns ``(node, rank)`` for every node appearing
    as a source or target."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = edges.groupBy(F.col("src").alias("node")) \
                  .agg(F.count(F.lit(1)).alias("deg"))
    # contribution relation, materialized once and reused per round
    cedges = (
        edges.join(outdeg.withColumnRenamed("node", "src"), "src")
        .select("src", "dst", "deg")
        .localCheckpoint(eager=True)
    )
    dangling = nodes.join(outdeg, "node", "left_anti") \
                    .localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            cedges.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        d_mass = (dangling.join(ranks, "node")
                  .agg(F.sum("rank")).first()[0]) or 0.0
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit((1.0 - damping) / n)
                 + F.lit(damping)
                 * (F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.lit(d_mass / n))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
