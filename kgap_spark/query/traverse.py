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
        ).distinct()  # the same fact in two named graphs is ONE edge
        # (without this, assemble_documents' collect_list doubles values)
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


def _json_str(col_name: str):
    """JSON-encode a string column (quotes + escapes) natively: to_json
    of a 1-element array, shorn of its brackets."""
    return F.expr(
        f"substring(to_json(array({col_name})), 2, "
        f"length(to_json(array({col_name}))) - 2)"
    )


def assemble_documents(edges: DataFrame, max_depth: int | None = None) -> DataFrame:
    """Edge set from ``recursive_dereference`` → nested JSON documents.

    The reference's ``recursive_dereference`` returns a nested dict per
    URI with list-valued properties (docs/advanced-topics.md:257-277):
    ``{pred: [leaf or nested-doc, ...]}``. Here the assembly runs
    bottom-up, one groupBy pass per depth level (deepest first): a
    level's objects are replaced by their already-assembled child
    documents via a join, then folded into ``{pred: [...]}`` JSON with
    native collect_list/concat — no driver recursion, no Python UDF.

    Returns (node, doc) for every node that was expanded; filter to the
    start nodes for the reference's per-URI result. Values inside
    arrays are sorted for deterministic output.
    """
    if max_depth is None:
        max_depth = edges.agg(F.max("depth")).first()[0] or 1

    docs: DataFrame | None = None  # (node, doc) for deeper levels
    for d in range(max_depth, 0, -1):
        layer = edges.filter(F.col("depth") == d)
        if docs is not None:
            child = docs.select(
                F.col("node").alias("_cn"), F.col("doc").alias("_cdoc")
            )
            layer = layer.join(child, layer["node"] == child["_cn"], "left").drop(
                "_cn"
            )
        else:
            layer = layer.withColumn("_cdoc", F.lit(None).cast("string"))
        frag = F.coalesce(F.col("_cdoc"), _json_str("node"))
        per_pred = layer.groupBy("src", "pred").agg(
            F.concat(
                F.lit("["),
                F.concat_ws(",", F.sort_array(F.collect_list(frag))),
                F.lit("]"),
            ).alias("arr")
        )
        level_docs = (
            per_pred.groupBy("src")
            .agg(
                F.concat(
                    F.lit("{"),
                    F.concat_ws(
                        ",",
                        F.sort_array(
                            F.collect_list(
                                F.concat(_json_str("pred"), F.lit(":"), F.col("arr"))
                            )
                        ),
                    ),
                    F.lit("}"),
                ).alias("doc")
            )
            .select(F.col("src").alias("node"), "doc")
        )
        docs = level_docs if docs is None else level_docs.unionByName(docs)
    # a node is expanded at exactly one depth (visited-set guarantee),
    # but guard against arbitrary caller-supplied edge sets
    return docs.dropDuplicates(["node"])
