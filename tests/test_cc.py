"""Connected-components canonicalization: convergence, chains, skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgap_spark.canonicalize import (
    canonical_mapping,
    connected_components,
    duplicate_edges,
)


def test_cc_chain_and_isolated(spark):
    """A 5-node chain + a disjoint pair + an isolated self-contained
    component — label propagation must converge to min-id labels."""
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("c", "d"), ("d", "e"),  # chain a-b-c-d-e
         ("x", "y")],
        "src string, dst string",
    )
    comps = {r.node: r.component for r in connected_components(edges).collect()}
    assert all(comps[n] == "a" for n in "abcde")
    assert comps["x"] == "y" or comps["x"] == "x"
    assert comps["x"] == comps["y"] == min("xy")


def test_cc_hub_skew_star(spark):
    """A 500-spoke star (hub skew shape): one round must label every
    spoke with the hub-min id; the salted aggregation path handles the
    hot node."""
    edges = spark.createDataFrame(
        [("hub", f"spoke{i:04d}") for i in range(500)], "src string, dst string"
    )
    comps = connected_components(edges, salt=4)
    assert comps.select("component").distinct().count() == 1
    assert comps.count() == 501


def test_duplicate_edges_rule(spark):
    """≥2 shared (alias, lang) forms → edge; exactly 1 → no edge."""
    alias = spark.createDataFrame(
        [
            ("n1", "e1", "en", 0.9, True), ("n1", "e2", "en", 0.7, True),
            ("n2", "e1", "en", 0.9, False), ("n2", "e2", "en", 0.7, False),
            ("amb", "e3", "*", 0.5, False), ("amb", "e4", "*", 0.4, False),
        ],
        "alias string, entity_id string, lang string, prior double, is_label boolean",
    )
    edges = {(r.src, r.dst) for r in duplicate_edges(alias).collect()}
    assert edges == {("e1", "e2")}


def test_canonical_mapping_matches_fixture_rule(spark, tiny):
    """Pipeline CC over the fixture dictionary == the fixture's own
    union-find result, entity for entity."""
    from kgap_spark.fixtures import FixtureConfig, alias_rows, canonical_map

    cfg = FixtureConfig.for_scale("tiny")
    expected = canonical_map(alias_rows(cfg))
    got = {
        r.entity_id: r.canonical_id
        for r in canonical_mapping(tiny["alias_dict"]).collect()
    }
    assert got == expected


def test_star_cc_matches_label_propagation(spark):
    """large-star/small-star must produce the same components as
    min-label propagation on a mixed graph (clusters + bridges)."""
    from kgap_spark.canonicalize.connected_components import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "g"), ("g", "h"),
         ("h", "a")],  # {a,b,c,f,g,h} and {d,e}
        "src string, dst string",
    )
    lp = {r.node: r.component for r in
          connected_components(edges, num_partitions=2).collect()}
    star = {r.node: r.component for r in
            connected_components_star(edges, num_partitions=2).collect()}
    assert star == lp
    assert star["h"] == "a" and star["e"] == "d"


def test_star_cc_deep_chain(spark):
    """A 64-node path (diameter 63): the O(log² n) star algorithm must
    resolve it — this is the case label propagation needs ~diameter
    rounds for."""
    from kgap_spark.canonicalize.connected_components import (
        connected_components_star,
    )

    n = 64
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n - 1)],
        "src string, dst string",
    )
    comps = {r.node: r.component for r in
             connected_components_star(edges, num_partitions=2).collect()}
    assert len(comps) == n
    assert set(comps.values()) == {"n000"}


def test_canonical_mapping_star_algorithm_agrees(spark, tiny):
    """canonical_mapping(algorithm='star') must produce the same
    entity→canonical map as the default label propagation."""
    from kgap_spark.canonicalize.connected_components import canonical_mapping

    lab = {r.entity_id: r.canonical_id for r in
           canonical_mapping(tiny["alias_dict"], num_partitions=2).collect()}
    star = {r.entity_id: r.canonical_id for r in
            canonical_mapping(tiny["alias_dict"], algorithm="star",
                              num_partitions=2).collect()}
    assert lab == star
