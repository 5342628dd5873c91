"""Query-pattern library (SURVEY §2 SPARQL analogs) against the tiny
fixture triples, with hand-computable expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgap_spark.query import (
    QueryTemplates,
    Var,
    bgp,
    conflicting_types,
    counts_by_graph,
    entities_without_label,
    not_exists,
    optional_pattern,
    recursive_dereference,
    type_distribution,
)
from kgap_spark.triples import build_triples


def _triples(spark, tiny):
    return build_triples(tiny["web_pages"], tiny["alias_dict"]).cache()


def test_counts_by_graph_totals(spark, tiny):
    t = _triples(spark, tiny)
    per_graph = counts_by_graph(t)
    assert per_graph.agg(F.sum("n_triples")).first()[0] == t.count()
    # one row per site graph + the dict graph
    n_sites = tiny["web_pages"].select(
        F.regexp_extract("url", r"https://([^.]+)\.", 1)
    ).distinct().count()
    assert per_graph.count() == n_sites + 1


def test_bgp_two_pattern_join(spark, tiny):
    """pages of type WebPage that mention some entity — a 2-pattern BGP
    joined on ?page."""
    t = _triples(spark, tiny)
    res = bgp(
        t,
        [
            (Var("page"), "rdf:type", "kgap:WebPage"),
            (Var("page"), "kgap:mentions", Var("ent")),
        ],
    )
    direct = t.filter(F.col("pred") == "kgap:mentions").select(
        F.col("subj").alias("page"), F.col("obj").alias("ent")
    )
    assert res.exceptAll(direct).count() == 0
    assert direct.exceptAll(res).count() == 0


def test_bgp_subject_object_chase(spark, tiny):
    """?page mentions ?ent . ?ent rdfs:label ?label — J2 path join."""
    t = _triples(spark, tiny)
    res = bgp(
        t,
        [
            (Var("page"), "kgap:mentions", Var("ent")),
            (Var("ent"), "rdfs:label", Var("label")),
        ],
    )
    # every mentioned entity is canonical and has exactly 3 labels
    per_pair = res.groupBy("page", "ent").count()
    assert per_pair.filter(F.col("count") != 3).count() == 0


def test_optional_and_not_exists(spark, tiny):
    t = _triples(spark, tiny)
    pages = bgp(t, [(Var("page"), "rdf:type", "kgap:WebPage")])
    with_m = optional_pattern(pages, t, (Var("page"), "kgap:mentions", Var("ent")))
    # left join keeps pages with no mentions (the empty-html pages)
    assert with_m.filter(F.col("ent").isNull()).count() > 0
    no_m = not_exists(pages, t, (Var("page"), "kgap:mentions", Var("ent")))
    assert no_m.count() == with_m.filter(F.col("ent").isNull()).count()


def test_entities_without_label_and_conflicts(spark, tiny):
    t = _triples(spark, tiny)
    nolabel = entities_without_label(t)
    # pages (urls) have no labels; canonical entities all have labels
    assert nolabel.filter(F.col("entity").startswith("https://")).count() > 0
    labeled_ents = t.filter(F.col("pred") == "rdfs:label").select("subj").distinct()
    assert nolabel.join(labeled_ents, nolabel["entity"] == labeled_ents["subj"]).count() == 0
    # each page has exactly one type → no conflicts
    assert conflicting_types(t).count() == 0


def test_type_distribution_topk(spark, tiny):
    t = _triples(spark, tiny)
    top = type_distribution(t, k=5)
    rows = top.collect()
    assert rows[0].type == "kgap:WebPage"
    assert rows[0].n == tiny["web_pages"].count()


def test_templates_execute_to_df(spark, tiny):
    t = _triples(spark, tiny)
    t.createOrReplaceTempView("triples_v")
    qt = QueryTemplates(spark)
    total = qt.execute_to_df("count_all", table="triples_v").first()["count"]
    assert total == t.count()
    per_graph = qt.execute_to_df("counts_by_graph", table="triples_v")
    assert per_graph.count() == counts_by_graph(t).count()
    import pytest

    with pytest.raises(ValueError):
        qt.generate_sql("count_all", table="triples_v; DROP TABLE x")


def test_recursive_dereference_depths(spark, tiny):
    """page → mentions → entity → labels: 2-hop traversal reaches
    entity labels at depth 2."""
    t = _triples(spark, tiny)
    start = t.filter(F.col("pred") == "rdf:type").select("subj").distinct().limit(5)
    edges = recursive_dereference(t, start, max_depth=2)
    d1 = edges.filter(F.col("depth") == 1)
    d2 = edges.filter(F.col("depth") == 2)
    assert d1.count() > 0 and d2.count() > 0
    # depth-2 edges start from entities reached at depth 1 (urn: nodes)
    assert d2.filter(~F.col("src").startswith("urn:")).count() == 0


def test_assemble_documents_nested(spark):
    """Nested-dict assembly (advanced-topics.md:257-277): 2-hop edges
    fold into {pred: [leaf | nested-doc]} JSON, bottom-up."""
    import json

    from kgap_spark.query.traverse import assemble_documents, recursive_dereference

    triples = spark.createDataFrame(
        [
            ("urn:a", "knows", "urn:b", None, None, "g", None),
            ("urn:a", "name", "Alice", None, None, "g", None),
            ("urn:b", "name", "Bob", None, None, "g", None),
            ("urn:b", "likes", "cake", None, None, "g", None),
            ("urn:b", "likes", "tea", None, None, "g", None),
        ],
        "subj string, pred string, obj string, obj_lang string, "
        "obj_datatype string, graph string, src_url string",
    )
    start = spark.createDataFrame([("urn:a",)], "node string")
    edges = recursive_dereference(triples, start, max_depth=2)
    docs = {r.node: json.loads(r.doc) for r in assemble_documents(edges).collect()}
    assert docs["urn:a"]["name"] == ["Alice"]
    assert docs["urn:a"]["knows"] == [{"likes": ["cake", "tea"], "name": ["Bob"]}]


def test_describe_and_graph_diff(spark):
    from kgap_spark.query.patterns import describe, graph_diff

    triples = spark.createDataFrame(
        [
            ("urn:a", "p", "urn:b", None, None, "g1", None),
            ("urn:a", "q", "lit", None, None, "g1", None),
            ("urn:b", "r", "urn:c", None, None, "g1", None),
            ("urn:x", "p", "urn:a", None, None, "g1", None),
            # g2 = next harvest: one triple dropped, one added
            ("urn:a", "p", "urn:b", None, None, "g2", None),
            ("urn:a", "q", "lit2", None, None, "g2", None),
        ],
        "subj string, pred string, obj string, obj_lang string, "
        "obj_datatype string, graph string, src_url string",
    )
    d1 = describe(triples, "urn:a")
    assert d1.count() == 5  # 4 as subject across graphs + 1 incoming
    got = {(r.subj, r.pred, r.obj) for r in d1.collect()}
    assert ("urn:x", "p", "urn:a") in got
    d2 = describe(triples, "urn:a", hops=2)
    assert ("urn:b", "r", "urn:c") in {(r.subj, r.pred, r.obj)
                                       for r in d2.collect()}

    diff = {(r.change, r.subj, r.pred, r.obj)
            for r in graph_diff(triples, "g1", "g2").collect()}
    assert ("added", "urn:a", "q", "lit2") in diff
    assert ("removed", "urn:a", "q", "lit") in diff
    assert ("removed", "urn:b", "r", "urn:c") in diff
    assert not any(c == "added" and o == "urn:b" for c, s, p, o in diff)


def test_construct_template_instantiation(spark):
    """CONSTRUCT: a 2-pattern BGP rewritten into new triples (grandparent
    derivation), constants and variables mixed in the template."""
    from kgap_spark.query.patterns import Var, construct

    triples = spark.createDataFrame(
        [("urn:a", "parent", "urn:b", None, None, "g", None),
         ("urn:b", "parent", "urn:c", None, None, "g", None),
         ("urn:x", "parent", "urn:y", None, None, "g", None)],
        "subj string, pred string, obj string, obj_lang string, "
        "obj_datatype string, graph string, src_url string",
    )
    out = construct(
        triples,
        where=[(Var("gp"), "parent", Var("p")), (Var("p"), "parent", Var("c"))],
        template=[(Var("gp"), "grandparent", Var("c")),
                  (Var("c"), "rdf:type", "Grandchild")],
        out_graph="urn:derived",
    )
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert rows == {("urn:a", "grandparent", "urn:c"),
                    ("urn:c", "rdf:type", "Grandchild")}
    assert {r.graph for r in out.collect()} == {"urn:derived"}
    assert out.columns[:3] == ["subj", "pred", "obj"]  # TRIPLES shape
