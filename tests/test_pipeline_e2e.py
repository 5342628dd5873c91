"""Golden end-to-end: fixture web_pages → pipeline → triple P/R ≥ 0.95
(BASELINE.json gate; exact match expected at fixture scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgap_spark.metrics import precision_recall
from kgap_spark.triples import build_triples


def test_pipeline_matches_golden(spark, tiny):
    got = build_triples(tiny["web_pages"], tiny["alias_dict"])
    pr = precision_recall(got, tiny["golden_triples"])
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr
    # fixture-scale expectation: exact
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0, pr


def test_pipeline_quads_match_golden_graphs(spark, tiny):
    """graph + obj_lang columns must also agree (quad-level check)."""
    key = ["subj", "pred", "obj", "graph"]
    got = build_triples(tiny["web_pages"], tiny["alias_dict"]).select(*key).distinct()
    ref = tiny["golden_triples"].select(*key).distinct()
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_labels_carry_language_tags(spark, tiny):
    got = build_triples(tiny["web_pages"], tiny["alias_dict"])
    labels = got.filter(F.col("pred") == "rdfs:label")
    assert labels.filter(F.col("obj_lang").isNull()).count() == 0
    langs = {r.obj_lang for r in labels.select("obj_lang").distinct().collect()}
    assert langs == {"en", "nl", "de"}
