"""Assertion validation ops (SURVEY §2.9 U5, advanced-topics.md:104-141)
on a hand-built triple set with known violations."""

from __future__ import annotations

from kgap_spark.validate import (
    Assertion,
    cardinality_violations,
    required_property_violations,
    type_membership_violations,
    validate,
    value_range_violations,
)

ROWS = [
    # entity 1: complete observation
    ("e1", "rdf:type", "sosa:Observation"),
    ("e1", "sosa:hasResult", "r1"),
    ("e1", "qudt:numericValue", "23.5"),
    # entity 2: missing hasResult, value out of range
    ("e2", "rdf:type", "sosa:Observation"),
    ("e2", "qudt:numericValue", "250.0"),
    # entity 3: two results (cardinality violation), bad type object
    ("e3", "rdf:type", "sosa:Observation"),
    ("e3", "rdf:type", "ex:Bogus"),
    ("e3", "sosa:hasResult", "r2"),
    ("e3", "sosa:hasResult", "r3"),
    ("e3", "qudt:numericValue", "not-a-number"),
]


def _triples(spark):
    return spark.createDataFrame(ROWS, "subj string, pred string, obj string")


def test_required_property(spark):
    t = _triples(spark)
    v = required_property_violations(
        t, Assertion("required", "sosa:hasResult", focus_type="sosa:Observation")
    )
    assert {r.entity for r in v.collect()} == {"e2"}


def test_cardinality(spark):
    t = _triples(spark)
    v = cardinality_violations(
        t,
        Assertion("cardinality", "sosa:hasResult",
                  focus_type="sosa:Observation", min_count=1, max_count=1),
    )
    assert {r.entity for r in v.collect()} == {"e2", "e3"}


def test_value_range(spark):
    t = _triples(spark)
    v = value_range_violations(
        t, Assertion("range", "qudt:numericValue", min_value=0, max_value=100)
    )
    # e2 out of range; e3 non-numeric (cast → null → violation)
    assert {r.entity for r in v.collect()} == {"e2", "e3"}


def test_type_membership(spark):
    t = _triples(spark)
    v = type_membership_violations(
        t, Assertion("type_in", "rdf:type", values=("sosa:Observation",))
    )
    assert {r.entity for r in v.collect()} == {"e3"}


def test_validate_union(spark):
    t = _triples(spark)
    v = validate(
        t,
        [
            Assertion("required", "sosa:hasResult", focus_type="sosa:Observation"),
            Assertion("range", "qudt:numericValue", min_value=0, max_value=100),
        ],
    )
    assert v.count() == 3  # e2 (required) + e2, e3 (range)
