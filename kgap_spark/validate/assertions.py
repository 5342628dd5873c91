"""Data-validation assertions → violation DataFrames.

k-gap validates harvested data two ways: SHACL shapes applied per feed
at ingest (reference: ``ldes-consumer/app.py:344``,
``data/ldes-feeds-example.yml:21``) and sembench assertion workflows —
required property, type membership, cardinality, value range
(``docs/advanced-topics.md:104-141``; validation query shape
``docs/components/sembench.md:163-190``). Here each assertion is a
DataFrame expression producing a *violations table*; a partition commit
can be gated on it being empty (SURVEY §2.9 U5).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Assertion:
    """One assertion over entities of a focus type (the YAML-config IR
    of docs/advanced-topics.md:104-141)."""

    kind: str                       # required | cardinality | range |
    #                                 type_in | datatype | pattern |
    #                                 length | node_kind | class
    path: str                       # predicate the assertion inspects
    focus_type: str | None = None   # restrict to subjects of this rdf:type
    min_count: int | None = None    # also min length for kind=length
    max_count: int | None = None    # also max length for kind=length
    min_value: float | None = None
    max_value: float | None = None
    values: tuple = field(default_factory=tuple)


_RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _focus(triples: DataFrame, focus_type: str | None) -> DataFrame:
    """Subjects under assertion (all subjects, or those of focus_type;
    rdf:type matches both the compact and the full-IRI spelling so
    SHACL targetClass works against parsed Turtle)."""
    if focus_type is None:
        return triples.select(F.col("subj").alias("entity")).distinct()
    return (
        triples.filter(
            F.col("pred").isin("rdf:type", _RDF_TYPE_IRI)
            & (F.col("obj") == focus_type)
        )
        .select(F.col("subj").alias("entity"))
        .distinct()
    )


def required_property_violations(triples: DataFrame, a: Assertion) -> DataFrame:
    """min 1 occurrence of path (docs/advanced-topics.md:112-119) —
    anti join focus against path slice."""
    has = triples.filter(F.col("pred") == a.path).select(
        F.col("subj").alias("entity")
    )
    return (
        _focus(triples, a.focus_type)
        .join(has, "entity", "left_anti")
        .withColumn("issue", F.lit(f"missing required {a.path}"))
    )


def cardinality_violations(triples: DataFrame, a: Assertion) -> DataFrame:
    """min ≤ count(path per entity) ≤ max (docs/advanced-topics.md:122-129)."""
    counts = (
        _focus(triples, a.focus_type)
        .join(
            triples.filter(F.col("pred") == a.path).select(
                F.col("subj").alias("entity"), "obj"
            ),
            "entity",
            "left",
        )
        .groupBy("entity")
        .agg(F.count("obj").alias("n"))
    )
    cond = F.lit(False)
    if a.min_count is not None:
        cond = cond | (F.col("n") < a.min_count)
    if a.max_count is not None:
        cond = cond | (F.col("n") > a.max_count)
    return counts.filter(cond).withColumn(
        "issue", F.concat(F.lit(f"cardinality of {a.path} = "), F.col("n"))
    )


def _scoped_path(triples: DataFrame, a: Assertion,
                 with_meta: bool = False) -> DataFrame:
    """(entity, obj[, obj_lang, obj_datatype]) rows of ``a.path``,
    restricted to focus_type subjects — range/in/datatype previously
    ignored ``focus_type``, so a shape's targetClass scoping was
    silently dropped and out-of-scope subjects raised false
    violations (failing the commit gate). ``with_meta`` pulls the
    literal-metadata columns (datatype assertions only — plain
    (subj, pred, obj) frames stay accepted elsewhere)."""
    cols = [F.col("subj").alias("entity"), F.col("obj")]
    if with_meta:
        cols += [F.col("obj_lang"), F.col("obj_datatype")]
    rows = triples.filter(F.col("pred") == a.path).select(*cols)
    if a.focus_type is not None:
        rows = rows.join(
            F.broadcast(_focus(triples, a.focus_type)), "entity", "left_semi"
        )
    return rows


def value_range_violations(triples: DataFrame, a: Assertion) -> DataFrame:
    """numeric object of path within [min, max]
    (docs/advanced-topics.md:131-141, 412)."""
    vals = _scoped_path(triples, a).select(
        "entity",
        "obj",
        # try_cast: non-numeric literals become NULL violations instead
        # of failing the job under ANSI mode (Spark 4 default)
        F.col("obj").try_cast("double").alias("value"),
    )
    cond = F.col("value").isNull()
    if a.min_value is not None:
        cond = cond | (F.col("value") < a.min_value)
    if a.max_value is not None:
        cond = cond | (F.col("value") > a.max_value)
    return vals.filter(cond).withColumn(
        "issue",
        # the raw lexical form, not the cast value: a non-numeric
        # literal casts to NULL and would null the whole message
        F.concat(F.lit(f"{a.path} out of range: "), F.col("obj")),
    )


def type_membership_violations(triples: DataFrame, a: Assertion) -> DataFrame:
    """object of path must be one of `values`
    (docs/advanced-topics.md:112-119) — left anti against allowed set."""
    objs = _scoped_path(triples, a)
    return objs.filter(~F.col("obj").isin(list(a.values))).withColumn(
        "issue", F.concat(F.lit(f"{a.path} value not allowed: "), F.col("obj"))
    )


_RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def datatype_violations(triples: DataFrame, a: Assertion) -> DataFrame:
    """object literals of path must carry the expected datatype
    (SHACL sh:datatype). Per RDF 1.1: a plain literal (no datatype, no
    lang) is xsd:string; a language-tagged literal is rdf:langString."""
    expected = a.values[0] if a.values else None
    actual = F.coalesce(
        F.col("obj_datatype"),
        F.when(F.col("obj_lang").isNotNull(), F.lit(_RDF_LANGSTRING))
        .otherwise(F.lit("http://www.w3.org/2001/XMLSchema#string")),
    )
    objs = _scoped_path(triples, a, with_meta=True).select(
        "entity", actual.alias("dt")
    )
    return objs.filter(
        F.col("dt").isNull() | (F.col("dt") != expected)
    ).withColumn(
        "issue",
        F.concat(F.lit(f"{a.path} datatype != {expected}: "), F.col("dt")),
    )


# Java Pattern inline-group flags we can honor; SHACL also defines
# 'q' (literal) which Java's (?…) group does not accept — anything
# outside this set must fail at shape-parse time, not as a
# PatternSyntaxException inside an executor task mid-job
_SUPPORTED_REGEX_FLAGS = frozenset("ismx")


def pattern_violations(triples: DataFrame, a: Assertion) -> DataFrame:
    """object lexical form must match the regex (SHACL sh:pattern,
    search semantics — a match anywhere satisfies; sh:flags prepend
    an inline (?ism) group)."""
    pat = a.values[0]
    flags = a.values[1] if len(a.values) > 1 and a.values[1] else None
    if flags is not None and (
        not flags or set(flags) - _SUPPORTED_REGEX_FLAGS
    ):
        raise ValueError(
            f"sh:flags {flags!r} on {a.path} pattern {pat!r}: only "
            f"{''.join(sorted(_SUPPORTED_REGEX_FLAGS))} are supported"
        )
    rx = f"(?{flags}){pat}" if flags else pat
    objs = _scoped_path(triples, a)
    return objs.filter(~F.col("obj").rlike(rx)).withColumn(
        "issue",
        F.concat(F.lit(f"{a.path} does not match {pat}: "), F.col("obj")),
    )


def length_violations(triples: DataFrame, a: Assertion) -> DataFrame:
    """min ≤ strlen(object) ≤ max (SHACL sh:minLength/sh:maxLength)."""
    objs = _scoped_path(triples, a).withColumn("n", F.length("obj"))
    cond = F.lit(False)
    if a.min_count is not None:
        cond = cond | (F.col("n") < a.min_count)
    if a.max_count is not None:
        cond = cond | (F.col("n") > a.max_count)
    return objs.filter(cond).withColumn(
        "issue",
        F.concat(F.lit(f"{a.path} length out of bounds: "), F.col("n")),
    )


def node_kind_violations(triples: DataFrame, a: Assertion) -> DataFrame:
    """object must be the given node kind (SHACL sh:nodeKind:
    IRI / Literal / BlankNode), classified by the store convention —
    blank nodes are ``_:``-prefixed, IRIs are scheme-prefixed (or
    compact pnames) without literal metadata, anything tagged/typed
    is a literal regardless of shape (the same rules as the SPARQL
    front-end's isIRI/isLiteral/isBlank)."""
    kind = a.values[0]
    objs = _scoped_path(triples, a, with_meta=True)
    blank = F.col("obj").startswith("_:")
    tagged = F.col("obj_lang").isNotNull() | F.col("obj_datatype").isNotNull()
    scheme = F.col("obj").rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
    iri_like = scheme & ~blank & ~tagged
    lit_like = tagged | (~scheme & ~blank)
    ok = {"IRI": iri_like, "Literal": lit_like, "BlankNode": blank}.get(kind)
    if ok is None:
        raise ValueError(f"unsupported sh:nodeKind {kind!r}")
    return objs.filter(~ok).select("entity", "obj").withColumn(
        "issue", F.concat(F.lit(f"{a.path} is not a {kind}: "), F.col("obj"))
    )


def class_violations(triples: DataFrame, a: Assertion) -> DataFrame:
    """object must be an instance of the class (SHACL sh:class) —
    anti join against the class's rdf:type subjects."""
    cls = a.values[0]
    typed = (
        triples.filter(
            F.col("pred").isin("rdf:type", _RDF_TYPE_IRI)
            & (F.col("obj") == cls)
        )
        .select(F.col("subj").alias("obj"))
        .distinct()
    )
    objs = _scoped_path(triples, a)
    return objs.join(typed, "obj", "left_anti").withColumn(
        "issue",
        F.concat(F.lit(f"{a.path} value not a {cls}: "), F.col("obj")),
    )


_DISPATCH = {
    "required": required_property_violations,
    "cardinality": cardinality_violations,
    "range": value_range_violations,
    "type_in": type_membership_violations,
    "datatype": datatype_violations,
    "pattern": pattern_violations,
    "length": length_violations,
    "node_kind": node_kind_violations,
    "class": class_violations,
}


def validate(triples: DataFrame, assertions: list[Assertion]) -> DataFrame:
    """All assertions → one violations table (entity, issue)."""
    out: DataFrame | None = None
    for a in assertions:
        v = _DISPATCH[a.kind](triples, a).select("entity", "issue")
        out = v if out is None else out.unionByName(v)
    if out is None:
        raise ValueError("no assertions")
    return out
