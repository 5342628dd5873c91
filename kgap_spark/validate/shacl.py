"""SHACL shape file → Assertion rows (SURVEY §2.9 U5 completion).

k-gap validates each feed's members against a SHACL shape .ttl passed
to the consumer (reference: ``ldes-consumer/app.py:344``,
``data/ldes-feeds-example.yml:21`` → ``/data/mtt-bodc-shape.ttl``).
Here the common SHACL-core constraint subset is translated into the
``validate.Assertion`` IR, so shape validation runs as the same
distributed violations queries as the YAML assertions:

=====================  =================================
SHACL constraint       Assertion
=====================  =================================
sh:minCount 1          kind=required
sh:minCount/maxCount   kind=cardinality
sh:in ( ... )          kind=type_in (allowed-value set)
sh:minInclusive/
sh:maxInclusive        kind=range
sh:datatype            kind=datatype
sh:pattern (+sh:flags) kind=pattern (regex, search semantics)
sh:minLength/
sh:maxLength           kind=length
sh:nodeKind            kind=node_kind (IRI/Literal/BlankNode)
sh:class               kind=class (object typed as C)
=====================  =================================

The shape graph is parsed driver-side with the pure-Python Turtle
parser (shape files are tiny — KBs); only the *validation* runs
distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kgap_spark.io.turtle import RDF_FIRST, RDF_NIL, RDF_REST, parse_turtle
from kgap_spark.validate.assertions import Assertion

SH = "http://www.w3.org/ns/shacl#"


def _index(quads: list[tuple]) -> dict[str, dict[str, list]]:
    """subject → pred → [obj] over the parsed shape graph."""
    idx: dict[str, dict[str, list]] = {}
    for s, p, o, _lang, _dt, _g in quads:
        idx.setdefault(s, {}).setdefault(p, []).append(o)
    return idx


def _rdf_list(idx: dict, head: str) -> list[str]:
    """Walk an rdf:first/rdf:rest chain into a Python list. A seen-set
    guards against malformed shapes whose rest chain loops — without it
    the driver hangs forever at parse time."""
    out = []
    node = head
    seen: set[str] = set()
    while node and node != RDF_NIL:
        if node in seen:
            raise ValueError(f"cyclic rdf:rest chain at {node!r} in shape")
        seen.add(node)
        props = idx.get(node, {})
        first = props.get(RDF_FIRST)
        if first:
            out.append(first[0])
        rest = props.get(RDF_REST)
        node = rest[0] if rest else None
    return out


def _one(props: dict, pred: str):
    vals = props.get(pred)
    return vals[0] if vals else None


def shape_to_assertions(shape_ttl: str) -> list[Assertion]:
    """SHACL shape document (Turtle text) → list of Assertions.

    Every ``sh:property`` of every node shape contributes one Assertion
    per recognized constraint; unrecognized constraint components are
    ignored (subset translator, documented above)."""
    quads = parse_turtle(shape_ttl)
    idx = _index(quads)

    assertions: list[Assertion] = []
    for subj, props in idx.items():
        prop_nodes = props.get(SH + "property", [])
        if not prop_nodes:
            continue
        target = _one(props, SH + "targetClass")
        for pnode in prop_nodes:
            pprops = idx.get(pnode, {})
            path = _one(pprops, SH + "path")
            if path is None:
                continue
            min_count = _one(pprops, SH + "minCount")
            max_count = _one(pprops, SH + "maxCount")
            datatype = _one(pprops, SH + "datatype")
            in_head = _one(pprops, SH + "in")
            min_inc = _one(pprops, SH + "minInclusive")
            max_inc = _one(pprops, SH + "maxInclusive")

            if min_count is not None and int(min_count) == 1 and max_count is None:
                assertions.append(
                    Assertion(kind="required", path=path, focus_type=target)
                )
            elif min_count is not None or max_count is not None:
                assertions.append(
                    Assertion(
                        kind="cardinality",
                        path=path,
                        focus_type=target,
                        min_count=int(min_count) if min_count is not None else None,
                        max_count=int(max_count) if max_count is not None else None,
                    )
                )
            if in_head is not None:
                values = tuple(_rdf_list(idx, in_head))
                assertions.append(
                    Assertion(kind="type_in", path=path, focus_type=target,
                              values=values)
                )
            if min_inc is not None or max_inc is not None:
                assertions.append(
                    Assertion(
                        kind="range",
                        path=path,
                        focus_type=target,
                        min_value=float(min_inc) if min_inc is not None else None,
                        max_value=float(max_inc) if max_inc is not None else None,
                    )
                )
            if datatype is not None:
                assertions.append(
                    Assertion(kind="datatype", path=path, focus_type=target,
                              values=(datatype,))
                )
            pattern = _one(pprops, SH + "pattern")
            if pattern is not None:
                flags = _one(pprops, SH + "flags")
                assertions.append(
                    Assertion(kind="pattern", path=path, focus_type=target,
                              values=(pattern, flags) if flags
                              else (pattern,))
                )
            min_len = _one(pprops, SH + "minLength")
            max_len = _one(pprops, SH + "maxLength")
            if min_len is not None or max_len is not None:
                assertions.append(
                    Assertion(
                        kind="length", path=path, focus_type=target,
                        min_count=int(min_len) if min_len is not None
                        else None,
                        max_count=int(max_len) if max_len is not None
                        else None,
                    )
                )
            node_kind = _one(pprops, SH + "nodeKind")
            if node_kind is not None:
                # sh:IRI / sh:Literal / sh:BlankNode (the compound
                # kinds sh:IRIOrLiteral etc. are not in the subset)
                assertions.append(
                    Assertion(kind="node_kind", path=path,
                              focus_type=target,
                              values=(node_kind.removeprefix(SH),))
                )
            cls = _one(pprops, SH + "class")
            if cls is not None:
                assertions.append(
                    Assertion(kind="class", path=path, focus_type=target,
                              values=(cls,))
                )
    return assertions


def validate_with_shape(triples: DataFrame, shape_ttl: str) -> DataFrame:
    """Distributed SHACL-subset validation: shape text → assertions →
    violations table (entity, issue)."""
    from kgap_spark.validate.assertions import validate

    assertions = shape_to_assertions(shape_ttl)
    if not assertions:
        raise ValueError("shape file yields no supported constraints")
    return validate(triples, assertions)
