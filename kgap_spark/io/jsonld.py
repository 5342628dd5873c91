"""JSON-LD ingestion (SURVEY §2.1 S5 — GraphDB import format
``application/ld+json``, reference ``docs/components/graphdb.md:
254-267``).

Pure-Python expansion of the common JSON-LD 1.0 subset — no network, no
remote ``@context`` resolution (a remote context would make ingestion
non-deterministic and is rejected explicitly):

- ``@context``: term → IRI strings, prefix definitions, and
  ``{"@id": ...}`` / ``{"@type": "@id"}`` term objects;
- ``@id`` / ``@type`` (string or list);
- nested node objects (blank nodes for unnamed ones), arrays;
- value objects ``{"@value", "@language", "@type"}``;
- ``@list`` → rdf:first/rdf:rest chains;
- ``@graph`` (top-level and named-graph node objects);
- JSON scalars: string → plain literal, int → xsd:integer,
  float → xsd:double, bool → xsd:boolean.

Like Turtle, a JSON-LD document is a block format: the distributed unit
is the FILE (``wholetext`` + ``mapInPandas``). For splittable bulk
loads, newline-delimited JSON-LD (one node object per line) is read
line-parallel with a shared context.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgap_spark import schemas as S
from kgap_spark.io.turtle import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, XSD


class JsonLdError(ValueError):
    pass


class _Expander:
    def __init__(self, default_graph: str | None, bnode_prefix: str):
        self.graph = default_graph
        self.default_graph = default_graph
        self.bnode_prefix = bnode_prefix
        self.bn = 0
        self.quads: list[tuple] = []
        self.ctx: dict[str, dict] = {}

    def new_bnode(self) -> str:
        self.bn += 1
        return f"_:{self.bnode_prefix}{self.bn}"

    def emit(self, s, p, o, lang=None, dt=None):
        self.quads.append((s, p, o, lang, dt, self.graph))

    # -- context ----------------------------------------------------------
    def load_context(self, ctx) -> None:
        if ctx is None:
            return
        if isinstance(ctx, str):
            raise JsonLdError(
                "remote @context not supported (no network in ingestion)"
            )
        if isinstance(ctx, list):
            for c in ctx:
                self.load_context(c)
            return
        for term, defn in ctx.items():
            if term.startswith("@"):
                continue
            if isinstance(defn, str):
                self.ctx[term] = {"@id": defn}
            elif isinstance(defn, dict) and "@id" in defn:
                self.ctx[term] = defn
            elif isinstance(defn, dict) and "@reverse" in defn:
                # reverse term (JSON-LD 1.1 §4.8): values of this term
                # become (value, iri, node) triples
                self.ctx[term] = {"@id": defn["@reverse"],
                                  "@reverse": True}

    def expand_iri(self, value: str, vocab: bool = True) -> str:
        if value.startswith("@") or value.startswith("_:"):
            return value
        if vocab and value in self.ctx:
            iri = self.ctx[value]["@id"]
            # a term definition may itself hold a compact IRI
            # ("childOf": {"@reverse": "ex:parentOf"}) — expand once
            return self.expand_iri(iri, vocab=False) if iri != value else iri
        if ":" in value:
            pfx, _, local = value.partition(":")
            if pfx in self.ctx and not local.startswith("//"):
                return self.ctx[pfx]["@id"] + local
        return value

    # -- nodes ------------------------------------------------------------
    def node(self, obj: dict) -> str:
        # JSON-LD scopes a node's @context to the node and its
        # descendants — restore the outer context on exit, or a nested
        # definition leaks into sibling/subsequent nodes
        saved_ctx = None
        if "@context" in obj:
            saved_ctx = dict(self.ctx)
            self.load_context(obj["@context"])
        try:
            return self._node_body(obj)
        finally:
            if saved_ctx is not None:
                self.ctx = saved_ctx

    def _node_body(self, obj: dict) -> str:
        raw_id = obj.get("@id")
        sid = self.expand_iri(raw_id, vocab=False) if raw_id else self.new_bnode()

        for t in _as_list(obj.get("@type", [])):
            self.emit(sid, RDF_TYPE, self.expand_iri(t))

        if "@graph" in obj:
            # named graph node: members land in graph <sid>; an
            # anonymous @graph (no @id) keeps the enclosing graph —
            # previously its members were silently dropped
            prev = self.graph
            if raw_id is not None:
                self.graph = sid
            for member in _as_list(obj["@graph"]):
                self.node(member)
            self.graph = prev

        if "@reverse" in obj:
            # {"@reverse": {p: nodes}}: each value is the SUBJECT of a
            # (value, p, sid) triple (JSON-LD 1.1 §4.8)
            for key, values in obj["@reverse"].items():
                pred = self.expand_iri(key)
                for v in _as_list(values):
                    self.reverse_value(sid, pred, v)

        for key, values in obj.items():
            if key.startswith("@"):
                continue
            pred = self.expand_iri(key)
            term_def = self.ctx.get(key, {})
            if term_def.get("@reverse"):
                for v in _as_list(values):
                    self.reverse_value(sid, pred, v)
                continue
            for v in _as_list(values):
                self.value(sid, pred, v, term_def)
        return sid

    def reverse_value(self, sid: str, pred: str, v) -> None:
        """A reverse-property value: must be a node (IRI string or node
        object — literals cannot be subjects), emitted pointing AT sid."""
        if isinstance(v, dict):
            if "@value" in v or "@list" in v:
                raise JsonLdError(
                    "@reverse value must be a node, not a literal/list"
                )
            child = self.node(v)
            self.emit(child, pred, sid)
        elif isinstance(v, str):
            self.emit(self.expand_iri(v, vocab=False), pred, sid)
        else:
            raise JsonLdError(
                "@reverse value must be a node, not a literal/list"
            )

    def value(self, sid: str, pred: str, v, term_def: dict) -> None:
        if isinstance(v, dict):
            if "@list" in v:
                head = self.rdf_list(_as_list(v["@list"]), term_def)
                self.emit(sid, pred, head)
            elif "@value" in v:
                val = v["@value"]
                if val is None:  # JSON-LD: null means value removal
                    return
                lang = v.get("@language")
                dt = self.expand_iri(v["@type"]) if "@type" in v else None
                lex, inferred = _scalar(val)
                self.emit(sid, pred, lex, lang, dt or inferred)
            else:
                child = self.node(v)
                self.emit(sid, pred, child)
        elif v is None:  # null property value: no triple
            return
        elif isinstance(v, str) and term_def.get("@type") == "@id":
            self.emit(sid, pred, self.expand_iri(v, vocab=False))
        else:
            lex, dt = _scalar(v)
            self.emit(sid, pred, lex, None, dt)

    def rdf_list(self, items: list, term_def: dict) -> str:
        if not items:
            return RDF_NIL
        cells = [self.new_bnode() for _ in items]
        for cell, item in zip(cells, items):
            self.value(cell, RDF_FIRST, item, term_def)
        for a, b in zip(cells, cells[1:]):
            self.emit(a, RDF_REST, b)
        self.emit(cells[-1], RDF_REST, RDF_NIL)
        return cells[0]


def _as_list(v) -> list:
    return v if isinstance(v, list) else [v]


def _scalar(v) -> tuple[str, str | None]:
    """JSON scalar → (lexical, datatype)."""
    if isinstance(v, bool):
        return ("true" if v else "false", XSD + "boolean")
    if isinstance(v, int):
        return (str(v), XSD + "integer")
    if isinstance(v, float):
        return (repr(v), XSD + "double")
    return (str(v), None)


def parse_jsonld(
    text: str,
    default_graph: str | None = None,
    bnode_prefix: str = "j",
    context: dict | None = None,
) -> list[tuple]:
    """JSON-LD document text → [(subj, pred, obj, obj_lang,
    obj_datatype, graph)]. ``context`` pre-seeds the active context
    (used by the line-parallel NDJSON reader)."""
    doc = json.loads(text)
    ex = _Expander(default_graph, bnode_prefix)
    if context:
        ex.load_context(context)
    if isinstance(doc, dict) and "@graph" in doc and "@id" not in doc:
        ex.load_context(doc.get("@context"))
        for member in _as_list(doc["@graph"]):
            ex.node(member)
    else:
        for member in _as_list(doc):
            ex.node(member)
    return ex.quads


def read_jsonld(
    spark: SparkSession,
    path: str,
    default_graph: str | None = None,
    lines: bool = False,
    context: dict | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """JSON-LD file(s) → quad DataFrame (TRIPLES schema).

    ``lines=False``: one document per file (wholetext — block format).
    ``lines=True``: newline-delimited node objects, line-splittable and
    fully parallel, with ``context`` shared across lines — the bulk
    path for corpus-scale JSON-LD."""
    import pandas as pd

    src_df = spark.read.text(path, wholetext=not lines).select(
        F.col("value"), F.input_file_name().alias("src")
    )
    if lines:
        src_df = src_df.filter(F.trim("value") != "")

    out_schema = (
        "subj string, pred string, obj string, obj_lang string, "
        "obj_datatype string, graph string, src_url string"
    )

    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")

    def run(batches):
        for pdf in batches:
            rows = []
            for i, (text, src) in enumerate(zip(pdf["value"], pdf["src"])):
                # hash the FULL line (a 64-char prefix collides for
                # lines sharing a long @context/@id preamble, and the
                # batch-local i resets per Arrow batch) and keep 64
                # bits — 32 bits birthday-collides at ~77k inputs
                pfx = (
                    hashlib.md5(f"{src}:{i}:{text}".encode()).hexdigest()[:16]
                    + "-"
                )
                try:
                    quads = parse_jsonld(
                        text, default_graph, bnode_prefix=pfx, context=context
                    )
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                for s, p, o, lang, dt, g in quads:
                    rows.append((s, p, o, lang, dt, g, src))
            yield pd.DataFrame(
                rows,
                columns=[
                    "subj", "pred", "obj", "obj_lang",
                    "obj_datatype", "graph", "src_url",
                ],
            )

    df = src_df.mapInPandas(run, schema=out_schema)
    return df.select([f.name for f in S.TRIPLES.fields])
