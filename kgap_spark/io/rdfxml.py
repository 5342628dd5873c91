"""RDF/XML ingestion (SURVEY §2.1 S5 — GraphDB import format
``application/rdf+xml``, reference ``docs/components/graphdb.md:
254-267``).

Pure-stdlib (xml.etree) parser for the common RDF/XML 1.1 subset:

- ``rdf:Description`` and typed node elements (element name → rdf:type);
- ``rdf:about`` / ``rdf:ID`` / ``rdf:nodeID`` subjects, blank nodes for
  anonymous descriptions;
- property elements with ``rdf:resource``, ``rdf:nodeID``, nested node
  elements, text literals;
- ``rdf:datatype``, inherited ``xml:lang``;
- ``rdf:parseType="Resource"`` (inline blank node) and
  ``rdf:parseType="Collection"`` (rdf:first/rest chain);
- property *attributes* on node elements (literal shorthand);
- ``rdf:li`` membership shorthand (→ rdf:_1, rdf:_2, … per container
  node, so rdf:Seq/Bag/Alt round-trip).

Not covered (rare in practice, documented):
``rdf:parseType="Literal"``, reification attributes.

Block format like Turtle — one file per row, parsed in mapInPandas.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from kgap_spark.io.turtle import RDF_NS, RDF_TYPE

_XML_NS = "http://www.w3.org/XML/1998/namespace"
_XML_LANG = f"{{{_XML_NS}}}lang"
_XML_BASE = f"{{{_XML_NS}}}base"
_ABOUT = f"{{{RDF_NS}}}about"
_ID = f"{{{RDF_NS}}}ID"
_NODEID = f"{{{RDF_NS}}}nodeID"
_RESOURCE = f"{{{RDF_NS}}}resource"
_DATATYPE = f"{{{RDF_NS}}}datatype"
_PARSETYPE = f"{{{RDF_NS}}}parseType"
_DESCRIPTION = f"{{{RDF_NS}}}Description"
_RDF_ROOT = f"{{{RDF_NS}}}RDF"
_LI = f"{{{RDF_NS}}}li"


class RdfXmlError(ValueError):
    pass


def _iri_of(tag: str) -> str:
    """'{ns}local' → ns+local."""
    if not tag.startswith("{"):
        return tag
    ns, _, local = tag[1:].partition("}")
    return ns + local


class _Parser:
    def __init__(self, default_graph: str | None, bnode_prefix: str,
                 base: str | None = None):
        self.graph = default_graph
        self.bnode_prefix = bnode_prefix
        self.base = base
        self.bn = 0
        self.quads: list[tuple] = []

    def resolve(self, ref: str) -> str:
        """Resolve rdf:ID fragments / relative rdf:about against
        xml:base — without it, '#item1' from two different files
        collides on one subject (and isn't an absolute IRI at all)."""
        if self.base is None or "://" in ref or ref.startswith(
            ("urn:", "mailto:", "did:", "_:")
        ):
            return ref
        if ref.startswith("#"):
            return self.base.split("#")[0] + ref
        from urllib.parse import urljoin

        return urljoin(self.base, ref)

    def new_bnode(self) -> str:
        self.bn += 1
        return f"_:{self.bnode_prefix}{self.bn}"

    def emit(self, s, p, o, lang=None, dt=None):
        self.quads.append((s, p, o, lang, dt, self.graph))

    def node(self, el: ET.Element, lang: str | None) -> str:
        lang = el.get(_XML_LANG, lang)
        if el.get(_ABOUT) is not None:
            sid = self.resolve(el.get(_ABOUT))
        elif el.get(_ID) is not None:
            sid = self.resolve("#" + el.get(_ID))
        elif el.get(_NODEID) is not None:
            sid = f"_:{self.bnode_prefix}N{el.get(_NODEID)}"
        else:
            sid = self.new_bnode()

        if el.tag != _DESCRIPTION:  # typed node element
            self.emit(sid, RDF_TYPE, _iri_of(el.tag))

        # property attributes (literal shorthand) — rdf:* and ANY
        # xml:* attribute (xml:base, xml:lang, xml:space …) are syntax,
        # not data; emitting them made garbage triples with predicates
        # like …/namespacebase
        for attr, val in el.attrib.items():
            if attr.startswith((f"{{{RDF_NS}}}", f"{{{_XML_NS}}}")):
                continue
            if attr.startswith("{"):
                self.emit(sid, _iri_of(attr), val, lang)

        li_counter = [0]  # rdf:li → rdf:_1, rdf:_2, … per node element
        for prop in el:
            self.property(sid, prop, lang, li_counter)
        return sid

    def property(
        self,
        sid: str,
        prop: ET.Element,
        lang: str | None,
        li_counter: list[int] | None = None,
    ):
        if prop.tag == _LI:
            if li_counter is None:
                li_counter = [0]
            li_counter[0] += 1
            pred = f"{RDF_NS}_{li_counter[0]}"
        else:
            pred = _iri_of(prop.tag)
        lang = prop.get(_XML_LANG, lang)
        if prop.get(_RESOURCE) is not None:
            self.emit(sid, pred, self.resolve(prop.get(_RESOURCE)))
            return
        if prop.get(_NODEID) is not None:
            self.emit(sid, pred, f"_:{self.bnode_prefix}N{prop.get(_NODEID)}")
            return
        if prop.get(_PARSETYPE) == "Resource":
            inner = self.new_bnode()
            self.emit(sid, pred, inner)
            inner_li = [0]  # shared: rdf:li inside → rdf:_1, rdf:_2, …
            for sub in prop:
                self.property(inner, sub, lang, inner_li)
            return
        if prop.get(_PARSETYPE) == "Collection":
            # node-element sequence → rdf:first/rdf:rest chain
            items = [self.node(child, lang) for child in prop]
            if not items:
                self.emit(sid, pred, f"{RDF_NS}nil")
                return
            cells = [self.new_bnode() for _ in items]
            self.emit(sid, pred, cells[0])
            for cell, item in zip(cells, items):
                self.emit(cell, f"{RDF_NS}first", item)
            for a, b in zip(cells, cells[1:]):
                self.emit(a, f"{RDF_NS}rest", b)
            self.emit(cells[-1], f"{RDF_NS}rest", f"{RDF_NS}nil")
            return
        if prop.get(_PARSETYPE) is not None:
            raise RdfXmlError(
                f"unsupported rdf:parseType={prop.get(_PARSETYPE)!r}"
            )
        children = list(prop)
        if children:  # nested node element
            child = self.node(children[0], lang)
            self.emit(sid, pred, child)
            return
        dt = prop.get(_DATATYPE)
        text = prop.text or ""
        self.emit(sid, pred, text, None if dt else lang, dt)


def parse_rdfxml(
    text: str,
    default_graph: str | None = None,
    bnode_prefix: str = "x",
) -> list[tuple]:
    """RDF/XML document → [(subj, pred, obj, obj_lang, obj_datatype,
    graph)]."""
    root = ET.fromstring(text)
    p = _Parser(default_graph, bnode_prefix, base=root.get(_XML_BASE))
    if root.tag == _RDF_ROOT:
        for el in root:
            p.node(el, root.get(_XML_LANG))
    else:  # a single node element as document root
        p.node(root, None)
    return p.quads


def read_rdfxml(
    spark: SparkSession,
    path: str,
    default_graph: str | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """RDF/XML file(s) → quad DataFrame (TRIPLES schema); one file per
    row (block format), parsed per Arrow batch in mapInPandas.
    ``on_error='skip'`` drops malformed files and continues."""
    from kgap_spark.io.turtle import _read_block_format

    return _read_block_format(
        spark, path, parse_rdfxml, default_graph, on_error
    )
