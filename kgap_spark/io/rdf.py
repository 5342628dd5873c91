"""RDF file import/export (SURVEY §2.1 S5/S6).

k-gap bulk-imports TTL / RDF-XML / N-Triples / TriG / JSON-LD through
GraphDB's statements endpoint with an optional ``?context=`` graph
(reference: ``docs/components/graphdb.md:254-267``,
``docs/quick-reference.md:316-327``) and exports repositories/graphs
back to RDF files plus query results to CSV/JSON/Excel
(``docs/components/graphdb.md:272-278``,
``docs/components/jupyter.md:580-583``).

Here the line-based N-Triples / N-Quads family is implemented natively:
``spark.read.text`` + one fully-anchored JVM-side regex — a splittable,
whole-stage-codegen scan that parallelizes over any corpus size (the
right format for 100 TB bulk RDF). The block formats (Turtle/TriG,
JSON-LD, RDF/XML) are parsed per-file through ``mapInPandas`` in their
own modules; ``read_rdf`` dispatches over all five.

Term handling: IRIs lose their angle brackets, ``_:label`` blank nodes
(legal at subject/object/graph position per the N-Quads grammar) are
renamed into the same file-unique bnode namespace the Turtle parser
uses (``io/turtle.py``: ``_:{md5(file)[:8]}-L{label}``) so cross-file
merges cannot collide and cross-format reads agree, and
plain/typed/lang literals map onto (obj, obj_lang, obj_datatype) — the
quad schema's literal columns. Lines that do not match the grammar are
never silently dropped: ``on_error="fail"`` (default) raises inside the
scan with the offending line, ``on_error="skip"`` drops them but
``ntriples_rejects`` returns them for counting/reporting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgap_spark import schemas as S

# N-Triples/N-Quads line grammar, anchored at BOTH ends. A single
# master regex (extracted per capture group) instead of per-term
# prefix regexes: the old unanchored graph regex could capture a
# 3-term line's object IRI as its graph term. Groups:
#   1 subj IRI   2 subj bnode label
#   3 pred IRI
#   4 obj IRI    5 obj bnode label
#   6 literal lexical form   7 @lang   8 ^^<datatype>
#   9 graph IRI  10 graph bnode label
# BLANK_NODE_LABEL per the spec: leading PN_CHARS_U|digit, inner dots
# allowed, no trailing dot.
_IRI = r'<([^<>"\s]*)>'
_BNODE = r"_:([A-Za-z0-9_](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?)"
_LINE = (
    r"^\s*"
    r"(?:" + _IRI + r"|" + _BNODE + r")"            # subject
    r"\s+" + _IRI +                                  # predicate
    r"\s+(?:" + _IRI + r"|" + _BNODE +               # object: IRI | bnode
    r'|"((?:[^"\\]|\\.)*)"'                          # | literal
    r"(?:@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*)|\^\^" + _IRI + r")?"
    r")"
    r"(?:\s+(?:" + _IRI + r"|" + _BNODE + r"))?"     # optional graph term
    r"\s*\.\s*(?:#.*)?$"
)


def _unescape(col):
    """N-Triples string unescaping, single pass: sequential passes
    mis-decode a literal backslash followed by n/t/" (the input
    backslash-backslash-n, meaning backslash+n, would become
    backslash+newline). A sentinel swap keeps each escape decoded
    exactly once, all JVM-side.

    ``\\uXXXX`` UCHAR escapes (Jena/Serd ASCII-escape non-ASCII this
    way) take a guarded slow path through the JVM's full Java-string
    unescape (same ECHAR semantics, plus \\u) — previously they were
    silently left as 9 literal characters. ``\\U`` 8-hex escapes (how
    Jena ASCII-escapes supplementary-plane chars) are first rewritten
    to their UTF-16 surrogate pair as two ``\\u`` escapes — all
    JVM-side (conv/shiftright/pmod inside an ``aggregate`` fold over
    the extracted escapes, with ``\\\\`` sentinel-protected so a
    literal backslash before ``U`` is never misread) — then decoded by
    the same slow path."""
    nul = chr(0)  # control chars cannot appear raw in N-Triples
    fast = F.regexp_replace(col, r"\\\\", nul)
    for esc, ch in ((r"\\n", "\n"), (r"\\t", "\t"),
                    (r"\\r", "\r"), (r'\\"', '"')):
        fast = F.regexp_replace(fast, esc, ch)
    fast = F.regexp_replace(fast, nul, r"\\")

    def unescape_java(c):
        return F.reflect(
            F.lit("org.apache.commons.lang3.StringEscapeUtils"),
            F.lit("unescapeJava"),
            c,
        )

    def u16(n):  # codepoint number → \uXXXX escape text
        return F.concat(F.lit("\\u"), F.lpad(F.lower(F.hex(n)), 4, "0"))

    def surrogates(esc):  # "\UXXXXXXXX" → "\uDXXX\uDXXX" (or one \u for BMP)
        cp = F.conv(F.substring(esc, 3, 8), 16, 10).cast("long")
        hi = F.shiftright(cp - 0x10000, 10) + F.lit(0xD800)
        lo = F.pmod(cp - 0x10000, F.lit(1024)) + F.lit(0xDC00)
        return F.when(cp <= 0xFFFF, u16(cp)).otherwise(
            F.concat(u16(hi), u16(lo))
        )

    protected = F.regexp_replace(col, r"\\\\", nul)
    big_u = F.regexp_extract_all(
        protected, F.lit(r"\\U[0-9A-Fa-f]{8}"), 0
    )
    rewritten = F.regexp_replace(
        F.aggregate(
            F.array_distinct(big_u), protected,
            lambda acc, esc: F.replace(acc, esc, surrogates(esc)),
        ),
        nul, r"\\\\",
    )
    return (
        F.when(col.rlike(r"\\U[0-9A-Fa-f]{8}"), unescape_java(rewritten))
        .when(col.rlike(r"\\u[0-9A-Fa-f]{4}"), unescape_java(col))
        .otherwise(fast)
    )


def _nt_lines(spark: SparkSession, path: str) -> DataFrame:
    """Non-blank, non-comment text lines of an N-Triples/N-Quads path."""
    return spark.read.text(path).filter(
        (F.trim("value") != "") & ~F.trim("value").startswith("#")
    )


def ntriples_rejects(spark: SparkSession, path: str) -> DataFrame:
    """Lines that do NOT parse as N-Triples/N-Quads statements — the
    reporting companion of ``read_ntriples(on_error='skip')`` so lossy
    imports are counted, never invisible."""
    return _nt_lines(spark, path).filter(~F.col("value").rlike(_LINE))


def read_ntriples(
    spark: SparkSession,
    path: str,
    default_graph: str | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """N-Triples/N-Quads file(s) → quad DataFrame (TRIPLES schema).

    ``default_graph`` plays the role of the import ``?context=`` param
    (docs/quick-reference.md:322-327): quads without an explicit graph
    term land there. ``_:label`` blank nodes (legal per the N-Quads
    grammar; the reference's own config Turtle leans on bnodes,
    graphdb/kgap/template-repo-config.ttl:19-42) are renamed into the
    Turtle parser's file-unique namespace ``_:{md5(file)[:8]}-L{label}``.

    ``on_error``: 'fail' raises on the first unparseable line — inside
    the distributed scan, via ``raise_error``, so there is no
    driver-side validation pass; 'skip' drops such lines (use
    ``ntriples_rejects`` to count them).
    """
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")
    lines = _nt_lines(spark, path)
    v = F.col("value")
    matched = v.rlike(_LINE)

    def grp(i: int):
        return F.regexp_extract(v, _LINE, i)

    # file-unique bnode namespace, matching io/turtle.py's
    # hashlib.md5(src).hexdigest()[:8] + "-" prefix and its "L"+label
    # convention for labeled bnodes — cross-format reads of the same
    # file family agree modulo the per-file hash.
    bn_pfx = F.concat(
        F.lit("_:"), F.substring(F.md5(F.input_file_name()), 1, 8), F.lit("-L")
    )

    def bnode(label):
        return F.concat(bn_pfx, label)

    subj = F.when(grp(1) != "", grp(1)).otherwise(bnode(grp(2)))
    pred = grp(3)
    # object: IRI wins, then bnode, else the (possibly empty) literal
    obj = (
        F.when(grp(4) != "", grp(4))
        .when(grp(5) != "", bnode(grp(5)))
        .otherwise(_unescape(grp(6)))
    )
    graph = F.coalesce(
        F.nullif(grp(9), F.lit("")),
        F.when(grp(10) != "", bnode(grp(10))),
        F.lit(default_graph),
    )
    if on_error == "fail":
        # raise inside the scan on the first bad line; when() keeps
        # raise_error un-evaluated for matching rows
        subj = F.when(matched, subj).otherwise(
            F.raise_error(
                F.concat(F.lit("unparseable N-Triples/N-Quads line: "), v)
            ).cast("string")
        )
    return (
        lines.filter(matched if on_error == "skip" else F.lit(True))
        .select(
            subj.alias("subj"),
            pred.alias("pred"),
            obj.alias("obj"),
            F.nullif(grp(7), F.lit("")).alias("obj_lang"),
            F.nullif(grp(8), F.lit("")).alias("obj_datatype"),
            graph.alias("graph"),
            F.lit(None).cast("string").alias("src_url"),
        )
    )


def read_rdf(
    spark: SparkSession,
    path: str,
    fmt: str = "ntriples",
    default_graph: str | None = None,
    **kwargs,
) -> DataFrame:
    """Format-dispatching bulk import — the analog of GraphDB's
    statements endpoint content-type switch
    (docs/components/graphdb.md:254-267). All formats produce the same
    quad schema; ``default_graph`` is the ``?context=`` param.

    ntriples/nquads are line-splittable (the 100 TB path); turtle/trig,
    jsonld, and rdfxml are block formats parsed per FILE in
    mapInPandas (jsonld supports ``lines=True`` for splittable NDJSON).
    """
    fmt = fmt.lower().replace("-", "").replace("/", "")
    if fmt in ("ntriples", "nquads", "nt", "nq"):
        return read_ntriples(spark, path, default_graph, **kwargs)
    if fmt in ("turtle", "ttl", "trig"):
        from kgap_spark.io.turtle import read_turtle

        return read_turtle(spark, path, default_graph, **kwargs)
    if fmt in ("jsonld", "ldjson", "json"):
        from kgap_spark.io.jsonld import read_jsonld

        return read_jsonld(spark, path, default_graph, **kwargs)
    if fmt in ("rdfxml", "xml"):
        from kgap_spark.io.rdfxml import read_rdfxml

        return read_rdfxml(spark, path, default_graph, **kwargs)
    raise ValueError(f"unsupported RDF format: {fmt}")


def _escape(col):
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', r'\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    # \r must round-trip too: Hadoop's line reader treats a bare CR as
    # a record terminator, so an unescaped one splits the statement
    out = F.regexp_replace(out, "\r", r"\\r")
    return F.regexp_replace(out, "\t", r"\\t")


# "Is this obj string an IRI?" — generic RFC 3986 scheme test instead
# of an https?/urn allowlist (the reference's own LDES feeds use
# file:/// IRIs): any scheme followed by ://, plus the common
# non-hierarchical schemes. Anchored + no-whitespace so ordinary prose
# with a colon ("note: hi") stays a literal. The quad schema carries no
# explicit term-type column, so this heuristic is shared by every
# serializer; a literal that happens to look exactly like an IRI (no
# lang/datatype, scheme prefix, no spaces) serializes as an IRI.
_IRI_OBJ = (
    r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://\S+"
    r"|(?:urn|mailto|doi|tel|data|news|tag|isbn|info|hdl|ark|file|ftp"
    r"|did|geo|uuid|ni|cid|spdx):\S+)$"
)


def _is_iri(col):
    return col.rlike(_IRI_OBJ)


def _is_bnode(col):
    return col.startswith("_:")


def ntriples_lines(triples: DataFrame, with_graph: bool = True) -> DataFrame:
    """quad DataFrame → one N-Triples/N-Quads line per row (native
    concat; ready for ``.write.text``). Blank-node subjects/objects/
    graphs serialize as ``_:label`` terms, not bracketed IRIs."""

    def iri_or_bnode(col):
        return F.when(_is_bnode(col), col).otherwise(
            F.concat(F.lit("<"), col, F.lit(">"))
        )

    lit = F.concat(F.lit('"'), _escape(F.col("obj")), F.lit('"'))
    lit = F.when(
        F.col("obj_lang").isNotNull(),
        F.concat(lit, F.lit("@"), F.col("obj_lang")),
    ).when(
        F.col("obj_datatype").isNotNull(),
        F.concat(lit, F.lit("^^<"), F.col("obj_datatype"), F.lit(">")),
    ).otherwise(lit)
    untyped = F.col("obj_lang").isNull() & F.col("obj_datatype").isNull()
    obj_term = (
        F.when(_is_bnode(F.col("obj")) & untyped, F.col("obj"))
        .when(
            _is_iri(F.col("obj")) & untyped,
            F.concat(F.lit("<"), F.col("obj"), F.lit(">")),
        )
        .otherwise(lit)
    )
    parts = [
        iri_or_bnode(F.col("subj")),
        F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
        obj_term,
    ]
    if with_graph:
        parts.append(iri_or_bnode(F.col("graph")))
    return triples.select(
        F.concat_ws(" ", *parts, F.lit(".")).alias("value")
    )


def write_ntriples(triples: DataFrame, path: str, with_graph: bool = True) -> None:
    """Export a graph/repository to N-Triples (S6,
    docs/components/graphdb.md:272-278)."""
    ntriples_lines(triples, with_graph).write.mode("overwrite").text(path)


DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}

# Turtle PN_LOCAL subset: no leading '-'/'.' and no trailing '.'
# (a trailing dot would merge with the statement terminator — the
# repo's own read_turtle rejects `ex:v1. .`); falls back to <iri> form.
_PN_LOCAL_OK = r"^(?![.\-])[A-Za-z0-9_\-.]*(?<!\.)$"


def _compress_iri(col, prefixes: dict[str, str]):
    """IRI column → prefixed name where a prefix matches and the local
    part is pname-safe; <iri> otherwise. Pure Catalyst when/startswith
    chain (prefix maps are small by construction)."""
    out = F.concat(F.lit("<"), col, F.lit(">"))
    for name, iri in prefixes.items():
        local = F.substring(col, len(iri) + 1, 1 << 20)
        out = F.when(
            col.startswith(iri) & local.rlike(_PN_LOCAL_OK),
            F.concat(F.lit(name + ":"), local),
        ).otherwise(out)
    return out


def turtle_lines(triples: DataFrame, prefixes: dict[str, str]) -> DataFrame:
    """quad DataFrame → one prefix-compressed Turtle statement per row
    (no preamble — ``write_turtle`` adds it per output file)."""
    obj_is_iri = _is_iri(F.col("obj"))
    obj_is_bnode = _is_bnode(F.col("obj"))
    lit = F.concat(F.lit('"'), _escape(F.col("obj")), F.lit('"'))
    lit = F.when(
        F.col("obj_lang").isNotNull(),
        F.concat(lit, F.lit("@"), F.col("obj_lang")),
    ).when(
        F.col("obj_datatype").isNotNull(),
        F.concat(lit, F.lit("^^"),
                 _compress_iri(F.col("obj_datatype"), prefixes)),
    ).otherwise(lit)
    untyped = F.col("obj_lang").isNull() & F.col("obj_datatype").isNull()
    obj_term = F.when(obj_is_bnode & untyped, F.col("obj")).when(
        obj_is_iri & untyped,
        _compress_iri(F.col("obj"), prefixes),
    ).otherwise(lit)
    subj_term = F.when(
        F.col("subj").startswith("_:"), F.col("subj")
    ).otherwise(_compress_iri(F.col("subj"), prefixes))
    return triples.select(
        F.concat_ws(
            " ",
            subj_term,
            _compress_iri(F.col("pred"), prefixes),
            obj_term,
            F.lit("."),
        ).alias("value")
    )


def write_turtle(
    triples: DataFrame, path: str, prefixes: dict[str, str] | None = None
) -> None:
    """Export to Turtle (S6, docs/components/graphdb.md:272-278):
    prefix-compressed statements, with the @prefix preamble emitted at
    the top of EVERY part file — each part is standalone-valid Turtle,
    and concatenation stays valid because Turtle allows prefix
    re-declaration. Fully distributed (mapInPandas per partition)."""
    import pandas as pd

    prefixes = dict(DEFAULT_PREFIXES, **(prefixes or {}))
    preamble = [f"@prefix {k}: <{v}> ." for k, v in prefixes.items()]
    lines = turtle_lines(triples, prefixes)

    def add_preamble(batches):
        first = True
        for pdf in batches:
            if first and len(pdf):
                pdf = pd.concat(
                    [pd.DataFrame({"value": preamble}), pdf],
                    ignore_index=True,
                )
                first = False
            yield pdf

    lines.mapInPandas(add_preamble, schema="value string").write.mode(
        "overwrite"
    ).text(path)


def export_results(df: DataFrame, path: str, fmt: str = "csv") -> None:
    """Query-result export — the CSV/JSON/Excel edge of the jupyter
    surface (docs/components/jupyter.md:580-583). csv/json/parquet use
    distributed writers (at scale the result itself can be large);
    xlsx is a driver-edge single file with a row guard."""
    if fmt == "xlsx":
        from kgap_spark.io.excel import export_xlsx

        export_xlsx(df, path)
        return
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")
