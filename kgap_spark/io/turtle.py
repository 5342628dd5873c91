"""Turtle / TriG ingestion (SURVEY §2.1 S5 — the reference's primary
bulk-import format).

k-gap's feeds, test data, and import surface are TTL-first: the LDES
test feed is ``file:///data/test-ldes.ttl``
(``docs/components/ldes-consumer.md:204-212``), the import endpoint
accepts Turtle/TriG (``docs/components/graphdb.md:254-267``), and the
example vocab feeds are .ttl (``data/ldes-feeds-example.yml:12-21``).

Turtle is a *block* format — statements span lines, so unlike N-Triples
it is not line-splittable. The distributed unit is therefore the FILE:
``spark.read.text(..., wholetext=True)`` yields one row per file, and a
pure-Python recursive-descent parser (no rdflib in this image) runs per
file inside Arrow-batched ``mapInPandas``. A feed corpus is many small
.ttl member files, so parallelism follows the file count — the same
shape as the reference's per-member ingestion. A single giant TTL file
is inherently serial in ANY engine (the format's fault, not the plan's);
for bulk 100 TB loads, N-Quads (``read_ntriples``) stays the
splittable fast path.

Grammar coverage (the common Turtle 1.1 subset + TriG graph blocks):
@prefix/@base (and SPARQL-style PREFIX/BASE), prefixed names, IRIREFs
with \\u escapes, all four literal quote forms with escapes, @lang,
^^datatype, numeric/boolean shorthand, ``a``, predicate-object lists
(;), object lists (,), blank-node labels and anonymous [ ... ] property
lists, collections ( ... ), and TriG ``GRAPH <g> { ... }`` /
``<g> { ... }`` blocks. Blank-node labels are made file-unique so
cross-file merges can't collide.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgap_spark import schemas as S

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"


class TurtleParseError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Tokenizer

_WS_RE = re.compile(r"[ \t\r\n]+")
_NUM_RE = re.compile(
    r"[+-]?(?:"
    r"\d+\.\d*(?:[eE][+-]?\d+)?"
    r"|\.\d+(?:[eE][+-]?\d+)?"
    r"|\d+(?:[eE][+-]?\d+)?"
    r")"
)
_LANGTAG_RE = re.compile(r"@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*")
_UESC_RE = re.compile(r"\\u([0-9a-fA-F]{4})|\\U([0-9a-fA-F]{8})")
_STR_ESC = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}
# characters that terminate an unescaped prefixed-name local part
_PN_STOP = set(' \t\r\n,;()[]{}<>"\'#')


def _unescape_uchar(s: str) -> str:
    return _UESC_RE.sub(
        lambda m: chr(int(m.group(1) or m.group(2), 16)), s
    )


def _unescape_string(s: str) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt in _STR_ESC:
                out.append(_STR_ESC[nxt])
                i += 2
                continue
            if nxt == "u" and i + 6 <= n:
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= n:
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _tokenize(s: str) -> list[tuple[str, object]]:
    """→ [(kind, value)]: IRIREF, PNAME (prefix, local), BNODE, STRING,
    LANGTAG, NUMBER (lex, datatype), DTMARK, KW, PUNCT."""
    toks: list[tuple[str, object]] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in " \t\r\n":
            m = _WS_RE.match(s, i)
            i = m.end()
            continue
        if c == "#":
            j = s.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "<":
            j = s.find(">", i + 1)
            if j < 0:
                raise TurtleParseError(f"unterminated IRI at {i}")
            toks.append(("IRIREF", _unescape_uchar(s[i + 1:j])))
            i = j + 1
            continue
        if c in "\"'":
            quote = c
            if s[i:i + 3] == quote * 3:
                j = s.find(quote * 3, i + 3)
                while j > 0 and s[j - 1] == "\\":
                    # escaped quote inside a long literal
                    k = j - 1
                    nback = 0
                    while k >= 0 and s[k] == "\\":
                        nback += 1
                        k -= 1
                    if nback % 2 == 0:
                        break
                    j = s.find(quote * 3, j + 1)
                if j < 0:
                    raise TurtleParseError(f"unterminated long literal at {i}")
                # Turtle 1.1: content may END with up to two unescaped
                # quotes ("""abc"""" is the literal abc") — the
                # delimiter is the LAST three quotes of the closing run
                run = 3
                while j + run < n and s[j + run] == quote:
                    run += 1
                if run in (4, 5):
                    j += run - 3
                toks.append(("STRING", _unescape_string(s[i + 3:j])))
                i = j + 3
                continue
            j = i + 1
            while j < n:
                if s[j] == "\\":
                    j += 2
                    continue
                if s[j] == quote:
                    break
                if s[j] == "\n":
                    raise TurtleParseError(f"newline in short literal at {i}")
                j += 1
            if j >= n:
                raise TurtleParseError(f"unterminated literal at {i}")
            toks.append(("STRING", _unescape_string(s[i + 1:j])))
            i = j + 1
            continue
        if c == "@":
            rest = s[i:]
            if rest.startswith("@prefix"):
                toks.append(("KW", "prefix"))
                i += 7
                continue
            if rest.startswith("@base"):
                toks.append(("KW", "base"))
                i += 5
                continue
            m = _LANGTAG_RE.match(s, i)
            if not m:
                raise TurtleParseError(f"bad @langtag at {i}")
            toks.append(("LANGTAG", m.group(0)[1:]))
            i = m.end()
            continue
        if s[i:i + 2] == "^^":
            toks.append(("DTMARK", "^^"))
            i += 2
            continue
        if c in ".;,[](){}":
            toks.append(("PUNCT", c))
            i += 1
            continue
        if s[i:i + 2] == "_:":
            j = i + 2
            while j < n and s[j] not in _PN_STOP:
                j += 1
            label = s[i + 2:j]
            while label.endswith("."):
                label = label[:-1]
                j -= 1
            toks.append(("BNODE", label))
            i = j
            continue
        if c.isdigit() or (c in "+-." and i + 1 < n and
                           (s[i + 1].isdigit() or s[i + 1] == ".")):
            m = _NUM_RE.match(s, i)
            if m:
                lex = m.group(0)
                # "1." at statement end: the dot is the terminator
                if lex.endswith(".") and "e" not in lex.lower():
                    lex = lex[:-1]
                if "e" in lex.lower():
                    dt = XSD + "double"
                elif "." in lex:
                    dt = XSD + "decimal"
                else:
                    dt = XSD + "integer"
                toks.append(("NUMBER", (lex, dt)))
                i += len(lex)
                continue
        # bareword / prefixed name
        j = i
        local: list[str] = []
        saw_colon = False
        while j < n:
            ch = s[j]
            if ch == "\\" and j + 1 < n:  # PN_LOCAL escape
                local.append(s[j + 1])
                j += 2
                continue
            if ch in _PN_STOP:
                break
            if ch == ":":
                saw_colon = True
            local.append(ch)
            j += 1
        word = "".join(local)
        if not word:
            raise TurtleParseError(f"unexpected char {c!r} at {i}")
        trail = 0
        while word.endswith("."):  # trailing dot terminates the statement
            word = word[:-1]
            trail += 1
        i = j - trail
        if saw_colon:
            pfx, _, loc = word.partition(":")
            toks.append(("PNAME", (pfx, _unescape_uchar(loc))))
        elif word in ("a",):
            toks.append(("KW", "a"))
        elif word.lower() in ("prefix", "base", "graph"):
            toks.append(("KW", word.lower()))
        elif word in ("true", "false"):
            toks.append(("BOOL", word))
        else:
            raise TurtleParseError(f"unknown bareword {word!r} at {i}")
    toks.append(("EOF", None))
    return toks


# ---------------------------------------------------------------------------
# Parser

_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


class _Parser:
    def __init__(self, text: str, default_graph: str | None, bnode_prefix: str):
        self.toks = _tokenize(text)
        self.pos = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self.graph: str | None = default_graph
        self.default_graph = default_graph
        self.bnode_prefix = bnode_prefix
        self.bn = 0
        self.quads: list[tuple] = []

    # -- token plumbing -------------------------------------------------
    def peek(self):
        return self.toks[self.pos]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect_punct(self, ch: str):
        k, v = self.next()
        if k != "PUNCT" or v != ch:
            raise TurtleParseError(f"expected {ch!r}, got {k} {v!r}")

    # -- term helpers -----------------------------------------------------
    def resolve(self, iri: str) -> str:
        if self.base and not _ABS_IRI_RE.match(iri):
            return urljoin(self.base, iri)
        return iri

    def pname_iri(self, pfx: str, local: str) -> str:
        if pfx not in self.prefixes:
            raise TurtleParseError(f"undeclared prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def new_bnode(self) -> str:
        self.bn += 1
        return f"_:{self.bnode_prefix}{self.bn}"

    def emit(self, s, p, o, lang=None, dt=None):
        self.quads.append((s, p, o, lang, dt, self.graph))

    # -- grammar ----------------------------------------------------------
    def parse(self) -> list[tuple]:
        while self.peek()[0] != "EOF":
            self.statement()
        return self.quads

    def statement(self):
        k, v = self.peek()
        if k == "KW" and v == "prefix":
            self.next()
            pk, pv = self.next()
            if pk != "PNAME":
                raise TurtleParseError("expected prefix name after @prefix")
            ik, iv = self.next()
            if ik != "IRIREF":
                raise TurtleParseError("expected IRI after @prefix name")
            self.prefixes[pv[0]] = self.resolve(iv)
            if self.peek() == ("PUNCT", "."):
                self.next()  # @prefix has a dot; SPARQL PREFIX does not
            return
        if k == "KW" and v == "base":
            self.next()
            ik, iv = self.next()
            if ik != "IRIREF":
                raise TurtleParseError("expected IRI after @base")
            self.base = self.resolve(iv)
            if self.peek() == ("PUNCT", "."):
                self.next()
            return
        if k == "KW" and v == "graph":
            self.next()
            label = self.graph_label()
            self.graph_block(label)
            return
        if k == "PUNCT" and v == "{":  # TriG anonymous default-graph block
            self.graph_block(self.default_graph)
            return
        # triples — or TriG "<label> { ... }"
        if k in ("IRIREF", "PNAME", "BNODE"):  # TriG: _:g { … } is legal
            save = self.pos
            label = self.graph_label()
            if self.peek() == ("PUNCT", "{"):
                self.graph_block(label)
                return
            self.pos = save
        from_bnode_list = self.peek() == ("PUNCT", "[")
        subj = self.subject()
        # a blankNodePropertyList statement may omit the trailing
        # predicateObjectList: "[ :p :o ] ."
        if not (from_bnode_list and self.peek() == ("PUNCT", ".")):
            self.predicate_object_list(subj)
        self.expect_punct(".")

    def graph_label(self) -> str:
        k, v = self.next()
        if k == "IRIREF":
            return self.resolve(v)
        if k == "PNAME":
            return self.pname_iri(*v)
        if k == "BNODE":
            return f"_:{self.bnode_prefix}L{v}"
        raise TurtleParseError(f"bad graph label: {k} {v!r}")

    def graph_block(self, label: str | None):
        prev = self.graph
        self.graph = label
        self.expect_punct("{")
        while self.peek() != ("PUNCT", "}"):
            # same blankNodePropertyList statement form as statement():
            # "[ :p :o ] ." may omit the predicateObjectList
            from_bnode_list = self.peek() == ("PUNCT", "[")
            subj = self.subject()
            if not (from_bnode_list
                    and self.peek() in (("PUNCT", "."), ("PUNCT", "}"))):
                self.predicate_object_list(subj)
            if self.peek() == ("PUNCT", "."):
                self.next()
        self.expect_punct("}")
        self.graph = prev

    def subject(self) -> str:
        k, v = self.next()
        if k == "IRIREF":
            return self.resolve(v)
        if k == "PNAME":
            return self.pname_iri(*v)
        if k == "BNODE":
            return f"_:{self.bnode_prefix}L{v}"
        if k == "PUNCT" and v == "[":
            return self.bnode_property_list()
        if k == "PUNCT" and v == "(":
            return self.collection()
        raise TurtleParseError(f"bad subject: {k} {v!r}")

    def verb(self) -> str:
        k, v = self.next()
        if k == "KW" and v == "a":
            return RDF_TYPE
        if k == "IRIREF":
            return self.resolve(v)
        if k == "PNAME":
            return self.pname_iri(*v)
        raise TurtleParseError(f"bad predicate: {k} {v!r}")

    def predicate_object_list(self, subj: str):
        while True:
            pred = self.verb()
            while True:
                self.object_term(subj, pred)
                if self.peek() == ("PUNCT", ","):
                    self.next()
                    continue
                break
            if self.peek() == ("PUNCT", ";"):
                self.next()
                # trailing ';' before '.' / ']' / '}' is legal
                if self.peek()[0] in ("PUNCT",) and self.peek()[1] in ".]}":
                    return
                if self.peek() == ("PUNCT", ";"):
                    continue
                continue
            return

    def object_term(self, subj: str, pred: str):
        k, v = self.next()
        if k == "IRIREF":
            self.emit(subj, pred, self.resolve(v))
        elif k == "PNAME":
            self.emit(subj, pred, self.pname_iri(*v))
        elif k == "BNODE":
            self.emit(subj, pred, f"_:{self.bnode_prefix}L{v}")
        elif k == "STRING":
            lang, dt = None, None
            nk, nv = self.peek()
            if nk == "LANGTAG":
                self.next()
                lang = nv
            elif nk == "DTMARK":
                self.next()
                dk, dv = self.next()
                if dk == "IRIREF":
                    dt = self.resolve(dv)
                elif dk == "PNAME":
                    dt = self.pname_iri(*dv)
                else:
                    raise TurtleParseError("bad datatype IRI")
            self.emit(subj, pred, v, lang, dt)
        elif k == "NUMBER":
            lex, dt = v
            self.emit(subj, pred, lex, None, dt)
        elif k == "BOOL":
            self.emit(subj, pred, v, None, XSD + "boolean")
        elif k == "PUNCT" and v == "[":
            self.emit(subj, pred, self.bnode_property_list())
        elif k == "PUNCT" and v == "(":
            self.emit(subj, pred, self.collection())
        else:
            raise TurtleParseError(f"bad object: {k} {v!r}")

    def bnode_property_list(self) -> str:
        """'[' already consumed."""
        node = self.new_bnode()
        if self.peek() == ("PUNCT", "]"):  # ANON
            self.next()
            return node
        self.predicate_object_list(node)
        self.expect_punct("]")
        return node

    def collection(self) -> str:
        """'(' already consumed → rdf:first/rdf:rest chain."""
        items_cells: list[str] = []
        while self.peek() != ("PUNCT", ")"):
            cell = self.new_bnode()
            items_cells.append(cell)
            self.object_term(cell, RDF_FIRST)
        self.next()  # ')'
        if not items_cells:
            return RDF_NIL
        for a, b in zip(items_cells, items_cells[1:]):
            self.emit(a, RDF_REST, b)
        self.emit(items_cells[-1], RDF_REST, RDF_NIL)
        return items_cells[0]


def parse_turtle(
    text: str,
    default_graph: str | None = None,
    bnode_prefix: str = "b",
) -> list[tuple]:
    """Turtle/TriG text → [(subj, pred, obj, obj_lang, obj_datatype,
    graph)]. Pure function; runs on executors inside mapInPandas."""
    return _Parser(text, default_graph, bnode_prefix).parse()


# ---------------------------------------------------------------------------
# Distributed reader

def read_turtle(
    spark: SparkSession,
    path: str,
    default_graph: str | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """Turtle/TriG file(s) → quad DataFrame (same TRIPLES schema as
    ``read_ntriples``). One file per row (wholetext — the format is not
    line-splittable), parsed per Arrow batch in ``mapInPandas``;
    parallelism follows the file count. ``default_graph`` plays the
    import ``?context=`` role (docs/quick-reference.md:322-327).

    ``on_error='skip'`` isolates malformed files (dropped, job
    continues) — the reference's ``FAILURE_IS_FATAL=false``
    skip-and-continue at file granularity; 'fail' (default) surfaces
    the first parse error."""
    return _read_block_format(
        spark, path, parse_turtle, default_graph, on_error
    )


def _read_block_format(
    spark: SparkSession,
    path: str,
    parse_fn,
    default_graph: str | None,
    on_error: str = "fail",
) -> DataFrame:
    """Shared wholetext → mapInPandas reader for the block RDF formats
    (Turtle/TriG, JSON-LD, RDF/XML): one file per row, file-unique
    bnode namespaces, optional per-file error isolation."""
    import pandas as pd

    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")

    files = spark.read.text(path, wholetext=True).select(
        F.col("value"), F.input_file_name().alias("src")
    )

    out_schema = (
        "subj string, pred string, obj string, obj_lang string, "
        "obj_datatype string, graph string, src_url string"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for text, src in zip(pdf["value"], pdf["src"]):
                # file-unique bnode namespace: cross-file merges can't collide
                pfx = hashlib.md5(src.encode()).hexdigest()[:8] + "-"
                try:
                    quads = parse_fn(text, default_graph, bnode_prefix=pfx)
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

    df = files.mapInPandas(run, schema=out_schema)
    return df.select([f.name for f in S.TRIPLES.fields])
