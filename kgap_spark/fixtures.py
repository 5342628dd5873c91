"""Deterministic synthetic fixture corpus (FIXTURES.md).

Generates the five fixture tables — ``web_pages``, ``alias_dict``,
``golden_triples``, ``golden_text``, ``increments`` — as pure functions
of ``(row index, seed)``. No wall clock, no global RNG state: every row
derives from SHA-256 of ``f"{seed}:{salt}:{i}"``, so generation is
order-independent and can run distributed (Spark ``mapInPandas`` over a
range) for the bench scale while staying byte-identical with the local
loop used at test scale.

The golden tables are computed *by construction*: the generator knows
which aliases it embedded in which page and applies the same published
linking semantics (lang-routed dictionary match, argmax-prior
disambiguation, shared-alias-count canonicalization) that the pipeline
implements — so pipeline-vs-golden precision/recall is exactly 1.0 when
the pipeline is correct, and the P/R ≥ 0.95 gate (BASELINE.json) has
slack only for genuine defects.

Mirrors of the reference encoded here:
- named graph per source feed (``ldes-consumer/app.py:309``),
- multilingual vocabulary feeds — the ``nl`` translation feed
  (``data/ldes-feeds-example.yml:17-21``) becomes per-lang aliases,
- versioned-member materialization (``MATERIALIZE``,
  ``data/ldes-feeds-example.yml:16,20``) becomes the ``increments``
  latest-wins fixture.
"""

from __future__ import annotations

import hashlib
import html as _html
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)
SEED = 42

# Disjoint vocabularies: filler words can never form an alias token, so
# dictionary matches in a page are exactly the embedded mentions.
FILLER = (
    "the quick brown fox jumps over lazy dog while rain falls on green "
    "hills and rivers flow toward distant blue mountains under bright "
    "morning light as birds sing songs about summer winter spring autumn "
    "days long past when people walked slowly through quiet villages"
).split()

NAME_A = [
    "marine", "coastal", "pelagic", "benthic", "tidal", "saline",
    "arctic", "tropic", "abyssal", "littoral", "estuarine", "oceanic",
    "riverine", "glacial", "volcanic", "sedimentary", "planktic", "reefal",
    "lagoonal", "deltaic",
]
# per-language "translations" of NAME_A (parallel lists) — drives the
# lang-routing requirement (docs/components/jupyter.md:439-440).
NAME_A_NL = [w + "isch" for w in NAME_A]
NAME_A_DE = [w + "ikum" for w in NAME_A]
NAME_B = [
    "sensor", "buoy", "observatory", "vessel", "specimen", "habitat",
    "current", "salinity", "temperature", "chlorophyll", "turbidity",
    "plankton", "mooring", "transect", "station", "sample", "archive",
    "dataset", "gauge", "profiler", "radar", "sonar", "probe", "float",
    "glider",
]

LANGS = ("en", "nl", "de")
HUB_COUNT = 5          # hub entities with prior≈1 appearing in >10% of pages
TWIN_EVERY = 10        # every TWIN_EVERY-th entity gets a :v2 duplicate
AMB_EVERY = 5          # one ambiguous alias per AMB_EVERY entities

GRAPH_DICT = "urn:kgap:ldes:dict"


def _h(*parts: object) -> int:
    """Pure 64-bit hash of the parts under the fixture seed."""
    key = ":".join(str(p) for p in (SEED, *parts))
    return int.from_bytes(hashlib.sha256(key.encode()).digest()[:8], "big")


@dataclass(frozen=True)
class FixtureConfig:
    n_pages: int = 120
    n_entities: int = 200
    n_sites: int = 20

    @staticmethod
    def for_scale(scale: str) -> "FixtureConfig":
        return {
            "tiny": FixtureConfig(120, 200, 20),
            "small": FixtureConfig(10_000, 2_000, 200),
            "bench": FixtureConfig(200_000, 5_000, 200),
            "bench1m": FixtureConfig(1_000_000, 10_000, 200),
            "bench2m": FixtureConfig(2_000_000, 10_000, 200),
        }[scale]


# ---------------------------------------------------------------------------
# Entities & alias dictionary

def entity_id(n: int, twin: bool = False) -> str:
    return f"urn:kgap:ent:{n:06d}" + (":v2" if twin else "")


def entity_name(n: int, lang: str = "en") -> str:
    a = {"en": NAME_A, "nl": NAME_A_NL, "de": NAME_A_DE}[lang]
    return f"{a[n % len(NAME_A)]} {NAME_B[(n // len(NAME_A)) % len(NAME_B)]} {n:06d}"


def entity_prior(n: int, twin: bool = False) -> float:
    if n < HUB_COUNT:
        base = 0.99
    else:
        base = 0.3 + (_h("prior", n) % 50) / 100.0
    return round(base - (0.2 if twin else 0.0), 4)


def alias_rows(cfg: FixtureConfig) -> list[dict]:
    """alias_dict rows (FIXTURES.md §2). Columns:
    alias, entity_id, lang, prior, is_label.

    ``is_label`` marks the per-language *name* rows (the ones the
    pipeline emits as rdfs:label triples). Duplicate (twin) entities
    share all their surface forms with the base entity → merged by the
    ≥2-shared-forms canonicalization rule. Ambiguous aliases exist as a
    single lang='*' surface form → exactly 1 shared form, never merged.
    """
    rows: list[dict] = []
    for n in range(cfg.n_entities):
        ids = [(entity_id(n), False)]
        if n % TWIN_EVERY == 0 and n >= HUB_COUNT:
            ids.append((entity_id(n, twin=True), True))
        for eid, is_twin in ids:
            prior = entity_prior(n, twin=is_twin)
            for lang in LANGS:
                rows.append(
                    dict(alias=entity_name(n, lang), entity_id=eid, lang=lang,
                         prior=prior, is_label=True)
                )
            # single-token abbreviation, language-agnostic
            rows.append(
                dict(alias=f"abbr{n:06d}", entity_id=eid, lang="*",
                     prior=prior, is_label=False)
            )
    # ambiguous aliases: one alias shared by entities (2k, 2k+1)
    for k in range(cfg.n_entities // AMB_EVERY):
        e1, e2 = (2 * k) % cfg.n_entities, (2 * k + 1) % cfg.n_entities
        if e1 == e2:
            continue
        alias = f"ambig {NAME_B[k % len(NAME_B)]} {k:04d}"
        rows.append(dict(alias=alias, entity_id=entity_id(e1), lang="*",
                         prior=entity_prior(e1), is_label=False))
        rows.append(dict(alias=alias, entity_id=entity_id(e2), lang="*",
                         prior=entity_prior(e2), is_label=False))
    return rows


def linked_entity_for_alias(alias: str, lang: str, rows_by_alias: dict) -> str | None:
    """Published disambiguation rule: among lang-routed candidates,
    argmax (prior DESC, entity_id ASC). Total deterministic order."""
    cands = [
        r for r in rows_by_alias.get(alias, ())
        if r["lang"] == lang or r["lang"] == "*"
    ]
    if not cands:
        return None
    best = min(cands, key=lambda r: (-r["prior"], r["entity_id"]))
    return best["entity_id"]


def canonical_map(alias_rows_: list[dict]) -> dict[str, str]:
    """Published canonicalization rule: entity ids sharing ≥2 aliases are
    the same real-world entity; canonical id = lexicographic min of the
    connected component. (Twins share all their aliases; ambiguous
    aliases link otherwise-distinct entities by exactly 1 and must NOT
    merge.)"""
    from collections import defaultdict

    pair_count: dict[tuple[str, str], int] = defaultdict(int)
    by_alias: dict[tuple[str, str], set[str]] = defaultdict(set)
    for r in alias_rows_:
        by_alias[(r["alias"], r["lang"])].add(r["entity_id"])
    for ids in by_alias.values():
        ids_sorted = sorted(ids)
        for i in range(len(ids_sorted)):
            for j in range(i + 1, len(ids_sorted)):
                pair_count[(ids_sorted[i], ids_sorted[j])] += 1
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), c in pair_count.items():
        if c >= 2:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
    return {e: find(e) for e in {r["entity_id"] for r in alias_rows_}}


# ---------------------------------------------------------------------------
# Pages

def page_lang(i: int) -> str:
    r = _h("lang", i) % 100
    return "en" if r < 80 else ("nl" if r < 95 else "de")


def page_site(i: int, cfg: FixtureConfig) -> str:
    return f"site{_h('site', i) % cfg.n_sites:03d}"


def page_url(i: int, cfg: FixtureConfig) -> str:
    return f"https://{page_site(i, cfg)}.example.org/page/{i}"


def page_ts(i: int) -> datetime:
    return EPOCH + timedelta(seconds=(i * 137) % (30 * 86400))


def page_mentions(i: int, cfg: FixtureConfig) -> list[str]:
    """The alias surface forms embedded in page i (in page i's lang)."""
    lang = page_lang(i)
    k = 3 + _h("k", i) % 6
    aliases: list[str] = []
    for j in range(k):
        r = _h("pick", i, j) % 100
        if r < 30:  # hub entity — the skew driver
            n = _h("hub", i, j) % HUB_COUNT
            aliases.append(entity_name(n, lang))
        elif r < 40 and cfg.n_entities >= AMB_EVERY:  # ambiguous alias
            kk = _h("amb", i, j) % (cfg.n_entities // AMB_EVERY)
            aliases.append(f"ambig {NAME_B[kk % len(NAME_B)]} {kk:04d}")
        elif r < 50:  # abbreviation (lang='*')
            n = _h("abbr", i, j) % cfg.n_entities
            aliases.append(f"abbr{n:06d}")
        else:
            n = _h("ent", i, j) % cfg.n_entities
            aliases.append(entity_name(n, lang))
    return aliases


def page_body_text(i: int, cfg: FixtureConfig) -> str:
    """The clean main-content text of page i (one paragraph per line —
    exactly what extract_text must recover from the html)."""
    heading = f"report {i} from {page_site(i, cfg)}"
    paras = [heading]
    for j, alias in enumerate(page_mentions(i, cfg)):
        w = [FILLER[_h("f", i, j, t) % len(FILLER)] for t in range(4)]
        paras.append(f"{w[0]} {w[1]} {alias} {w[2]} {w[3]}")
    return "\n".join(paras)


_BOILERPLATE_HEAD = (
    "<html><head><title>t{i}</title>"
    "<script>var x = {i}; trackPage(x);</script>"
    "<style>.main {{ color: #222; }}</style></head><body>"
    '<nav><ul><li><a href="/">home</a></li><li><a href="/about">about</a></li></ul></nav>'
    "<header><h1>Site banner {site}</h1></header>"
    '<aside>related links and widgets</aside>'
    '<div class="ad banner">BUY NOW limited offer {i}</div>'
)
_BOILERPLATE_TAIL = (
    '<div class="advert">sponsored content</div>'
    "<footer>© 2025 {site} — terms — privacy</footer></body></html>"
)


def page_html(i: int, cfg: FixtureConfig) -> bytes | None:
    """Templated html wrapping the main-content block; a fixed fraction
    are malformed / empty / non-UTF-8 (robustness per FIXTURES.md §1)."""
    r = _h("malform", i) % 100
    if r == 0:
        return b""  # empty document
    body = page_body_text(i, cfg)
    paras = "".join(
        f"<p>{_html.escape(ln)}</p>" for ln in body.split("\n")
    )
    site = page_site(i, cfg)
    if r == 1:
        # tag-soup page: no <main>/<body>, bare paragraphs
        return paras.encode("utf-8")
    head = _BOILERPLATE_HEAD.format(i=i, site=site)
    tail = _BOILERPLATE_TAIL.format(site=site)
    doc = f"{head}<main>{paras}</main>{tail}".encode("utf-8")
    if r == 2:
        # invalid UTF-8 inside a comment — decoder must not derail
        doc = doc.replace(b"</main>", b"<!-- \xff\xfe bad bytes -->" + b"</main>")
    return doc


def expected_text(i: int, cfg: FixtureConfig) -> str | None:
    """What extract_text(page_html(i)) must return, byte-for-byte."""
    r = _h("malform", i) % 100
    if r == 0:
        return ""
    return page_body_text(i, cfg)


def page_row(i: int, cfg: FixtureConfig) -> dict:
    r = _h("textnull", i) % 100
    txt = expected_text(i, cfg)
    return dict(
        url=page_url(i, cfg),
        warc_ts=page_ts(i),
        html=page_html(i, cfg),
        text=txt if r < 70 else None,  # 30% must run the extract stage
        lang=page_lang(i),
    )


# ---------------------------------------------------------------------------
# Golden triples (FIXTURES.md §3) — computed by the published rules.

def golden_rows(cfg: FixtureConfig) -> list[dict]:
    arows = alias_rows(cfg)
    by_alias: dict[str, list[dict]] = {}
    for r in arows:
        by_alias.setdefault(r["alias"], []).append(r)
    canon = canonical_map(arows)

    rows: list[dict] = []
    # dictionary graph: labels + sameAs
    for n in range(cfg.n_entities):
        eid = entity_id(n)
        for lang in LANGS:
            rows.append(dict(subj=eid, pred="rdfs:label",
                             obj=entity_name(n, lang), obj_lang=lang,
                             graph=GRAPH_DICT))
    for eid, ceid in sorted(canon.items()):
        if eid != ceid:
            rows.append(dict(subj=eid, pred="kgap:sameAs", obj=ceid,
                             obj_lang=None, graph=GRAPH_DICT))

    # per-page graphs
    seen_page_triples: set[tuple] = set()
    for i in range(cfg.n_pages):
        url = page_url(i, cfg)
        site = page_site(i, cfg)
        graph = f"urn:kgap:ldes:{site}"
        lang = page_lang(i)
        rows.append(dict(subj=url, pred="rdf:type", obj="kgap:WebPage",
                         obj_lang=None, graph=graph))
        rows.append(dict(subj=url, pred="kgap:extractedFrom", obj=site,
                         obj_lang=None, graph=graph))
        if not expected_text(i, cfg):
            continue  # empty/unextractable document → no mentions
        for alias in page_mentions(i, cfg):
            eid = linked_entity_for_alias(alias, lang, by_alias)
            if eid is None:
                continue
            ceid = canon.get(eid, eid)
            key = (url, "kgap:mentions", ceid)
            if key not in seen_page_triples:
                seen_page_triples.add(key)
                rows.append(dict(subj=url, pred="kgap:mentions", obj=ceid,
                                 obj_lang=None, graph=graph))
    return rows


# ---------------------------------------------------------------------------
# Increments fixture (FIXTURES.md §5): 10 ordered batches; some urls
# recur in later batches with newer warc_ts (latest-wins materialize).

def increment_rows(cfg: FixtureConfig, n_batches: int = 10) -> list[dict]:
    per_batch = max(10, cfg.n_pages // n_batches)
    rows = []
    for b in range(n_batches):
        for j in range(per_batch):
            # 20% of rows re-emit an earlier page with a newer timestamp
            if b > 0 and _h("inc-dup", b, j) % 5 == 0:
                i = _h("inc-ref", b, j) % (b * per_batch)
            else:
                i = b * per_batch + j
            base = page_row(i, cfg)
            rows.append(dict(batch_id=b, url=base["url"],
                             warc_ts=base["warc_ts"] + timedelta(days=b),
                             html=base["html"], lang=base["lang"]))
    return rows


# ---------------------------------------------------------------------------
# Materialization to parquet (local loop; bench scale goes via Spark —
# see generate_web_pages_distributed).

def write_fixtures(out_dir: str, scale: str = "tiny") -> dict[str, str]:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    cfg = FixtureConfig.for_scale(scale)
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    def dump(name: str, rows: list[dict], schema: pa.Schema | None = None):
        tbl = pa.Table.from_pylist(rows, schema=schema)
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, path)
        paths[name] = path

    pages_schema = pa.schema(
        [("url", pa.string()), ("warc_ts", pa.timestamp("us", tz="UTC")),
         ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string())]
    )
    dump("web_pages", [page_row(i, cfg) for i in range(cfg.n_pages)], pages_schema)
    dump("alias_dict", alias_rows(cfg))
    golden_schema = pa.schema(
        [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
         ("obj_lang", pa.string()), ("graph", pa.string())]
    )
    dump("golden_triples", golden_rows(cfg), golden_schema)
    dump(
        "golden_text",
        [
            dict(url=page_url(i, cfg),
                 text=expected_text(i, cfg),
                 text_sha256=hashlib.sha256(
                     (expected_text(i, cfg) or "").encode()).hexdigest())
            for i in range(cfg.n_pages)
        ],
    )
    inc_schema = pa.schema(
        [("batch_id", pa.int32()), ("url", pa.string()),
         ("warc_ts", pa.timestamp("us", tz="UTC")), ("html", pa.binary()),
         ("lang", pa.string())]
    )
    dump("increments", increment_rows(cfg), inc_schema)
    return paths


def generate_web_pages_distributed(spark, cfg: FixtureConfig, out_path: str):
    """Bench-scale generation: the same pure page_row over a Spark range
    via mapInPandas — order-independent by construction, so distributed
    output is byte-identical with the local loop."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [page_row(int(i), cfg) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    schema = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    (spark.range(cfg.n_pages).repartition(64)
     .mapInPandas(gen, schema=schema)
     .write.mode("overwrite").parquet(out_path))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="tiny", choices=["tiny", "small", "bench"])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    for name, path in write_fixtures(args.out, args.scale).items():
        print(name, "->", path)
