"""Differential fuzz for SPARQL property paths: the engine's path
compiler (`_path_pairs` / `_arm_rel` / `_transitive_pairs`) vs a
spec-faithful naive evaluator of §18.4 — link/inverse/sequence as bag
joins, alternation as MULTISET union (a repeated arm duplicates its
matches), +/*/? as the duplicate-free ALP closure with ZeroLengthPath
identity over the graph's terms ∪ any constant endpoint.

Hypothesis generates a tiny edge KB and a random path AST from the
grammar the engine supports (probed shapes: links, ^, +/*/?,
two-element sequences with per-element modifiers/inverses, bare and
parenthesized alternations, (seq)+ and (alt)+ closures, and negated
property sets — !(p), !(^p), mixed !(p|^q) — standalone, inverted,
under modifiers, in sequences, and as alternation arms), renders it
to SPARQL text, and compares solution BAGS for all four endpoint
shapes (var-var, const-var, var-const, const-const as ASK).

Found by this fuzz (fixed in the same commit): repeated arms in an
all-simple alternation were deduped by the isin fast path —
`p0|p1|p0` returned each p0 edge once instead of twice.
"""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

_EXAMPLES = int(os.environ.get("KGAP_FUZZ_EXAMPLES", "25"))

_NODES = ["u:n0", "u:n1", "u:n2", "u:n3"]
_PREDS = ["u:p0", "u:p1"]

# ---------------------------------------------------------------------------
# path AST: ("link",p) | ("inv",ast) | ("mod",ast,"+|*|?") |
#           ("seq",a,b) | ("alt",arm,...)

_link_st = st.sampled_from([("link", p) for p in _PREDS])
# negated property sets: ("nps", fwd_preds, rev_preds) — !(p0),
# !(^p1), !(p0|^p1), … (round 6: NPS now composes with modifiers,
# alternation arms, sequences, and inverses)
_nps_st = st.tuples(
    st.lists(st.sampled_from(_PREDS), max_size=2, unique=True),
    st.lists(st.sampled_from(_PREDS), max_size=2, unique=True),
).filter(lambda t: t[0] or t[1]).map(
    lambda t: ("nps", tuple(t[0]), tuple(t[1]))
)
_atom_st = st.one_of(
    _link_st, _link_st.map(lambda l: ("inv", l)), _nps_st,
    _nps_st.map(lambda n: ("inv", n)),
)
_modded_st = st.tuples(
    st.just("mod"), _atom_st, st.sampled_from(["+", "*", "?"])
).map(tuple)
_seq_elt_st = st.one_of(_atom_st, _modded_st)
_seq_st = st.tuples(st.just("seq"), _seq_elt_st, _seq_elt_st).map(tuple)
_arm_st = st.one_of(_atom_st, _modded_st, _seq_st)
_alt_st = st.builds(
    lambda arms: ("alt",) + tuple(arms),
    st.lists(_arm_st, min_size=2, max_size=3),
)
# closures over composite bodies: (p0/p1)+ and (p0|p1)+
_closed_comp_st = st.tuples(
    st.just("mod"),
    st.one_of(
        st.tuples(st.just("seq"), _link_st, _link_st).map(tuple),
        st.builds(lambda arms: ("alt",) + tuple(arms),
                  st.lists(_link_st, min_size=2, max_size=2)),
    ),
    st.sampled_from(["+", "*"]),
).map(tuple)

_path_st = st.one_of(_arm_st, _alt_st, _closed_comp_st)

_kb_st = st.lists(
    st.tuples(st.sampled_from(_NODES), st.sampled_from(_PREDS),
              st.sampled_from(_NODES)),
    min_size=0, max_size=8, unique=True,
)

_endpoints_st = st.sampled_from(
    [("var", "var"), ("const", "var"), ("var", "const"),
     ("const", "const")]
)
_const_st = st.sampled_from(_NODES + ["u:absent"])


def _render_path(ast, top: bool = True) -> str:
    k = ast[0]
    if k == "link":
        return f"<{ast[1]}>"
    if k == "inv":
        return "^" + _render_path(ast[1], top=False)
    if k == "mod":
        inner = _render_path(ast[1], top=False)
        if ast[1][0] == "seq":  # alt self-parenthesizes at non-top
            inner = f"({inner})"
        return inner + ast[2]
    if k == "seq":
        return "/".join(_render_path(a, top=False) for a in ast[1:])
    if k == "alt":
        s = "|".join(_render_path(a, top=False) for a in ast[1:])
        return s if top else f"({s})"
    if k == "nps":
        members = [f"<{p}>" for p in ast[1]] + [f"^<{p}>" for p in ast[2]]
        return f"!({'|'.join(members)})" if len(members) > 1 \
            else f"!{members[0]}"
    raise AssertionError(k)


# ---------------------------------------------------------------------------
# spec-faithful naive evaluator — the STRICT §18.4 algebra, endpoint-
# aware. Crucially, SequencePath translates to a join through a FRESH
# variable (Path(X,P,?V) ⋈ Path(?V,Q,Y)), so a constant endpoint's
# ZeroLengthPath identity does NOT leak across the junction: on an
# empty graph, `<n0> <p>*/<p>* ?y` is EMPTY per the algebra (the
# var–var closure ranges over terms(G) only), even though an
# operational engine that substitutes bindings left-to-right (Jena-
# style) would return (n0). The engine implements the algebra.

_VAR = ("var",)  # sentinel: a free endpoint


def _ev(kb, ast, X, Y) -> list[tuple[str, str]]:
    """Bag of (x, y) endpoint pairs for the path pattern Path(X, ast,
    Y) — X/Y either the _VAR sentinel or a constant term."""
    k = ast[0]
    nodes = {s for (s, _, _) in kb} | {o for (_, _, o) in kb}
    if k == "link":
        pairs = [(s, o) for (s, p, o) in kb if p == ast[1]]
        return _ends(pairs, X, Y)
    if k == "nps":
        # §9.1 union rewrite: forward arm (pred ∉ fwd set, absent when
        # every member is inverse) ∪ swapped inverse arm (pred ∉ rev
        # set) — one row per matching TRIPLE (bag)
        fwd, rev = ast[1], ast[2]
        pairs = []
        if fwd:
            pairs += [(s, o) for (s, p, o) in kb if p not in fwd]
        if rev:
            pairs += [(o, s) for (s, p, o) in kb if p not in rev]
        return _ends(pairs, X, Y)
    if k == "inv":
        return [(b, a) for (a, b) in _ev(kb, ast[1], Y, X)]
    if k == "seq":
        A = _ev(kb, ast[1], X, _VAR)
        B = _ev(kb, ast[2], _VAR, Y)
        return [(a, d) for (a, b) in A for (c, d) in B if b == c]
    if k == "alt":
        acc: list = []
        for arm in ast[1:]:
            acc.extend(_ev(kb, arm, X, Y))
        return acc
    if k == "mod":
        rel = set(_ev(kb, ast[1], _VAR, _VAR))
        if ast[2] in ("+", "*"):
            clo = set(rel)
            while True:
                new = {(a, d) for (a, b) in clo for (c, d) in rel
                       if b == c} - clo
                if not new:
                    break
                clo |= new
        else:
            clo = set(rel)
        if ast[2] in ("*", "?"):
            # ZeroLengthPath: identity over terms(G); a CONSTANT
            # endpoint adds its own (c, c) (§18.4 — ZeroLengthPath
            # holds for any term, graph membership irrelevant)
            ident = {(t, t) for t in nodes}
            if X is not _VAR:
                ident.add((X, X))
            if Y is not _VAR:
                ident.add((Y, Y))
            clo = clo | ident
        return _ends(list(clo), X, Y)
    raise AssertionError(k)


def _ends(pairs, X, Y):
    if X is not _VAR:
        pairs = [(a, b) for (a, b) in pairs if a == X]
    if Y is not _VAR:
        pairs = [(a, b) for (a, b) in pairs if b == Y]
    return pairs


def _expected(kb, ast, s_kind, o_kind, s_const, o_const):
    X = s_const if s_kind == "const" else _VAR
    Y = o_const if o_kind == "const" else _VAR
    return _ev(kb, ast, X, Y)


# ---------------------------------------------------------------------------

_case_st = st.tuples(_kb_st, _path_st, _endpoints_st, _const_st, _const_st)


@settings(max_examples=_EXAMPLES, deadline=None)
@given(case=_case_st)
def test_path_engine_agrees_with_naive_evaluator(spark, case):
    from kgap_spark import schemas as S
    from kgap_spark.query.sparql import execute_sparql

    kb, ast, (s_kind, o_kind), s_const, o_const = case
    rows = [(s, p, o, None, None, "urn:g", None) for (s, p, o) in kb]
    triples = (
        spark.createDataFrame(rows, S.TRIPLES) if rows
        else spark.createDataFrame([], S.TRIPLES)
    )
    path_txt = _render_path(ast)
    s_t = f"<{s_const}>" if s_kind == "const" else "?x"
    o_t = f"<{o_const}>" if o_kind == "const" else "?y"
    expected = _expected(kb, ast, s_kind, o_kind, s_const, o_const)

    if s_kind == "const" and o_kind == "const":
        got = execute_sparql(
            triples, f"ASK {{ {s_t} {path_txt} {o_t} }}"
        )
        assert got is (len(expected) > 0), (
            f"ASK {{ {s_t} {path_txt} {o_t} }} on {kb}: engine={got} "
            f"naive={sorted(expected)}"
        )
        return

    proj = [v for v, k in (("?x", s_kind), ("?y", o_kind)) if k == "var"]
    df = execute_sparql(
        triples,
        f"SELECT {' '.join(proj)} WHERE {{ {s_t} {path_txt} {o_t} }}",
    )
    got_rows = df.collect()
    if s_kind == "const":
        got = sorted((s_const, r.y) for r in got_rows)
    elif o_kind == "const":
        got = sorted((r.x, o_const) for r in got_rows)
    else:
        got = sorted((r.x, r.y) for r in got_rows)
    assert got == sorted(expected), (
        f"{s_t} {path_txt} {o_t} on {sorted(kb)}:\n"
        f"engine={got}\nnaive ={sorted(expected)}"
    )
