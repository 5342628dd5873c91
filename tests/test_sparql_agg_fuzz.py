"""Differential fuzz for the SPARQL aggregation pipeline (round 6):
GROUP BY (plain and computed ``(STRLEN(?v) AS ?k)`` keys, including
keys-only groupings with NO aggregate anywhere — the empty-agg crash
found by review), COUNT/COUNT DISTINCT/SUM/MIN/MAX, and general
HAVING expressions vs a naive reference evaluator.

The reference mirrors the ENGINE's documented numeric conventions
(the store keeps lexical forms): SUM casts by value and SKIPS
non-numerics (Spark sum-over-NULL; strict SPARQL would error the
group — documented divergence), MIN/MAX compare lexically over the
stored strings, unbound aggregate args are skipped, and an all-NULL
SUM is unbound. Grouping keys group NULLs together (both systems).
Everything else — grouping itself, COUNT semantics, HAVING's
three-valued filter, implicit single group (also over an EMPTY
solution set: one row, COUNT=0) — is strict §18.2.4/§11.
"""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

_EXAMPLES = int(os.environ.get("KGAP_FUZZ_EXAMPLES", "30"))

_SUBJECTS = [f"u:s{i}" for i in range(3)]
_PREDS = [f"u:p{i}" for i in range(2)]
# objects: IRIs, plain strings, and numeric-lexical literals so SUM's
# try_cast path sees both parseable and unparseable values
_OBJECTS = ["u:o0", "lit a", "1", "2", "10"]
_VARS = ["x", "y", "z"]


def _is_iri(v: str) -> bool:
    return v.startswith("u:")


def _render_term(t) -> str:
    if isinstance(t, tuple):
        return f"?{t[1]}"
    return f"<{t}>" if _is_iri(t) else f'"{t}"'


_term_st = st.one_of(
    st.sampled_from([("var", v) for v in _VARS]),
    st.sampled_from(_OBJECTS),
)
_subj_st = st.one_of(
    st.sampled_from([("var", v) for v in _VARS]),
    st.sampled_from(_SUBJECTS),
)
_pattern_st = st.tuples(_subj_st, st.sampled_from(_PREDS), _term_st)

_kb_st = st.lists(
    st.tuples(st.sampled_from(_SUBJECTS), st.sampled_from(_PREDS),
              st.sampled_from(_OBJECTS)),
    min_size=0, max_size=12, unique=True,
)

# (fn, distinct) — SAMPLE/GROUP_CONCAT excluded (engine makes them
# deterministic via MIN/sort; fair game but not SPARQL-differential)
_agg_st = st.sampled_from([
    ("COUNT", "*", False), ("COUNT", "v", False), ("COUNT", "v", True),
    ("SUM", "v", False), ("MIN", "v", False), ("MAX", "v", False),
])

_having_st = st.one_of(
    st.none(),
    st.tuples(st.just("count_ge"), st.integers(0, 3)),
    st.tuples(st.just("sum_gt"), st.integers(0, 12)),
    st.tuples(st.just("count_and_sum"), st.integers(0, 2),
              st.integers(0, 12)),
)

_case_st = st.tuples(
    _kb_st,
    st.lists(_pattern_st, min_size=1, max_size=2),
    # group keys: each either a plain ?var or a computed
    # (STRLEN(?var) AS ?kN) key (exercises the materialize-before-
    # grouping path and the keys-only/no-aggregate fix, round 6)
    st.lists(st.sampled_from(["plain", "strlen"]),
             min_size=0, max_size=2),
    st.lists(_agg_st, min_size=0, max_size=2),
    _having_st,
)


# ---------------------------------------------------------------------------
# naive reference

def _match(kb, pat, mu):
    out = []
    for row in kb:
        ext = dict(mu)
        ok = True
        for term, val in zip(pat, row):
            if isinstance(term, tuple):
                name = term[1]
                if name in ext:
                    if ext[name] != val:
                        ok = False
                        break
                else:
                    ext[name] = val
            elif term != val:
                ok = False
                break
        if ok:
            out.append(ext)
    return out


def _num(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def _ref_agg(fn, arg, distinct, group, var):
    if fn == "COUNT" and arg == "*":
        return len(group)
    vals = [mu[var] for mu in group if var in mu]
    if fn == "COUNT":
        return len(set(vals)) if distinct else len(vals)
    if fn == "SUM":
        nums = [n for v in vals if (n := _num(v)) is not None]
        return sum(nums) if nums else None
    if not vals:
        return None
    return max(vals) if fn == "MAX" else min(vals)


def _ref_eval(kb, pats, keys, aggs, agg_var, having):
    sols = [{}]
    for pat in pats:
        sols = [m for mu in sols for m in _match(kb, pat, mu)]
    groups: dict[tuple, list] = {}
    for mu in sols:
        k = tuple(
            (len(mu[v]) if v in mu else None) if kind == "strlen"
            else mu.get(v)
            for kind, v in keys
        )
        groups.setdefault(k, []).append(mu)
    if not keys and not groups:
        groups[()] = []  # implicit single group over empty solutions
    rows = []
    for k, group in groups.items():
        vals = [_ref_agg(fn, arg, dis, group, agg_var)
                for fn, arg, dis in aggs]
        if having is not None:
            count = len(group)
            nums = [n for mu in group if agg_var in mu
                    and (n := _num(mu[agg_var])) is not None]
            ssum = sum(nums) if nums else None
            if having[0] == "count_ge":
                if not count >= having[1]:
                    continue
            elif having[0] == "sum_gt":
                # NULL sum → three-valued comparison → drop
                if ssum is None or not ssum > having[1]:
                    continue
            else:
                if not (count >= having[1]
                        and ssum is not None and ssum > having[2]):
                    continue
        rows.append(k + tuple(vals))
    return rows


# ---------------------------------------------------------------------------

def _render(pats, keys, aggs, agg_var, having) -> str:
    sel, gb = [], []
    for i, (kind, v) in enumerate(keys):
        if kind == "plain":
            sel.append(f"?{v}")
            gb.append(f"?{v}")
        else:
            sel.append(f"?k{i}")
            gb.append(f"(STRLEN(?{v}) AS ?k{i})")
    for i, (fn, arg, dis) in enumerate(aggs):
        inner = "*" if arg == "*" else (
            f"DISTINCT ?{agg_var}" if dis else f"?{agg_var}")
        sel.append(f"({fn}({inner}) AS ?a{i})")
    body = " ".join(
        " ".join(_render_term(t) for t in pat) + " ." for pat in pats
    )
    q = f"SELECT {' '.join(sel)} WHERE {{ {body} }}"
    if keys:
        q += " GROUP BY " + " ".join(gb)
    if having is not None:
        if having[0] == "count_ge":
            q += f" HAVING (COUNT(*) >= {having[1]})"
        elif having[0] == "sum_gt":
            q += f" HAVING (SUM(?{agg_var}) > {having[1]})"
        else:
            q += (f" HAVING (COUNT(*) >= {having[1]} && "
                  f"SUM(?{agg_var}) > {having[2]})")
    return q


def _norm(v):
    if v is None:
        return ("\x00none",)
    if isinstance(v, float):
        return ("f", round(v, 6))
    if isinstance(v, int):
        return ("f", round(float(v), 6))
    return ("s", v)


@given(_case_st)
@settings(max_examples=_EXAMPLES, deadline=None)
def test_aggregation_agrees_with_naive_evaluator(spark, case):
    kb, pats, key_kinds, aggs, having = case
    bound = sorted({t[1] for pat in pats for t in pat
                    if isinstance(t, tuple)})
    if not bound:
        return  # need at least one variable for agg args
    agg_var = bound[0]
    keys = list(zip(key_kinds, bound[1:1 + len(key_kinds)]))
    if not keys and not aggs:
        return  # empty projection — not a well-formed query
    # HAVING's SUM needs the agg var; COUNT-only forms always fine
    query = _render(pats, keys, aggs, agg_var, having)

    from kgap_spark import schemas as S
    from kgap_spark.query.sparql import execute_sparql

    rows = [(s, p, o, None, None, "urn:g", None) for s, p, o in kb]
    t = spark.createDataFrame(rows, S.TRIPLES)

    df = execute_sparql(t, query)
    cols = [v if kind == "plain" else f"k{i}"
            for i, (kind, v) in enumerate(keys)]
    cols += [f"a{i}" for i in range(len(aggs))]
    got = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()),
    )
    expected = sorted(
        tuple(_norm(v) for v in row)
        for row in _ref_eval(kb, pats, keys, aggs, agg_var, having)
    )
    assert got == expected, (
        f"divergence on {query!r}\nKB={kb}\nspark={got}\nnaive={expected}"
    )
