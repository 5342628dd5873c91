"""Update operators U2 (DELETE DATA), U3 (DELETE/INSERT rewrite),
T7 (orphan cleanup) — quick-reference.md:228-243, app.py:242-272."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgap_spark import schemas as S
from kgap_spark.triples import TripleStore


def _quads(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, None, None, g, None) for s, p, o, g in rows], S.TRIPLES
    )


def test_delete_quads(spark, tmp_path):
    store = TripleStore(spark, str(tmp_path / "t"))
    store.append(_quads(spark, [
        ("a", "p", "1", "urn:g:1"), ("b", "p", "2", "urn:g:1"),
        ("c", "p", "3", "urn:g:2"), ("d", "p", "4", "urn:g:3"),
    ]))
    # delete one quad from g1 and the only quad of g3
    store.delete_quads(_quads(spark, [
        ("a", "p", "1", "urn:g:1"), ("d", "p", "4", "urn:g:3"),
    ]))
    left = {(r.subj, r.graph) for r in store.read().collect()}
    assert left == {("b", "urn:g:1"), ("c", "urn:g:2")}
    # idempotent: deleting already-deleted quads is a no-op
    store.delete_quads(_quads(spark, [("a", "p", "1", "urn:g:1")]))
    assert store.read().count() == 2


def test_rewrite_predicate(spark, tmp_path):
    store = TripleStore(spark, str(tmp_path / "t"))
    store.append(_quads(spark, [
        ("a", "old:p", "1", "urn:g:1"), ("b", "keep:p", "2", "urn:g:1"),
        ("c", "old:p", "3", "urn:g:2"), ("d", "keep:p", "4", "urn:g:3"),
    ]))
    store.rewrite("old:p", "new:p")
    preds = {(r.subj, r.pred) for r in store.read().collect()}
    assert preds == {("a", "new:p"), ("b", "keep:p"), ("c", "new:p"), ("d", "keep:p")}


def test_cleanup_orphan_graphs(spark, tmp_path):
    store = TripleStore(spark, str(tmp_path / "t"))
    store.append(_quads(spark, [
        ("a", "p", "1", "urn:g:1"), ("b", "p", "2", "urn:g:2"),
        ("c", "p", "3", "urn:g:3"),
    ]))
    dropped = store.cleanup_orphan_graphs(["urn:g:1", "urn:g:3"])
    assert dropped == ["urn:g:2"]
    assert {r.graph for r in store.read().collect()} == {"urn:g:1", "urn:g:3"}
