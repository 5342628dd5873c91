"""TripleStore write semantics: append / overwrite / merge / delete
(the Replication vs Sync modes, ldes-consumer/README.md:147-149)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgap_spark import schemas as S
from kgap_spark.triples import TripleStore


def _quads(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, None, None, g, None) for s, p, o, g in rows], S.TRIPLES
    )


def test_append_overwrite_merge_delete(spark, tmp_path):
    store = TripleStore(spark, str(tmp_path / "t"))
    g1, g2 = "urn:g:1", "urn:g:2"

    store.append(_quads(spark, [("a", "p", "1", g1), ("b", "p", "2", g2)]))
    assert store.read().count() == 2

    # append mode adds (Replication: additions only — duplicates allowed)
    store.append(_quads(spark, [("a", "p", "1", g1)]))
    assert store.read().count() == 3

    # overwrite_graphs replaces only the graphs present in the update
    store.overwrite_graphs(_quads(spark, [("a", "p", "9", g1)]))
    got = {(r.subj, r.obj, r.graph) for r in store.read().collect()}
    assert got == {("a", "9", g1), ("b", "2", g2)}

    # merge (Sync): quad-level upsert, idempotent
    store.merge(_quads(spark, [("a", "p", "9", g1), ("c", "p", "3", g1)]))
    store.merge(_quads(spark, [("c", "p", "3", g1)]))
    assert store.read_graph(g1).count() == 2

    # graph-scoped delete
    store.delete_graph(g1)
    assert store.read_graph(g1).count() == 0
    assert store.read_graph(g2).count() == 1

    # counts_by_graph over what's left
    rows = store.counts_by_graph().collect()
    assert [(r.graph, r.n_triples) for r in rows] == [(g2, 1)]


def test_merge_appends_delta_without_rewriting_existing_files(spark, tmp_path):
    """Sync-mode merge is append-only: merging a small delta into a
    large graph must leave every pre-existing parquet file untouched
    (no O(graph) partition rewrite), add only the new quads, and stay
    idempotent."""
    import os

    store = TripleStore(spark, str(tmp_path / "t3"))
    g = "urn:g:big"
    base = _quads(spark, [(f"s{i}", "p", str(i), g) for i in range(5000)])
    store.append(base)

    def file_states(root):
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    st = os.stat(p)
                    out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = file_states(tmp_path / "t3")
    assert before  # sanity: base files exist

    # delta: 1 duplicate (dropped) + 2 new quads
    store.merge(
        _quads(
            spark,
            [("s0", "p", "0", g), ("new1", "p", "x", g), ("new2", "p", "y", g)],
        )
    )
    after = file_states(tmp_path / "t3")
    # every original file survives byte-identical (same size+mtime)
    for p, sig in before.items():
        assert after.get(p) == sig, f"pre-existing file rewritten: {p}"
    assert len(after) > len(before)  # the delta landed in new files
    assert store.read_graph(g).count() == 5002

    # idempotence: re-merging the same delta adds nothing
    store.merge(_quads(spark, [("new1", "p", "x", g), ("new2", "p", "y", g)]))
    assert store.read_graph(g).count() == 5002
    # and still no rewrite of the original files
    final = file_states(tmp_path / "t3")
    for p, sig in before.items():
        assert final.get(p) == sig


def test_compact_collapses_merge_fragments(spark, tmp_path):
    """Repeated append-only merges fragment a partition into many
    small files; compact() rewrites it to the canonical layout with
    identical content."""
    store = TripleStore(spark, str(tmp_path / "t4"))
    g = "urn:g:frag"
    store.append(_quads(spark, [(f"s{i}", "p", str(i), g) for i in range(100)]))
    for j in range(6):  # six delta merges → six file batches
        store.merge(_quads(spark, [(f"d{j}", "p", str(j), g)]))
    before_rows = {(r.subj, r.obj) for r in store.read_graph(g).collect()}

    stats = store.compact([g])
    assert stats["files_before"] > stats["files_after"]
    after_rows = {(r.subj, r.obj) for r in store.read_graph(g).collect()}
    assert after_rows == before_rows
    assert len(after_rows) == 106


def test_quad_key_distinguishes_lang_and_datatype(spark, tmp_path):
    """'Paris'@en and 'Paris'@fr are distinct statements: merge must
    keep both and delete_quads must remove only the named term."""
    from kgap_spark import schemas as S

    store = TripleStore(spark, str(tmp_path / "t5"))
    g = "urn:g:l"
    r = lambda lang, dt=None: ("s", "rdfs:label", "Paris", lang, dt, g, None)
    store.merge(spark.createDataFrame([r("en")], S.TRIPLES))
    store.merge(spark.createDataFrame([r("fr")], S.TRIPLES))
    store.merge(spark.createDataFrame([r(None, "xsd:string")], S.TRIPLES))
    store.merge(spark.createDataFrame([r("en")], S.TRIPLES))  # idempotent
    got = {(x.obj_lang, x.obj_datatype) for x in store.read_graph(g).collect()}
    assert got == {("en", None), ("fr", None), (None, "xsd:string")}

    store.delete_quads(spark.createDataFrame([r("en")], S.TRIPLES))
    got = {(x.obj_lang, x.obj_datatype) for x in store.read_graph(g).collect()}
    assert got == {("fr", None), (None, "xsd:string")}


def test_graph_iri_with_fragment_clears(spark, tmp_path):
    """'#' is in Hive's partition-escape set: delete_graph/compact must
    find the directory Spark actually wrote (data-resurrection guard)."""
    store = TripleStore(spark, str(tmp_path / "t6"))
    g = "http://example.org/ns#g1"
    store.append(_quads(spark, [("a", "p", "1", g), ("b", "p", "2", "urn:ok")]))
    assert store.read_graph(g).count() == 1
    store.delete_graph(g)
    assert store.read_graph(g).count() == 0
    assert store.read_graph("urn:ok").count() == 1
    # compact sees the escaped dir too
    stats = store.compact(["urn:ok"])
    assert stats["files_before"] > 0


def test_null_graph_fails_loudly(spark, tmp_path):
    """A NULL graph would silently land in Hive's default partition and
    break merge pruning — the write must raise instead."""
    import pytest as _pytest

    store = TripleStore(spark, str(tmp_path / "t7"))
    bad = spark.createDataFrame(
        [("s", "p", "o", None, None, None, None)],
        "subj string, pred string, obj string, obj_lang string, "
        "obj_datatype string, graph string, src_url string",
    )
    with _pytest.raises(Exception, match="NULL graph"):
        store.append(bad)


def test_partition_pruning_in_plan(spark, tmp_path):
    """read_graph must prune to one partition (PartitionFilters in the
    scan, not a post-scan filter)."""
    store = TripleStore(spark, str(tmp_path / "t2"))
    store.append(
        _quads(spark, [("a", "p", "1", "urn:g:1"), ("b", "p", "2", "urn:g:2")])
    )
    plan = store.read_graph("urn:g:1")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "urn:g:1" in plan


def test_store_ops_work_with_uri_scheme(spark, tiny, tmp_path):
    """Metadata ops route through the Hadoop FS API: the same store code
    must work when the path carries an explicit scheme (file:// here;
    s3a://hdfs:// in production — os.path would silently fail)."""
    from kgap_spark.triples import TripleStore, build_triples

    store = TripleStore(spark, f"file://{tmp_path}/t")
    assert store.exists() is False
    triples = build_triples(tiny["web_pages"], tiny["alias_dict"]).localCheckpoint(True)
    store.overwrite_graphs(triples)
    assert store.exists() is True
    graphs = [r.graph for r in store.read().select("graph").distinct().collect()]
    g = sorted(graphs)[0]
    store.delete_graph(g)
    remaining = {r.graph for r in store.read().select("graph").distinct().collect()}
    assert g not in remaining and len(remaining) == len(graphs) - 1


def test_write_layout_is_range_partitioned(spark, tiny):
    """The write shuffle must be RangePartitioning on (graph, subj):
    balanced tasks + hub-graph splitting + bounded file count."""
    from kgap_spark.triples import TripleStore, build_triples

    store = TripleStore(spark, "/tmp/unused-layout-probe")
    prepped = store._prep(build_triples(tiny["web_pages"], tiny["alias_dict"]))
    plan = prepped._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(graph" in plan.lower().replace(" ", "").replace("#", "")[:100000] or "RangePartitioning" in plan


def test_write_layout_splits_hub_graph_bounds_files(spark, tmp_path):
    """Zipfian feeds: one hub graph 100x bigger than the rest. The range
    layout must (a) split the hub across multiple files (no one-task
    straggler) and (b) keep total file count ~ graphs + tasks, never
    tasks x graphs."""
    import glob

    from pyspark.sql import functions as F

    from kgap_spark.triples import TripleStore

    hub = spark.range(0, 100_000).select(
        F.concat(F.lit("urn:s:"), F.col("id")).alias("subj"),
        F.lit("p").alias("pred"), F.lit("o").alias("obj"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit("urn:hub").alias("graph"),
        F.lit(None).cast("string").alias("src_url"),
    )
    small = spark.range(0, 1000).select(
        F.concat(F.lit("urn:t:"), F.col("id")).alias("subj"),
        F.lit("p").alias("pred"), F.lit("o").alias("obj"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.concat(F.lit("urn:g"), (F.col("id") % 20)).alias("graph"),
        F.lit(None).cast("string").alias("src_url"),
    )
    store = TripleStore(spark, str(tmp_path / "t"))
    store.overwrite_graphs(hub.unionByName(small))

    hub_files = glob.glob(str(tmp_path / "t" / "graph=urn%3Ahub" / "*.parquet"))
    all_files = glob.glob(str(tmp_path / "t" / "graph=*" / "*.parquet"))
    n_tasks = max(spark.sparkContext.defaultParallelism * 2, 16)
    assert len(hub_files) > 1                       # hub is split
    assert len(all_files) <= 21 + n_tasks           # bounded, not tasks*graphs
    assert store.read().count() == 101_000


def test_merge_many_graphs_broadcast_fallback(spark, tmp_path, monkeypatch):
    """ADVICE r3: past MAX_GRAPH_LIST distinct graphs the merge/delete
    scan pruning switches from a driver-side In-list to a broadcast
    semi-join — same results, bounded driver memory."""
    store = TripleStore(spark, str(tmp_path / "t"))
    monkeypatch.setattr(TripleStore, "MAX_GRAPH_LIST", 3)
    rows = [(f"s{i}", "p", str(i), f"urn:g:{i}") for i in range(8)]
    store.merge(_quads(spark, rows))
    # second merge over >MAX graphs: fallback path, still idempotent
    store.merge(_quads(spark, rows + [("s8", "p", "8", "urn:g:8")]))
    assert store.read().count() == 9
    # delete across >MAX graphs drives the same fallback + emptied-graph
    # cleanup collects only emptied graphs
    dels = _quads(spark, [(f"s{i}", "p", str(i), f"urn:g:{i}")
                          for i in range(5)])
    store.delete_quads(dels.select(
        "subj", "pred", "obj", "obj_lang", "obj_datatype", "graph"
    ))
    left = {r.graph for r in store.read().select("graph").distinct().collect()}
    assert left == {f"urn:g:{i}" for i in range(5, 9)}


def test_merge_auto_compacts_past_threshold(spark, tmp_path):
    """VERDICT r3 #7: repeated small merges fragment a graph; once its
    file count passes compact_threshold the merge auto-compacts it —
    file count drops back to ~tasks, results unchanged."""
    store = TripleStore(spark, str(tmp_path / "t"), files_per_graph=2,
                        compact_threshold=5)
    g = "urn:g:feed"
    for i in range(8):
        store.merge(_quads(spark, [(f"s{i}", "p", str(i), g)]))
    # every merge appended ≥1 file; the trigger compacted back to the
    # canonical 2-file layout whenever the count passed 5
    assert store._n_graph_files(g) <= 6
    got = {(r.subj, r.obj) for r in store.read_graph(g).collect()}
    assert got == {(f"s{i}", str(i)) for i in range(8)}

    # threshold=None disables the trigger: fragments accumulate
    store2 = TripleStore(spark, str(tmp_path / "t2"), files_per_graph=2,
                         compact_threshold=None)
    for i in range(8):
        store2.merge(_quads(spark, [(f"s{i}", "p", str(i), g)]))
    assert store2._n_graph_files(g) >= 7


def test_merge_reports_compaction_events(spark, tmp_path):
    """Round-5 observability: merge() returns (and keeps on
    last_compactions) per-graph {graph, files_before, files_after}
    accounting whenever the auto-compaction trigger fires — the
    write-amplification signal an operator watches on Sync cycles."""
    store = TripleStore(spark, str(tmp_path / "t"), files_per_graph=2,
                        compact_threshold=3)
    g = "urn:g:feed"
    fired = []
    for i in range(6):
        stats = store.merge(_quads(spark, [(f"s{i}", "p", str(i), g)]))
        # the very first merge takes the fresh-store fast path (no
        # graph-list collect) and reports graphs=None
        assert stats["graphs"] == (None if i == 0 else 1)
        assert stats["compacted"] == store.last_compactions
        fired.extend(stats["compacted"])
    assert fired, "threshold=3 over 6 single-file merges must trigger"
    for ev in fired:
        assert ev["graph"] == g
        assert ev["files_before"] > 3
        assert ev["files_after"] <= ev["files_before"]
    # a merge that does not trigger reports an empty event list
    store2 = TripleStore(spark, str(tmp_path / "t2"), files_per_graph=2,
                         compact_threshold=None)
    stats = store2.merge(_quads(spark, [("s", "p", "o", g)]))
    assert stats["compacted"] == [] and store2.last_compactions == []
