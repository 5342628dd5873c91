"""Resume/idempotence (SURVEY §5 tier 3; T3 exactly-once semantics):
kill after some graphs, rerun, assert no dupes + complete lineage."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgap_spark.lineage import LineageLog, run_pipeline_resumable
from kgap_spark.metrics import precision_recall
from kgap_spark.triples import TripleStore


def test_fail_resume_idempotent(spark, tiny, tmp_path):
    store = TripleStore(spark, str(tmp_path / "triples"))
    lin = LineageLog(spark, str(tmp_path / "lineage"))
    pages, alias = tiny["web_pages"], tiny["alias_dict"]

    fail = {"urn:kgap:ldes:site001", "urn:kgap:ldes:site005"}
    r1 = run_pipeline_resumable(spark, pages, alias, store, lin, fail_graphs=fail)
    assert set(r1["graphs_failed"]) == fail
    assert not (set(r1["graphs_done"]) & fail)

    # resume: only the failed graphs get processed
    r2 = run_pipeline_resumable(spark, pages, alias, store, lin)
    assert set(r2["graphs_done"]) == fail

    # third run: nothing pending
    r3 = run_pipeline_resumable(spark, pages, alias, store, lin)
    assert r3["graphs_done"] == []

    # no duplicate quads; full P/R vs golden
    t = store.read()
    assert t.count() == t.dropDuplicates(["subj", "pred", "obj", "graph"]).count()
    pr = precision_recall(t, tiny["golden_triples"])
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0

    # lineage: every page graph has an ok row; the failures are recorded
    ldf = lin.read()
    ok_graphs = {r.graph for r in ldf.filter(F.col("status") == "ok").collect()}
    all_graphs = {
        r.g for r in pages.select(
            F.concat(F.lit("urn:kgap:ldes:"),
                     F.regexp_extract("url", r"https://([^.]+)\.", 1)).alias("g")
        ).distinct().collect()
    }
    assert all_graphs <= ok_graphs
    failed_rows = ldf.filter(F.col("status") == "failed")
    assert {r.graph for r in failed_rows.collect()} == fail


def test_latest_wins_increments(spark, tiny, tmp_path):
    """Versioned-member materialization (U6): processing the increments
    fixture batch-by-batch with merge keeps one latest row per url."""
    from pyspark.sql import Window

    inc = tiny["increments"]
    # materialize latest-per-url (MATERIALIZE=true semantics)
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc("batch_id"))
    latest = (
        inc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    assert latest.count() == inc.select("url").distinct().count()
    # latest warc_ts per url matches a plain max
    mx = inc.groupBy("url").agg(F.max("warc_ts").alias("mx"))
    joined = latest.join(mx, "url").filter(F.col("warc_ts") != F.col("mx"))
    assert joined.count() == 0


def test_per_graph_wall_time_attribution(spark, tiny, tmp_path):
    """Graphs in ONE run get per-graph wall_ms apportioned by their
    share of the work, not a duplicated run-level figure — feeds with
    different sizes must show different costs (per-feed log analog)."""
    store = TripleStore(spark, str(tmp_path / "triples"))
    lin = LineageLog(spark, str(tmp_path / "lineage"))
    run_pipeline_resumable(spark, tiny["web_pages"], tiny["alias_dict"], store, lin)
    rows = lin.read().filter(F.col("status") == "ok").collect()
    by_graph = {r.graph: r for r in rows}
    assert len(by_graph) > 2
    walls = {g: r.wall_ms for g, r in by_graph.items()}
    assert all(w is not None and w >= 1 for w in walls.values())
    # distinct attribution across differently-sized feeds
    assert len(set(walls.values())) > 1
    # attribution is ordered by work: the graph with the most
    # rows_in+triples_out costs at least as much as the one with least
    work = {g: (r.rows_in or 0) + (r.triples_out or 0) for g, r in by_graph.items()}
    gmax = max(work, key=work.get)
    gmin = min(work, key=work.get)
    assert walls[gmax] >= walls[gmin]
