"""Partitioned triple store with Iceberg-style write semantics.

k-gap offers two sink modes (reference: ``ldes-consumer/README.md:
147-149``): "Replication" (append-only bulk load) and "Sync"
(create/update/delete per member). ``TripleStore`` reproduces both over
a ``graph``-partitioned table:

- ``append(df)``        → Replication mode (S3);
- ``overwrite_graphs``  → idempotent per-partition rewrite — the MERGE
  building block (S4/U3). Uses dynamic partition overwrite so only the
  graphs present in ``df`` are replaced;
- ``merge(df)``         → Sync mode: quad-level upsert = union of
  existing rows not in the update's graphs' keyspace + the update,
  deduplicated (A7 — "no duplicate data ingestion",
  docs/components/ldes-consumer.md:589-590);
- ``delete_graph``      → graph-scoped clear (S7,
  docs/quick-reference.md:330-336).

Physical format: partitioned parquet. In production this class is the
seam where an Iceberg catalog plugs in (``writeTo(...).append()`` /
``MERGE INTO`` / snapshot ids); the jars aren't in this image, so the
parquet implementation keeps the exact same call surface and semantics
(partition-granular atomicity via dynamic partition overwrite).

One semantic gap vs Iceberg in THIS class — no snapshot isolation: a
lazy DataFrame obtained from ``read()``/``read_graph()`` pins the
*file listing* at creation time and becomes invalid once an
overwriting write replaces those files. Callers that re-use a
store-derived frame across writes must materialize it first
(``df.localCheckpoint(eager=True)``); ``merge`` does this internally
for its own read-then-overwrite cycle. ``SnapshotStore``
(``triples/snapshots.py``) closes the gap from first principles —
immutable data files + versioned manifests + create-if-absent commit —
with the same call surface plus time travel / rollback / vacuum; this
class remains the plain-parquet fast path for one-shot bulk loads.

Layout for scale: partition by ``graph`` (the query workload is
graph-scoped: per-feed counts, graph-scoped import/export/clear —
docs/components/ldes-consumer.md:330-336), then repartition by
``(graph, subj)`` before writing so each file covers a subject range —
subject-joins downstream read co-located files (bucketing analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgap_spark import schemas as S
from kgap_spark.io import fs

# Quad identity: the object TERM includes its language tag / datatype —
# "Paris"@en and "Paris"@fr are distinct statements, so merge/delete
# must key on all six columns or distinct literals silently collapse.
QUAD_KEY = ["subj", "pred", "obj", "obj_lang", "obj_datatype", "graph"]


def nullsafe_join(left: DataFrame, right: DataFrame, cols: list[str],
                  how: str) -> DataFrame:
    """semi/anti join with NULL-safe key equality: obj_lang/obj_datatype
    are NULL for plain literals, and SQL's NULL != NULL would make every
    plain-literal quad look new on every merge (or undeletable)."""
    r = right.select(*cols)
    for c in cols:
        r = r.withColumnRenamed(c, f"__r_{c}")
    cond = F.lit(True)
    for c in cols:
        cond = cond & left[c].eqNullSafe(F.col(f"__r_{c}"))
    return left.join(r, cond, how)


def _nullsafe_anti(left: DataFrame, right: DataFrame, cols: list[str]) -> DataFrame:
    return nullsafe_join(left, right, cols, "left_anti")


class TripleStore:
    def __init__(
        self, spark: SparkSession, path: str,
        files_per_graph: int | None = None,
        compact_threshold: int | None = 64,
    ):
        self.spark = spark
        self.path = path
        # write-partition count; None → session default parallelism so
        # the encode stage uses every core
        self.files_per_graph = files_per_graph
        # append-only merges grow a graph's file count by one delta per
        # Sync cycle; when a merged graph exceeds this many parquet
        # files it is auto-compacted after the merge (None disables —
        # callers then schedule compact() themselves)
        self.compact_threshold = compact_threshold
        # write-amplification observability: per-graph accounting of
        # the LAST merge's auto-compaction events (also returned by
        # merge() itself) — an operator watching Sync cycles reads
        # this instead of diffing fs listings
        self.last_compactions: list[dict] = []

    # -- reads --------------------------------------------------------
    def exists(self) -> bool:
        # Hadoop FS, not os.path: the store may live on s3a://hdfs://…
        # where a false "missing" would make merge() drop existing rows.
        return any(
            e.startswith("graph=") for e in fs.list_names(self.spark, self.path)
        )

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], S.TRIPLES)
        df = self.spark.read.parquet(self.path)
        # partition column comes back last; restore canonical order
        return df.select([f.name for f in S.TRIPLES.fields])

    def read_graph(self, graph: str) -> DataFrame:
        # predicate on the partition column → partition pruning
        return self.read().filter(F.col("graph") == graph)

    # -- writes -------------------------------------------------------
    def _prep(self, df: DataFrame) -> DataFrame:
        cols = [f.name for f in S.TRIPLES.fields]
        out = df.select(*cols)
        # a NULL graph would land in Hive's default partition, be
        # invisible to graph-pruned merges (IN (NULL) is never true),
        # and crash delete paths — fail inside the write, loudly
        out = out.withColumn(
            "graph",
            F.when(
                F.col("graph").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("NULL graph for subj "), F.col("subj"),
                        F.lit(" — pass default_graph when reading RDF"),
                    )
                ).cast("string"),
            ).otherwise(F.col("graph")),
        )
        n = max(self.spark.sparkContext.defaultParallelism * 2, 16)
        if self.files_per_graph and self.files_per_graph > 1:
            # explicit override: bounded subj-hash split per graph
            split = F.pmod(F.xxhash64("subj"), F.lit(self.files_per_graph))
            return out.repartition(n, "graph", split).sortWithinPartitions(
                "graph", "subj"
            )
        # Default: RANGE partition by (graph, subj). Three properties a
        # plain hash-by-graph can't combine:
        #   1. balanced tasks — ranges are cut from a sampled row-count
        #      distribution, so task sizes are even regardless of how
        #      skewed the per-graph row counts are;
        #   2. no hub-graph straggler — a graph bigger than one task is
        #      automatically split across consecutive subject ranges
        #      (web feeds are Zipfian across sites; hash-by-graph pins
        #      each graph to ONE task and the biggest feed serializes
        #      the stage);
        #   3. bounded file count — each task holds a CONTIGUOUS
        #      (graph, subj) range, so total files ≈ n_graphs + n_tasks,
        #      never tasks × graphs (which would make the dynamic
        #      partition-overwrite commit serial in the driver).
        # The within-task sort keeps subjects clustered for downstream
        # subject-join locality (bucketing analog).
        return out.repartitionByRange(n, "graph", "subj").sortWithinPartitions(
            "graph", "subj"
        )

    def append(self, df: DataFrame) -> None:
        """Replication mode: additions only (fast path)."""
        self._prep(df).write.mode("append").partitionBy("graph").parquet(self.path)

    def overwrite_graphs(self, df: DataFrame) -> None:
        """Replace exactly the graph partitions present in df
        (idempotent re-run of a source — the resume building block)."""
        (
            self._prep(df)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("graph")
            .parquet(self.path)
        )

    def merge(self, df: DataFrame) -> dict:
        """Sync mode: quad-level upsert — `MERGE INTO triples ON
        quad-key WHEN NOT MATCHED INSERT` ("no duplicate data
        ingestion", docs/components/ldes-consumer.md:589-590).
        Returns write-amplification accounting: affected-graph count
        and any auto-compaction events as
        ``{"graph", "files_before", "files_after"}`` dicts (also kept
        on ``self.last_compactions``).

        Append-only formulation: the update is anti-joined against the
        affected graphs' existing quad keys and ONLY the new quads are
        appended. Existing partition files are read, never rewritten —
        O(update) write instead of the previous O(graph) rewrite-and-
        checkpoint, which at 100 TB is the difference between a delta
        commit and re-writing a whole feed's history. No read-overwrite
        hazard either (append never deletes the files the anti-join is
        scanning), so no eager localCheckpoint. True replaces go
        through ``overwrite_graphs``; row removal through
        ``delete_quads``."""
        update = df.select([f.name for f in S.TRIPLES.fields]).dropDuplicates(
            QUAD_KEY
        )
        graphs = None
        if self.exists():
            update = update.localCheckpoint(eager=True)  # O(update), reused 2×
            graphs = self._graph_list(update)
            existing_keys = self._graph_pruned_scan(update, graphs).select(
                *QUAD_KEY
            )
            new_quads = _nullsafe_anti(update, existing_keys, QUAD_KEY)
        else:
            new_quads = update
        self.append(new_quads)
        # compaction trigger: each Sync delta appends files; past the
        # threshold a graph's scan fans out over tiny fragments, so
        # auto-compact it now (cheap check: one fs listing per affected
        # graph; skipped on the >MAX_GRAPH_LIST fallback path where
        # per-graph driver work is exactly what we're avoiding)
        events: list[dict] = []
        if graphs is not None and self.compact_threshold:
            over = {
                g: n for g in graphs
                if (n := self._n_graph_files(g)) > self.compact_threshold
            }
            if over:
                self.compact(list(over))
                events = [
                    {"graph": g, "files_before": n,
                     "files_after": self._n_graph_files(g)}
                    for g, n in over.items()
                ]
        self.last_compactions = events
        return {
            "graphs": len(graphs) if graphs is not None else None,
            "compacted": events,
        }

    # beyond this many distinct graphs, a driver-side isin list stops
    # being "static pruning" and becomes an unbounded collect + a huge
    # In-list plan — switch to a broadcast semi-join (graceful at
    # graph-per-source-file imports)
    MAX_GRAPH_LIST = 1000

    def _graph_list(self, update: DataFrame) -> list | None:
        """``update``'s distinct graphs as a driver list, or None when
        there are more than MAX_GRAPH_LIST (bounded collect)."""
        graphs = [
            r.graph
            for r in update.select("graph").distinct()
            .limit(self.MAX_GRAPH_LIST + 1).collect()
        ]
        return graphs if len(graphs) <= self.MAX_GRAPH_LIST else None

    def _graph_pruned_scan(self, update: DataFrame,
                           graphs: list | None = ...) -> DataFrame:
        """The existing-store scan restricted to ``update``'s graphs:
        a driver-side isin list (static partition pruning) while the
        distinct-graph count stays feed-bounded; past MAX_GRAPH_LIST,
        a broadcast left-semi join (dynamic pruning, bounded driver
        memory)."""
        if graphs is ...:
            graphs = self._graph_list(update)
        if graphs is not None:
            return self.read().filter(F.col("graph").isin(graphs))
        return self.read().join(
            F.broadcast(update.select("graph").distinct()), "graph",
            "left_semi",
        )

    def _n_graph_files(self, graph: str) -> int:
        """Parquet file count of one graph partition (one fs listing)."""
        part = fs.join(self.path, f"graph={_escape_partition(graph)}")
        return sum(
            1 for name in fs.list_names(self.spark, part)
            if name.endswith(".parquet")
        )

    def delete_quads(self, quads: DataFrame) -> None:
        """U2: DELETE DATA — remove specific quads
        (docs/quick-reference.md:234-237). Anti-join the affected
        graphs' content against the delete set, rewrite only those
        partitions (Iceberg row-level delete analog).

        The delete set is materialized FIRST: ``quads`` may itself be
        derived from this store (SPARQL DELETE WHERE), and any of its
        plans re-evaluated after the overwrite would read files the
        overwrite just deleted."""
        dels = quads.select(*QUAD_KEY).distinct().localCheckpoint(eager=True)
        existing = self._graph_pruned_scan(dels)
        remaining = _nullsafe_anti(existing, dels, QUAD_KEY).localCheckpoint(
            eager=True
        )
        self.overwrite_graphs(remaining)
        # graphs whose every quad was deleted produce no output
        # partition under dynamic overwrite — drop them explicitly.
        # Collect only the EMPTIED graphs (anti join), not every
        # affected graph — bounded by the work actually done
        emptied = [
            r.graph for r in dels.select("graph").distinct()
            .join(remaining.select("graph").distinct(), "graph", "left_anti")
            .collect()
        ]
        for g in emptied:
            self.delete_graph(g)

    def rewrite(self, match_pred: str, new_pred: str) -> None:
        """U3: DELETE { ?s old ?o } INSERT { ?s new ?o } WHERE —
        predicate renaming rewrite (docs/quick-reference.md:240-243),
        as a read-transform-overwrite of the affected partitions."""
        current = self.read()
        affected = current.filter(F.col("pred") == match_pred)
        graphs = affected.select("graph").distinct()
        scoped = current.join(F.broadcast(graphs), "graph", "left_semi")
        rewritten = scoped.withColumn(
            "pred",
            F.when(F.col("pred") == match_pred, F.lit(new_pred)).otherwise(
                F.col("pred")
            ),
        ).localCheckpoint(eager=True)
        self.overwrite_graphs(rewritten)

    def compact(self, graphs: list[str] | None = None) -> dict:
        """Rewrite fragmented graph partitions into the canonical
        range-partitioned layout. The append-only ``merge`` trades
        rewrite I/O for file-count growth — every Sync delta adds
        files — so periodic compaction is the operational counterpart
        (Iceberg's rewrite_data_files analog): read the affected
        graphs once, re-`_prep`, dynamic-partition-overwrite them.
        Returns per-call file accounting."""
        if graphs is None:
            graphs = [
                r.graph for r in self.read().select("graph").distinct().collect()
            ]
        if not graphs:
            return {"graphs": 0, "files_before": 0, "files_after": 0}

        def n_files() -> int:
            return sum(self._n_graph_files(g) for g in graphs)

        before = n_files()
        df = self.read().filter(F.col("graph").isin(graphs)).localCheckpoint(
            eager=True
        )
        self.overwrite_graphs(df)
        return {"graphs": len(graphs), "files_before": before,
                "files_after": n_files()}

    def cleanup_orphan_graphs(self, active_graphs: list[str]) -> list[str]:
        """T7: drop graphs no longer in the source config (the analog of
        removing feed containers for deleted feeds, app.py:242-272).
        Returns the dropped graph names."""
        current = [r.graph for r in self.read().select("graph").distinct().collect()]
        dropped = [g for g in current if g not in set(active_graphs)]
        for g in dropped:
            self.delete_graph(g)
        return dropped

    def delete_graph(self, graph: str) -> None:
        """Graph-scoped clear (reference: DELETE ?context=graph,
        docs/quick-reference.md:330-336). Partition drop = O(1) metadata
        in Iceberg; here: remove the partition directory via the Hadoop
        FS API (works on file://, hdfs://, s3a://…)."""
        part_dir = fs.join(self.path, f"graph={_escape_partition(graph)}")
        fs.delete(self.spark, part_dir)

    def delete_graphs(self, graphs: list[str]) -> None:
        """Drop several graphs. On this store: one directory delete
        each (the snapshot store overrides with a single atomic
        manifest commit)."""
        for g in graphs:
            self.delete_graph(g)

    def graphs(self) -> list[str]:
        """Live graph names from the physical layout — a partition-dir
        listing, no data scan (the snapshot store overrides with a
        manifest read)."""
        if not fs.exists(self.spark, self.path):
            return []
        return sorted(
            _unescape_partition(name[len("graph="):])
            for name in fs.list_names(self.spark, self.path)
            if name.startswith("graph=")
        )

    def move_graph(self, src: str, dst: str) -> None:
        """Rename graph ``src`` to ``dst`` (dst replaced). On this
        store this is copy-then-delete — TWO physical steps; a crash
        between them leaves both populated (re-running the MOVE is
        the recovery). The snapshot store overrides with one atomic
        commit."""
        if src == dst:
            return
        # no checkpoint needed: the plan scans only src partitions
        # while the overwrite rewrites only dst partitions (no
        # read-overwrite overlap), and delete_graph(src) runs after
        # the write job completes
        data = self.read_graph(src).withColumn("graph", F.lit(dst))
        self.overwrite_graphs(data)
        self.delete_graph(src)

    def write_bucketed_table(
        self, table_name: str, n_buckets: int = 64
    ) -> None:
        """Register the store as a subj-bucketed catalog table: BGP
        self-joins (SPARQL's core access pattern — n patterns sharing
        ?s) become exchange-free sort-merge joins, because both sides
        are pre-hashed into the same subj buckets at write time. At
        100 TB the BGP workload's repeated subj-shuffles are the
        dominant query cost; bucketing pays that shuffle ONCE at write.
        The parquet-partitioned store stays the ingest/clear surface;
        this is the query-optimized projection of it (the Iceberg
        sorted-table analog)."""
        (
            self.read()
            .write.bucketBy(n_buckets, "subj")
            .sortBy("subj")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(table_name)
        )

    # -- accounting (docs/components/ldes-consumer.md:330-336) ---------
    def counts_by_graph(self) -> DataFrame:
        return (
            self.read()
            .groupBy("graph")
            .agg(F.count(F.lit(1)).alias("n_triples"))
            .orderBy("graph")
        )


# Hive's exact escape set (verified against Spark's partition writer:
# '}' is NOT escaped, '#'/'='/'?'/'\''/'*' ARE — a mismatch makes
# delete_graph/compact target a nonexistent directory and the graph
# silently survives a clear).
_HIVE_ESCAPED = set('"#%\'*/:=?\\{[]^') | {chr(c) for c in range(0x20)} | {"\x7f"}


def _escape_partition(value: str) -> str:
    """Hive partition-dir escaping, matching Spark's writer exactly."""
    return "".join(
        f"%{ord(ch):02X}" if ch in _HIVE_ESCAPED else ch for ch in value
    )


def _unescape_partition(value: str) -> str:
    """Inverse of ``_escape_partition`` (and of Spark's writer)."""
    import re as _re

    return _re.sub(r"%([0-9A-Fa-f]{2})",
                   lambda m: chr(int(m.group(1), 16)), value)
