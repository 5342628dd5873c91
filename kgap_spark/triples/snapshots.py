"""Snapshot-isolated triple store: a from-scratch manifest layer.

``TripleStore`` documents one semantic gap vs a transactional table
format (reference analog: the GraphDB repository k-gap writes through,
``graphdb/kgap/template-repo-config.ttl:15-41``): a lazy DataFrame from
``read()`` pins the *directory listing* and dies once an overwriting
write replaces those files, so callers must ``localCheckpoint`` across
writes. ``SnapshotStore`` closes that gap with the public table-format
design (immutable data files + versioned manifests + an atomic
pointer), implemented here from first principles:

- **Data files are immutable.** Every write lands in a fresh
  ``_data/snap-<uuid>/graph=<g>/part-*.parquet`` tree; no commit ever
  deletes or rewrites a live file. Overwrites and deletes are manifest
  edits — the old files stay until ``expire_snapshots``.
- **A two-level manifest per version.** ``_meta/v<N>.json`` names
  immutable manifest-PART files (``_meta/p-<uuid>.json``), each
  holding a slice of data-file entries (path, graph partition value,
  bytes) plus an operation summary. Commits are DELTAS: an append
  writes one new part and reuses every surviving part id verbatim —
  O(added files) metadata per commit, never a rewrite of the full
  table listing; graph drops rewrite only the parts containing the
  dropped graphs; rollback reuses part ids (pure metadata); past
  ``PART_CAP`` parts a commit merges them (the rewrite-manifests
  analog). Reads still plan from the resolved entry list
  (manifest-level pruning: a graph-scoped read plans only that
  graph's files — no directory listing, no Hive pruning needed).
- **Commit = create-if-absent of the next manifest.** The committed
  version is the largest ``v<N>.json`` that exists AND parses;
  claiming ``v<N+1>`` with Hadoop ``create(path, overwrite=false)``
  is the compare-and-swap (atomic on HDFS; the ``file://`` test
  fallback and the S3 conditional-PUT seam are documented on
  ``fs.create_text_file``). A manifest torn by a crash mid-write never
  bricks the store: readers skip unparseable manifests, and a later
  committer deletes one after ``torn_grace_sec`` (a crashed writer)
  and re-claims the slot. Losing the race retries against the new
  tip: append-style commits replay unconditionally; overwrite-style
  commits (overwrite/compact/delete) re-validate that the affected
  graphs' file sets are unchanged since the snapshot their input was
  read from, else raise ``SnapshotConflictError`` — the same
  serializable-per-partition validation Iceberg applies. Pass
  ``expected_base=<version your read() used>`` to extend that
  validation across the full read→commit window; without it the
  window starts at the write call (both documented on
  ``overwrite_graphs``).

What this buys over the parent class, with the same call surface:

- **Snapshot isolation**: a DataFrame from ``read()`` remains valid —
  and keeps returning the data as of its snapshot — across any number
  of subsequent writes. No defensive ``localCheckpoint`` of
  table-sized data: the read-transform-overwrite paths
  (``delete_quads``, ``rewrite``) re-implement the parent's flow
  without materializing the SURVIVORS side (at 100 TB that
  checkpoint is an O(affected-partitions) copy per delete; only the
  small delete-key set is materialized, and only because it is
  consumed twice).
- **Time travel**: ``read(version=K)``, ``snapshots()``,
  ``rollback(K)`` (an O(metadata) commit restoring K's file list).
- **O(metadata) deletes**: ``delete_graph`` edits the manifest; the
  partition-drop cost is zero data movement regardless of graph size.
- **Vacuum**: ``expire_snapshots(keep_last=k)`` drops manifests older
  than the last ``k`` and every data file they alone referenced —
  manifests first, so a crash mid-vacuum leaves only harmless orphan
  files (re-vacuumable), never a live manifest pointing at deleted
  data. ``sweep_orphans=True`` also removes snapshot dirs no live
  manifest references (failed commits, crashed vacuums) once they are
  older than ``orphan_grace_sec``.

At 100 TB the manifest is the only driver-side state: one JSON entry
per data file (file counts are bounded by the same range-partitioned
write + auto-compaction policy as the parent), reads plan from it
without listing directories (on object stores, LIST is the slow call),
and — with the two-level parts — the per-commit METADATA WRITE is also
O(files touched), never O(table): a million-file table appends by
writing one small part file and a version file of part ids. Version
files and parts are immutable once parseable, so parses are memoized.
"""

from __future__ import annotations

import json
import re
import time
import uuid
from collections import Counter, defaultdict
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgap_spark import schemas as S
from kgap_spark.io import fs
from kgap_spark.triples.writer import (
    QUAD_KEY,
    TripleStore,
    _nullsafe_anti,
    _unescape_partition,
)

_MANIFEST_RE = re.compile(r"^v(\d+)\.json$")


class SnapshotConflictError(RuntimeError):
    """A concurrent commit changed an affected graph between this
    operation's read snapshot and its commit attempt."""


class SnapshotNotFoundError(ValueError):
    """The requested snapshot version has no readable manifest —
    expired (vacuumed), aborted mid-commit, or never committed.
    A dedicated type so consumers (e.g. the changelog cursor) can
    classify a vacuumed window without matching message text."""




class SnapshotStore(TripleStore):
    """Drop-in ``TripleStore`` with manifest-based snapshot commits.

    Inherits the logical operations (``merge`` dedup semantics,
    ``compact`` policy, orphan cleanup, accounting) and overrides the
    physical layer: reads plan from the current manifest, writes land
    in immutable snapshot dirs and commit by manifest swap.
    ``delete_quads``/``rewrite`` are re-implemented checkpoint-free.
    """

    # a torn (unparseable) manifest younger than this may still be
    # mid-write by a live committer; older ones are crashed commits a
    # new committer may delete and re-claim
    torn_grace_sec: float = 60.0

    def __init__(
        self, spark: SparkSession, path: str,
        files_per_graph: int | None = None,
        compact_threshold: int | None = 64,
    ):
        super().__init__(spark, path, files_per_graph=files_per_graph,
                         compact_threshold=compact_threshold)
        self.data_dir = fs.join(path, "_data")
        self.meta_dir = fs.join(path, "_meta")
        # version → parsed manifest; safe because a manifest is
        # immutable once it parses (bounded: recent entries only)
        self._man_cache: dict[int, dict] = {}
        # (version, Counter) for _graph_file_counts
        self._counts_cache: tuple[int, Counter] | None = None
        # part id → entries; parts are immutable once a version
        # references them (bounded, cleared past 256 entries)
        self._part_cache: dict[str, list[dict]] = {}

    # -- manifest layer ----------------------------------------------
    def _versions(self) -> list[int]:
        """Committed-or-claimed manifest version numbers, ascending
        (filename-based; torn manifests included — callers that need
        readability use ``current_version``)."""
        return sorted(
            int(m.group(1))
            for name in fs.list_names(self.spark, self.meta_dir)
            if (m := _MANIFEST_RE.match(name))
        )

    def current_version(self) -> int:
        """Largest version whose manifest exists and parses (0 = empty
        store). A claimed-but-torn tip (crash mid-write, or a racing
        writer not yet closed) is skipped, never fatal."""
        for v in reversed(self._versions()):
            if self._try_manifest(v) is not None:
                return v
        return 0

    def _manifest_path(self, version: int) -> str:
        return fs.join(self.meta_dir, f"v{version}.json")

    def _try_manifest(self, version: int) -> dict | None:
        """Parse manifest ``version``; None if missing or torn.
        Positive results are memoized (manifests are immutable once
        parseable); negatives are not (a slow writer may complete)."""
        if version in self._man_cache:
            return self._man_cache[version]
        try:
            raw = fs.read_text_file(self.spark, self._manifest_path(version))
            man = json.loads(raw)
        except Exception:
            return None
        if len(self._man_cache) > 16:
            self._man_cache.clear()
        self._man_cache[version] = man
        return man

    def _manifest(self, version: int) -> dict:
        if version == 0:
            return {"version": 0, "parent": None, "operation": "init",
                    "files": []}
        man = self._try_manifest(version)
        if man is None:
            raise SnapshotNotFoundError(
                f"snapshot v{version} does not exist or is torn "
                f"(expired, aborted, or never committed; "
                f"current={self.current_version()})"
            )
        return man

    # -- manifest parts (two-level manifests) --------------------------
    # A version file no longer embeds the full data-file list: it
    # names immutable manifest-PART files (`_meta/p-<uuid>.json`),
    # each holding a slice of entries. An append writes ONE new part
    # and a version file listing the surviving part ids — O(added
    # files), never O(table). Graph drops rewrite only the parts that
    # contain the dropped graphs; rollback reuses the old version's
    # part ids verbatim (pure metadata). When a version accumulates
    # more than PART_CAP parts they are merged into one (the
    # rewrite-manifests analog, amortized O(files)/PART_CAP per
    # commit). Parts are written BEFORE the version CAS, so a crash
    # or lost race leaves only orphan part files — swept by
    # ``expire_snapshots(sweep_orphans=True)``, never referenced.

    #: merge manifest parts when a commit would exceed this many
    PART_CAP: int = 64

    def _part_path(self, pid: str) -> str:
        return fs.join(self.meta_dir, f"{pid}.json")

    def _part_entries(self, pid: str) -> list[dict]:
        if pid not in self._part_cache:
            raw = fs.read_text_file(self.spark, self._part_path(pid))
            if len(self._part_cache) > 256:
                self._part_cache.clear()
            self._part_cache[pid] = json.loads(raw)["entries"]
        return self._part_cache[pid]

    def _write_part(self, entries: list[dict]) -> str:
        pid = f"p-{uuid.uuid4().hex[:12]}"
        fs.write_text_file(self.spark, self._part_path(pid),
                           json.dumps({"entries": entries}))
        # bound the cache on the WRITE path too: a long-lived writer
        # commits thousands of parts and its reads always hit, so the
        # miss-path eviction alone never fires (review finding)
        if len(self._part_cache) > 256:
            self._part_cache.clear()
        self._part_cache[pid] = list(entries)
        return pid

    def _parts_of(self, man: dict) -> list[str]:
        return list(man.get("parts", []))

    def _files(self, version: int) -> list[dict]:
        man = self._manifest(version)
        if "parts" in man:
            return [e for pid in man["parts"]
                    for e in self._part_entries(pid)]
        # v0 and legacy single-level manifests embed the list directly
        return man["files"]

    def _commit(self, op: str, add: list[dict] = (),
                drop_graphs: set[str] | None = None,
                replace_files: list[dict] | None = None,
                replace_parts: list[str] | None = None,
                expected_base: int | None = None,
                max_retries: int = 5) -> int:
        """Claim the next manifest version. Retries against a moved
        tip; overwrite-style commits (``drop_graphs``/``replace_files``
        with ``expected_base``) first validate that no affected graph
        changed since ``expected_base``. A torn manifest blocking the
        next slot is deleted and re-claimed once older than
        ``torn_grace_sec``. The added entries are written as ONE part
        file up front (reused across CAS retries); parts orphaned by a
        failed commit are swept by the vacuum, never referenced."""
        add = list(add)
        add_pid = self._write_part(add) if add else None
        for _ in range(max_retries):
            cur = self.current_version()
            if expected_base is not None and cur != expected_base:
                affected = (drop_graphs if drop_graphs is not None
                            else {e["graph"] for e in add})
                base_set = {
                    e["path"] for e in self._files(expected_base)
                    if e["graph"] in affected
                }
                cur_set = {
                    e["path"] for e in self._files(cur)
                    if e["graph"] in affected
                }
                if base_set != cur_set:
                    raise SnapshotConflictError(
                        f"{op}: graphs {sorted(affected)[:5]} changed "
                        f"between v{expected_base} and v{cur}"
                    )
            if replace_parts is not None:
                parts = list(replace_parts)
            elif replace_files is not None:
                parts = ([self._write_part(list(replace_files))]
                         if replace_files else [])
            else:
                cur_man = self._manifest(cur)
                if "parts" in cur_man:
                    parts = list(cur_man["parts"])
                elif cur_man["files"]:
                    # legacy single-level manifest: wrap once
                    parts = [self._write_part(cur_man["files"])]
                else:
                    parts = []
                if drop_graphs:
                    kept_parts = []
                    for pid in parts:
                        ents = self._part_entries(pid)
                        kept = [e for e in ents
                                if e["graph"] not in drop_graphs]
                        if len(kept) == len(ents):
                            kept_parts.append(pid)    # untouched part
                        elif kept:
                            kept_parts.append(self._write_part(kept))
                        # fully-dropped part: omitted
                    parts = kept_parts
                if add_pid is not None:
                    parts.append(add_pid)
                if len(parts) > self.PART_CAP:
                    merged = [e for pid in parts
                              for e in self._part_entries(pid)]
                    parts = [self._write_part(merged)] if merged else []
            total = [e for pid in parts for e in self._part_entries(pid)]
            manifest = {
                "version": cur + 1,
                "parent": cur,
                "operation": op,
                "ts": time.time(),
                "summary": {
                    "added_files": len(add),
                    "total_files": len(total),
                    "total_bytes": sum(e.get("bytes", 0) for e in total),
                },
                "parts": parts,
            }
            if fs.create_text_file(
                self.spark, self._manifest_path(cur + 1),
                json.dumps(manifest),
            ):
                return cur + 1
            # slot taken: by a completed commit (loop re-reads the
            # tip) or by a torn manifest from a crashed writer —
            # recover the latter after the grace window
            self._recover_torn(cur + 1)
            if (self.current_version() == cur
                    and self._try_manifest(cur + 1) is None):
                # the slot is blocked by a torn manifest still inside
                # torn_grace_sec (its writer may be mid-close), not by
                # a completed commit: back off instead of burning the
                # remaining retries in microseconds
                time.sleep(min(0.05 * (2 ** _), 1.0))
        raise SnapshotConflictError(
            f"{op}: could not claim manifest v{self.current_version() + 1} "
            f"after {max_retries} attempts (heavy commit contention, or a "
            f"torn manifest younger than torn_grace_sec="
            f"{self.torn_grace_sec}s holding the slot — retry after the "
            f"grace window)"
        )

    def _recover_torn(self, version: int) -> None:
        """Delete a claimed-but-unparseable manifest older than
        ``torn_grace_sec`` so its slot can be re-claimed (crashed
        committer). Younger torn files are left alone — their writer
        may still be mid-close."""
        if self._try_manifest(version) is not None:
            return
        for ent in fs.list_status(self.spark, self.meta_dir):
            if (ent["name"] == f"v{version}.json"
                    and time.time() - ent["mtime"] > self.torn_grace_sec):
                fs.delete(self.spark, self._manifest_path(version))
                return

    def _write_snap(self, df: DataFrame) -> tuple[str, list[dict]]:
        """Write ``df`` to a fresh immutable snapshot dir; return
        ``(snap_rel, entries)`` with manifest entries (path relative
        to ``_data``, graph, bytes)."""
        snap_rel = f"snap-{uuid.uuid4().hex[:12]}"
        snap_dir = fs.join(self.data_dir, snap_rel)
        (
            self._prep(df)
            .write.mode("error")
            .partitionBy("graph")
            .parquet(snap_dir)
        )
        entries = []
        for part in fs.list_status(self.spark, snap_dir):
            if not part["is_dir"] or not part["name"].startswith("graph="):
                continue
            graph = _unescape_partition(part["name"][len("graph="):])
            part_dir = fs.join(snap_dir, part["name"])
            for f_ in fs.list_status(self.spark, part_dir):
                if f_["name"].endswith(".parquet"):
                    entries.append({
                        "path": f"{snap_rel}/{part['name']}/{f_['name']}",
                        "graph": graph,
                        "bytes": f_["length"],
                    })
        return snap_rel, entries

    def _commit_snap(self, op: str, snap_rel: str, add: list[dict],
                     **kwargs) -> int:
        """_commit, deleting the just-written snapshot dir if the
        commit fails — a refused commit must not leak data files (the
        vacuum only tracks files that made it into a manifest)."""
        try:
            return self._commit(op, add=add, **kwargs)
        except Exception:
            fs.delete(self.spark, fs.join(self.data_dir, snap_rel))
            raise

    # -- reads --------------------------------------------------------
    def exists(self) -> bool:
        return bool(self._files(self.current_version()))

    def _load_files(self, entries: list[dict]) -> DataFrame:
        """Plan a scan over exactly these manifest entries. Files are
        grouped per snapshot dir (each needs its own ``basePath`` for
        the ``graph=`` partition column to parse); every branch reads
        with the explicit canonical schema — the partition column's
        type is taken from it, so a numeric-looking graph name
        ("1.50") can never be inferred to double and round-trip
        wrong, and footer-sampling schema inference is skipped."""
        if not entries:
            return self.spark.createDataFrame([], S.TRIPLES)
        by_dir: dict[str, list[str]] = defaultdict(list)
        for e in entries:
            snap_rel = e["path"].split("/", 1)[0]
            by_dir[snap_rel].append(fs.join(self.data_dir, e["path"]))
        cols = [f.name for f in S.TRIPLES.fields]
        parts = []
        for snap_rel, paths in sorted(by_dir.items()):
            base = fs.join(self.data_dir, snap_rel)
            parts.append(
                self.spark.read.schema(S.TRIPLES)
                .option("basePath", base)
                .parquet(*paths)
                .select(*cols)
            )
        return reduce(lambda a, b: a.unionByName(b), parts)

    def read(self, version: int | None = None) -> DataFrame:
        """The store as of ``version`` (default: current). The plan
        embeds the snapshot's explicit file list, so it stays valid —
        and keeps answering as of that snapshot — across later writes
        (until the snapshot is expired)."""
        v = self.current_version() if version is None else version
        return self._load_files(self._files(v))

    def read_graph(self, graph: str,
                   version: int | None = None) -> DataFrame:
        """Graph-scoped read with manifest-level pruning: only the
        graph's files enter the plan — no directory listing, no
        partition-filter evaluation at scan time."""
        v = self.current_version() if version is None else version
        return self._load_files(
            [e for e in self._files(v) if e["graph"] == graph]
        )

    def _diff_filesets(self, files_a: list[dict],
                       files_b: list[dict]) -> tuple[DataFrame, DataFrame]:
        """(inserts, deletes) going from file list ``a`` to ``b``,
        planned with two levels of pruning so the cost is O(rows in
        files actually touched), never O(table):

        - **File-level**: a path present in both manifests is an
          immutable file — identical content, skipped entirely.
        - **Graph-level**: a graph whose changed files all sit on ONE
          side needs no content diff — its rows are pure inserts (new
          files in an appended/new graph) or pure deletes (a dropped
          graph). Only graphs with changed files on BOTH sides (an
          overwrite/delete-quads/compaction rewrite) pay the
          ``exceptAll`` shuffle, and only over those graphs' changed
          files.

        ``exceptAll`` is multiset difference over all columns, so a
        rewrite that re-emits identical content (compaction, a
        rollback past a rollback) nets to zero changes — the changelog
        reports LOGICAL change, not file churn."""
        paths_a = {e["path"] for e in files_a}
        paths_b = {e["path"] for e in files_b}
        only_a = [e for e in files_a if e["path"] not in paths_b]
        only_b = [e for e in files_b if e["path"] not in paths_a]
        mixed = ({e["graph"] for e in only_a}
                 & {e["graph"] for e in only_b})
        ins = self._load_files(
            [e for e in only_b if e["graph"] not in mixed])
        dels = self._load_files(
            [e for e in only_a if e["graph"] not in mixed])
        if mixed:
            new = self._load_files(
                [e for e in only_b if e["graph"] in mixed])
            old = self._load_files(
                [e for e in only_a if e["graph"] in mixed])
            ins = ins.unionByName(new.exceptAll(old))
            dels = dels.unionByName(old.exceptAll(new))
        return ins, dels

    def read_changes(self, from_version: int,
                     to_version: int | None = None,
                     net: bool = True) -> DataFrame:
        """Incremental (changelog) scan: the logical row changes going
        from snapshot ``from_version`` to ``to_version`` (default:
        current tip), as the table columns plus ``_change``
        (``insert`` | ``delete``). This is what a resumable downstream
        consumer polls instead of re-reading the table: record the
        version you last processed, then
        ``read_changes(last_seen)`` + ``current_version()`` on each
        cycle — the plan touches only files that changed (public table
        formats call this an incremental/changelog scan; same design:
        manifest diff first, content diff only where file sets
        overlap per graph, see ``_diff_filesets``).

        ``net=True`` (default) diffs the two endpoint manifests in one
        pass: row churn that cancels out inside the window (an insert
        later deleted, a compaction rewrite, a rollback that restores
        the starting file list) is absent from the result. ``net=False``
        walks each commit in ``(from, to]`` and emits its individual
        changes tagged with ``_commit_version`` — an audit/CDC view;
        every intermediate manifest must still be live (a vacuumed
        window raises, same as ``read(version=...)``)."""
        end = self.current_version() if to_version is None else to_version
        if from_version > end:
            raise ValueError(
                f"read_changes: from_version {from_version} is newer "
                f"than to_version {end}"
            )
        if net:
            ins, dels = self._diff_filesets(
                self._files(from_version), self._files(end))
            return (
                ins.withColumn("_change", F.lit("insert"))
                .unionByName(dels.withColumn("_change", F.lit("delete")))
            )
        parts = []
        prev = self._files(from_version)
        for v in range(from_version + 1, end + 1):
            cur = self._files(v)
            ins, dels = self._diff_filesets(prev, cur)
            parts.append(
                ins.withColumn("_change", F.lit("insert"))
                .unionByName(dels.withColumn("_change", F.lit("delete")))
                .withColumn("_commit_version", F.lit(v))
            )
            prev = cur
        if not parts:
            empty = self._load_files([]).withColumn(
                "_change", F.lit("insert"))
            return empty.withColumn("_commit_version", F.lit(0)).limit(0)
        return reduce(lambda a, b: a.unionByName(b), parts)

    def _graph_pruned_scan(self, update: DataFrame,
                           graphs: list | None = ...) -> DataFrame:
        """Manifest-pruned variant of the parent's scan: with a bounded
        graph list, plan exactly those graphs' files; past
        MAX_GRAPH_LIST, fall back to the broadcast semi-join over the
        full snapshot."""
        if graphs is ...:
            graphs = self._graph_list(update)
        if graphs is not None:
            gset = set(graphs)
            return self._load_files([
                e for e in self._files(self.current_version())
                if e["graph"] in gset
            ])
        return self.read().join(
            F.broadcast(update.select("graph").distinct()), "graph",
            "left_semi",
        )

    def _n_graph_files(self, graph: str) -> int:
        """Live file count of one graph — a (memoized) manifest scan,
        not an fs listing. Batch callers (``compact``) use
        ``_graph_file_counts`` for one pass over the manifest."""
        return self._graph_file_counts()[graph]

    def _graph_file_counts(self) -> Counter:
        """Per-graph live file counts, memoized per version — the
        inherited ``merge`` calls ``_n_graph_files`` once per affected
        graph, which must not re-scan the manifest each time."""
        v = self.current_version()
        if self._counts_cache is None or self._counts_cache[0] != v:
            self._counts_cache = (
                v, Counter(e["graph"] for e in self._files(v)))
        return self._counts_cache[1]

    # -- writes -------------------------------------------------------
    def append(self, df: DataFrame) -> None:
        """Replication mode: immutable snapshot dir + add-files commit
        (unconditionally replayable under concurrency)."""
        snap_rel, entries = self._write_snap(df)
        self._commit_snap("append", snap_rel, entries)

    def overwrite_graphs(self, df: DataFrame,
                         expected_base: int | None = None) -> None:
        """Replace exactly the graph partitions present in ``df``. The
        affected-graph set is derived from the written snapshot dir's
        partition values — no driver-side collect of ``df``. Readers
        of older snapshots are untouched (their files stay live until
        ``expire_snapshots``), which is why ``df`` itself may be
        derived from this store with no checkpoint.

        ``expected_base`` extends the conflict validation window: pass
        the version your input was read from
        (``v = store.current_version(); df = store.read(version=v)``)
        and a concurrent commit that touched the same graphs anywhere
        in the read→commit window raises ``SnapshotConflictError``
        instead of being silently overwritten. Without it the window
        starts here (single-logical-writer-per-graph deployments don't
        need more)."""
        base = (self.current_version() if expected_base is None
                else expected_base)
        snap_rel, entries = self._write_snap(df)
        self._commit_snap("overwrite", snap_rel, entries,
                          drop_graphs={e["graph"] for e in entries},
                          expected_base=base)

    def delete_graph(self, graph: str) -> None:
        """Graph-scoped clear as a metadata-only commit: zero data
        movement regardless of graph size (the real partition-drop
        semantics the parent class emulates with a directory delete)."""
        self._commit("delete-graph", drop_graphs={graph},
                     expected_base=self.current_version())

    def delete_graphs(self, graphs: list[str]) -> None:
        """Drop several graphs in ONE metadata commit (the parent
        loops one directory delete per graph) — CLEAR ALL on a
        thousand-graph store is a single manifest swap."""
        if graphs:
            self._commit("delete-graphs", drop_graphs=set(graphs),
                         expected_base=self.current_version())

    def graphs(self) -> list[str]:
        """Live graph names from the current manifest — O(metadata),
        no data scan, no directory listing."""
        return sorted({
            e["graph"] for e in self._files(self.current_version())
        })

    def move_graph(self, src: str, dst: str) -> None:
        """Rename graph ``src`` to ``dst`` (dst replaced) in ONE
        atomic commit: the rewritten data lands in a fresh snapshot
        dir, and a single manifest swap drops BOTH the old src files
        and dst's previous files while adding the new ones — no
        intermediate state where both graphs are populated (the
        parent's copy-then-delete exposes one)."""
        if src == dst:
            return
        base = self.current_version()
        if not any(e["graph"] == src for e in self._files(base)):
            # absent/empty source: no-op — the parent's dynamic
            # overwrite of zero partitions behaves the same way, and
            # committing drop_graphs={src, dst} here would silently
            # WIPE dst (review finding)
            return
        data = self.read_graph(src, version=base).withColumn(
            "graph", F.lit(dst))
        snap_rel, entries = self._write_snap(data)
        self._commit_snap("move-graph", snap_rel, entries,
                          drop_graphs={src, dst}, expected_base=base)

    def delete_quads(self, quads: DataFrame) -> None:
        """U2: DELETE DATA in ONE commit. The delete-KEY set is
        materialized once — it is consumed twice (graph discovery,
        anti-join) and, for SPARQL DELETE WHERE, may be an expensive
        derived plan. The SURVIVORS side stays checkpoint-free: its
        plan reads immutable snapshot files the commit never touches
        (the parent must materialize it — its overwrite deletes the
        files its own plans read). Graphs emptied by the delete are
        dropped by the same commit — their old files leave the
        manifest and no new files replace them.

        The affected-graph list honors the parent's MAX_GRAPH_LIST
        bound: a delete set naming more graphs than that is
        intersected with the manifest's LIVE graphs via a broadcast
        semi-join — the result is bounded by the manifest, which is
        already driver-held state, so no new unboundedness."""
        base = self.current_version()
        dels = quads.select(*QUAD_KEY).distinct().localCheckpoint(
            eager=True)
        live = {e["graph"] for e in self._files(base)}
        graphs = self._graph_list(dels)
        if graphs is None:
            live_df = self.spark.createDataFrame(
                [(g,) for g in sorted(live)], "graph string")
            graphs = [
                r.graph for r in dels.select("graph").distinct()
                .join(F.broadcast(live_df), "graph", "left_semi")
                .collect()
            ]
        else:
            graphs = [g for g in graphs if g in live]
        if not graphs:
            return
        gset = set(graphs)
        existing = self._load_files([
            e for e in self._files(base) if e["graph"] in gset
        ])
        remaining = _nullsafe_anti(existing, dels, QUAD_KEY)
        snap_rel, entries = self._write_snap(remaining)
        self._commit_snap("delete-quads", snap_rel, entries,
                          drop_graphs=gset, expected_base=base)

    def rewrite(self, match_pred: str, new_pred: str) -> None:
        """U3 predicate rename — the parent's read-transform-overwrite
        minus the defensive checkpoint (snapshot reads cannot be
        invalidated by the overwrite)."""
        base = self.current_version()
        current = self.read(version=base)
        affected = current.filter(
            F.col("pred") == match_pred).select("graph").distinct()
        scoped = current.join(F.broadcast(affected), "graph", "left_semi")
        rewritten = scoped.withColumn(
            "pred",
            F.when(F.col("pred") == match_pred,
                   F.lit(new_pred)).otherwise(F.col("pred")),
        )
        self.overwrite_graphs(rewritten, expected_base=base)

    # -- snapshot management ------------------------------------------
    def snapshots(self) -> list[dict]:
        """Commit log, oldest first: one row per live, parseable
        manifest."""
        out = []
        for v in self._versions():
            man = self._try_manifest(v)
            if man is None:
                continue
            out.append({
                "version": v,
                "parent": man.get("parent"),
                "operation": man.get("operation"),
                "ts": man.get("ts"),
                **man.get("summary", {}),
            })
        return out

    def _validate_rollback_target(self, man: dict) -> None:
        """Fresh (cache-bypassing) re-parse of the target's parts and
        existence probes for every data file they reference — a
        concurrent ``expire_snapshots`` between reading the target
        manifest and the CAS can delete both, and committing a tip
        over deleted metadata/data is effective data loss. Raises
        ``SnapshotConflictError`` on any missing piece."""
        try:
            if "parts" in man:
                entries = []
                for pid in man["parts"]:
                    raw = fs.read_text_file(self.spark,
                                            self._part_path(pid))
                    entries.extend(json.loads(raw)["entries"])
            else:
                entries = list(man["files"])
        except Exception as e:
            raise SnapshotConflictError(
                f"rollback to v{man['version']}: manifest part vanished "
                f"mid-flight (concurrent expire_snapshots?): {e}"
            ) from e
        for e in entries:
            if not fs.exists(self.spark, fs.join(self.data_dir, e["path"])):
                raise SnapshotConflictError(
                    f"rollback to v{man['version']}: data file "
                    f"{e['path']} was vacuumed mid-flight "
                    "(concurrent expire_snapshots)"
                )

    def rollback(self, version: int) -> int:
        """Restore snapshot ``version``'s exact file list as a NEW
        commit (history is preserved). With two-level manifests this
        reuses the old version's part ids verbatim — O(1) metadata,
        no part rewrite.

        Validated against a concurrent vacuum: parts and data files
        are re-checked both before the CAS and after it; if a vacuum
        won the race after the CAS, the just-committed manifest is
        removed again (the store's normal torn-tip recovery shape) and
        ``SnapshotConflictError`` raised, so the live tip never
        references deleted metadata or data."""
        man = self._manifest(version)  # raises if expired/unknown
        self._validate_rollback_target(man)
        if "parts" in man:
            new_v = self._commit("rollback",
                                 replace_parts=list(man["parts"]))
        else:
            new_v = self._commit("rollback", replace_files=man["files"])
        try:
            self._validate_rollback_target(man)
        except SnapshotConflictError:
            # undo: drop our manifest so the tip falls back to the
            # parent (readers see at worst a torn tip, which every
            # path already tolerates), then surface the conflict
            fs.delete(self.spark, self._manifest_path(new_v),
                      recursive=False)
            self._man_cache.pop(new_v, None)
            raise
        return new_v

    def expire_snapshots(self, keep_last: int = 1,
                         sweep_orphans: bool = False,
                         orphan_grace_sec: float = 3600.0) -> dict:
        """Vacuum: drop all but the newest ``keep_last`` manifests and
        delete every data file only they referenced. The one operation
        that removes data files — never run it with readers holding
        snapshots older than the kept window.

        Crash-safe ordering: expired MANIFESTS are deleted first, then
        their files — a crash mid-vacuum can only leave orphan files
        (harmless, removable by a later ``sweep_orphans=True`` run),
        never a live manifest referencing deleted data.
        ``sweep_orphans`` additionally removes snapshot dirs that no
        remaining manifest references at all (failed commits already
        clean up after themselves; this catches crashed ones) once
        older than ``orphan_grace_sec`` — the grace window keeps the
        sweep from racing an in-flight ``_write_snap``."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        # the keep window counts PARSEABLE manifests only: a torn
        # (claimed-but-unreadable) tip must never displace the live
        # snapshot out of the window — with filename-based counting,
        # keep_last=1 under a torn tip would vacuum the current
        # snapshot's manifest and data (total data loss). Torn
        # manifests are not expired here either; past the grace
        # window they are recovered like on the commit path.
        vs = [v for v in self._versions()
              if self._try_manifest(v) is not None]
        keep = set(vs[-keep_last:])
        expire = [v for v in vs if v not in keep]
        for v in set(self._versions()) - set(vs):
            self._recover_torn(v)
        referenced = {e["path"] for v in keep for e in self._files(v)}
        kept_parts = {
            pid for v in keep for pid in self._parts_of(self._manifest(v))
        }
        dropped_paths = {
            e["path"] for v in expire for e in self._files(v)
        } - referenced
        expired_parts = {
            pid for v in expire
            for pid in self._parts_of(self._manifest(v))
        } - kept_parts
        # manifests FIRST (see docstring), then parts, then data files
        for v in expire:
            fs.delete(self.spark, self._manifest_path(v))
            self._man_cache.pop(v, None)
        for pid in expired_parts:
            fs.delete(self.spark, self._part_path(pid))
            self._part_cache.pop(pid, None)
        for rel in dropped_paths:
            fs.delete(self.spark, fs.join(self.data_dir, rel),
                      recursive=False)
        # prune snapshot dirs emptied by the file deletes
        for snap_rel in {p.split("/", 1)[0] for p in dropped_paths}:
            self._delete_snap_dir_if_dead(snap_rel)
        swept = 0
        if sweep_orphans:
            ref_dirs = {p.split("/", 1)[0] for p in referenced}
            now = time.time()
            for ent in fs.list_status(self.spark, self.data_dir):
                if (ent["is_dir"] and ent["name"].startswith("snap-")
                        and ent["name"] not in ref_dirs
                        and now - ent["mtime"] > orphan_grace_sec):
                    fs.delete(self.spark,
                              fs.join(self.data_dir, ent["name"]))
                    swept += 1
            # orphan manifest PARTS: written by crashed/lost commits,
            # referenced by no live version (age-gated like snap dirs)
            for ent in fs.list_status(self.spark, self.meta_dir):
                name = ent["name"]
                if (name.startswith("p-") and name.endswith(".json")
                        and name[:-5] not in kept_parts
                        and now - ent["mtime"] > orphan_grace_sec):
                    fs.delete(self.spark, fs.join(self.meta_dir, name))
                    self._part_cache.pop(name[:-5], None)
                    swept += 1
        return {"expired": expire, "deleted_files": len(dropped_paths),
                "swept_orphan_dirs": swept}

    def _delete_snap_dir_if_dead(self, snap_rel: str) -> None:
        snap_dir = fs.join(self.data_dir, snap_rel)
        live = any(
            f_["name"].endswith(".parquet")
            for part in fs.list_status(self.spark, snap_dir)
            if part["is_dir"]
            for f_ in fs.list_status(
                self.spark, fs.join(snap_dir, part["name"])
            )
        )
        if not live:
            fs.delete(self.spark, snap_dir)

    # the parent's physical-layout helper targets Hive partition dirs;
    # keep the API but route through the manifest layer
    def compact(self, graphs: list[str] | None = None) -> dict:
        """Same policy as the parent (consolidate fragmented graphs
        into the canonical range-partitioned layout) — but old
        snapshots keep reading the pre-compaction files, so no
        checkpoint is needed, and file accounting is one manifest pass
        per side, not one listing per graph."""
        base = self.current_version()
        counts = self._graph_file_counts()
        if graphs is None:
            graphs = sorted(counts)
        if not graphs:
            return {"graphs": 0, "files_before": 0, "files_after": 0}
        before = sum(counts[g] for g in graphs)
        self.overwrite_graphs(
            self.read(version=base).filter(F.col("graph").isin(graphs)),
            expected_base=base,
        )
        after_counts = self._graph_file_counts()
        return {"graphs": len(graphs), "files_before": before,
                "files_after": sum(after_counts[g] for g in graphs)}
