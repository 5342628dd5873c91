"""Structured-Streaming analog of the polled LDES micro-batch ingest.

The reference polls each LDES feed every POLLING_FREQUENCY ms, batches
≤ MEMBER_BATCH_SIZE members, and appends to the store with durable
per-feed state (reference: ``ldes-consumer/app.py:333-341``,
``docs/components/ldes-consumer.md:584-592``). The production design in
this repo is *batch* (north rule: resumable batch with lineage —
``kgap_spark.lineage``), but the same pipeline also runs incrementally
under Structured Streaming, which supplies the reference's streaming
guarantees natively:

- polling/batching        → micro-batch trigger (processingTime)
- /state continuation     → checkpointLocation (offsets + commits)
- no-duplicate ingestion  → exactly-once file-source replay +
                            idempotent foreachBatch merge
- FOLLOW mode             → a continuously running query

``stream_pages_to_triples`` reuses the *identical* batch stage
functions inside ``foreachBatch`` — one implementation, two runtimes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgap_spark import schemas as S


def stream_pages_to_triples(
    spark: SparkSession,
    pages_path: str,
    alias_dict: DataFrame,
    store,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """readStream over a web_pages directory → pipeline → merge into the
    TripleStore per micro-batch. Returns the StreamingQuery.

    File source + checkpoint = the LDES continuation token: restarted
    queries resume exactly after the last committed batch. The sink is
    ``TripleStore.merge`` (quad-level upsert), so replayed batches are
    idempotent — the reference's "no duplicate data ingestion"
    guarantee (ldes-consumer.md:589)."""
    from kgap_spark.canonicalize import canonical_mapping
    from kgap_spark.triples.materialize import build_triples

    stream = (
        spark.readStream.schema(S.WEB_PAGES)
        .option("maxFilesPerTrigger", 4)  # MEMBER_BATCH_SIZE analog
        .parquet(pages_path)
    )

    # the dictionary is static for the query's lifetime: run the CC
    # canonicalization ONCE here, not once per micro-batch (in FOLLOW
    # mode that re-derived the whole mapping every 60 s)
    canon = canonical_mapping(alias_dict).localCheckpoint(eager=True)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        triples = build_triples(batch_df, alias_dict, canon=canon)
        store.merge(triples)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="60 seconds")  # POLLING_FREQUENCY
    return writer.start()


def stateful_first_seen(
    stream: DataFrame,
    key_col: str = "fp",
    payload_col: str = "url",
):
    """Custom stateful operator: emit each key the FIRST time it is seen
    across all micro-batches, suppress every later occurrence —
    streaming content-dedup at row granularity
    (``applyInPandasWithState``; the per-key state store holds one
    counter per fingerprint, checkpointed with the query).

    This is the streaming complement to the batch dedup family: a
    crawler feed re-presenting known pages (LDES re-harvest,
    ldes-consumer.md:584-592) produces no duplicate downstream work.
    State size = |distinct keys| × ~few bytes, sharded by the state
    store across executors. Returns (key, first_payload, n_occurrences)
    rows — n_occurrences counts this batch's arrivals at emit time."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("first_payload", StringType()),
            StructField("n_occurrences", LongType()),
        ]
    )
    state_schema = StructType([StructField("seen", LongType())])

    def fn(key, pdfs, state):
        n = 0
        first = None
        for pdf in pdfs:
            n += len(pdf)
            if first is None and len(pdf):
                first = str(pdf[payload_col].iloc[0])
        if state.exists:
            (seen,) = state.get
            state.update((seen + n,))
            return iter(())  # key already emitted in an earlier batch
        state.update((n,))
        return iter(
            [pd.DataFrame([{"key": key[0], "first_payload": first,
                            "n_occurrences": n}])]
        )

    return stream.groupBy(F.col(key_col)).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation over a streaming event table —
    the late-data-tolerant rollup (T6 has no reference counterpart; this
    is the Spark-native extension for stream analytics)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(w, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
