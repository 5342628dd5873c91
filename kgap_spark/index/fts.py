"""Full-text search: materialized posting table + scored search.

k-gap enables GraphDB's Lucene FTS (reference:
``graphdb/kgap/template-repo-config.ttl:29-32``) and queries it as
``?entity luc:searchIndex "marine"; luc:score ?score``
(``docs/quick-reference.md:215-222``). Spark has no inverted index, so
the pipeline materializes one (SURVEY §4): a ``(token, subj, tf)``
posting table built once per corpus; a search is then a broadcast-join
of query tokens against the posting table with a term-frequency score —
a pruned scan + partial agg at any scale, never a full-corpus regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"[^a-z0-9]+"


def tokens_col(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_RE), lambda t: t != F.lit("")
    )


def build_posting_table(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """corpus → (token, subj, tf). Written partitioned/bucketed by
    ``token`` in production so a search prunes to its tokens' buckets."""
    return (
        docs.select(F.col(id_col).alias("subj"), tokens_col(text_col).alias("_t"))
        .select("subj", F.explode("_t").alias("token"))
        .groupBy("token", "subj")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


N_TOKEN_BUCKETS = 64


def bucket_of(token_col):
    """Stable token → bucket id (content hash, reproducible anywhere)."""
    return F.pmod(F.xxhash64(token_col), F.lit(N_TOKEN_BUCKETS))


def write_posting_table(posting: DataFrame, path: str) -> None:
    """Materialize the inverted index partitioned by token bucket: a
    search reads only its query tokens' buckets (partition pruning) —
    the Lucene-index analog. Build once per corpus, query many times;
    ~1/64 of the index read per single-token query."""
    (
        posting.withColumn("_bucket", bucket_of(F.col("token")))
        .repartition("_bucket")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(path)
    )


def fts_search_indexed(spark, path: str, query: str, k: int = 20) -> DataFrame:
    """Search against the materialized posting table: bucket ids are
    computed driver-side from the query tokens, so the scan prunes to
    those partitions AND pushes the token equality filter."""
    q = [t for t in query.lower().split() if t]
    posting = spark.read.parquet(path)
    buckets = (
        spark.createDataFrame([(t,) for t in q], "token string")
        .select(bucket_of(F.col("token")).alias("b"))
        .distinct()
    )
    bucket_ids = [r.b for r in buckets.collect()]
    hits = posting.filter(
        F.col("_bucket").isin(bucket_ids) & F.col("token").isin(q)
    )
    return (
        hits.groupBy("subj")
        .agg(F.sum("tf").alias("score"), F.countDistinct("token").alias("n_terms"))
        .orderBy(F.desc("score"), F.desc("n_terms"), "subj")
        .limit(k)
    )


def fts_search(posting: DataFrame, query: str, k: int = 20) -> DataFrame:
    """Multi-token OR search, score = Σ tf over matched tokens
    (the luc:score analog: TF without IDF — deterministic and
    oracle-checkable). Ties broken by subj for total order."""
    q = [t for t in query.lower().split() if t]
    hits = posting.filter(F.col("token").isin(q))
    return (
        hits.groupBy("subj")
        .agg(F.sum("tf").alias("score"), F.countDistinct("token").alias("n_terms"))
        .orderBy(F.desc("score"), F.desc("n_terms"), "subj")
        .limit(k)
    )
