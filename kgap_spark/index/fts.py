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
