"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction query (dictionary
mention extraction → triples) on sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions; implementations live in
``kgap_spark.workload`` (each cites its reference pattern).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kgap_spark.workload import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: mention-extraction
    triples over `documents` (broadcast dictionary join + lang routing
    + argmax disambiguation)."""
    return QUERIES["kg_mentions"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query. Only ``minhash_lsh_ml``
    is rows-only (Spark-ML's MinHashLSH hash coefficients are JVM
    internals; its recall vs exact jaccard is pytest-gated)."""
    return dict(ORACLES)
