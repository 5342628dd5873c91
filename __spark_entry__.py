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

from kgap_spark.workload import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    ORACLES,
    QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: mention-extraction
    triples over `documents` (broadcast dictionary join + lang routing
    + argmax disambiguation)."""
    return QUERIES["kg_mentions"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The 50-entry core window (the driver records the first 50
    entries, so QUERIES is ordered newest/least-stable first-50; the
    stable overflow lives in ``extra_queries()`` and is verified by
    the same harness locally — tools/check_oracles.py checks both,
    run log at BENCH/ORACLES_LOCAL_r04.txt)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per core query. Only
    ``minhash_lsh_ml`` is rows-only (Spark-ML's MinHashLSH hash
    coefficients are JVM internals; its recall vs exact jaccard is
    pytest-gated)."""
    return dict(ORACLES)


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Stable queries past the driver's 50-entry window — same
    callable contract as ``queries()``."""
    return dict(EXTRA_QUERIES)


def extra_oracle_sql() -> dict[str, str]:
    """Oracles for ``extra_queries()`` (every extra query has one)."""
    return dict(EXTRA_ORACLES)
