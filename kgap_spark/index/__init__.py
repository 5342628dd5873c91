from kgap_spark.index.fts import build_posting_table, fts_search  # noqa: F401
