from kgap_spark.lineage.runner import LineageLog, run_pipeline_resumable  # noqa: F401
