from kgap_spark.pipelines.runner import Pipeline, Step, ValidationError, run_pipeline  # noqa: F401
