from kgap_spark.pipelines.runner import (  # noqa: F401
    Pipeline,
    Step,
    ValidationError,
    pipeline_from_config,
    pipeline_from_yaml,
    run_pipeline,
)
