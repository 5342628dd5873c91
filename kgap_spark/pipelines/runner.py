"""Named workflow runner — the Sembench analog.

k-gap's sembench executes YAML-configured workflows on a schedule:
steps of type ``query``/``extract`` (SPARQL → CSV/JSON file),
``transform`` (user script), ``load`` (endpoint + graph), and
``sparql_construct`` (reference: ``docs/components/sembench.md:
163-223, 443-455``; loop cadence ``sembench/kgap/main.py:7-13``).

Here a workflow is a list of typed steps over a shared name→DataFrame
namespace; scheduling cadence stays external (cron/Airflow — matching
the reference's SCHEDULER_INTERVAL_SECONDS being an env var, not
engine logic).

Step types:
- ``query``      sql → named DataFrame (templated, D2)
- ``transform``  python fn(DataFrame) → DataFrame (the sanctioned
                 custom-code hook, D1 — should itself use native ops /
                 pandas UDFs)
- ``extract``    named DataFrame → file (csv/json/parquet)
- ``load``       named DataFrame → TripleStore graph (append or merge)
- ``validate``   assertions → violations DataFrame; optionally fail
                 the workflow if non-empty (SHACL-gate analog, U5)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Step:
    kind: str                      # query | transform | extract | load | validate
    name: str                      # output name (or source name for sinks)
    sql: str | None = None
    fn: Callable[..., DataFrame] | None = None
    source: str | None = None      # input dataframe name
    path: str | None = None        # extract target
    fmt: str = "csv"
    graph: str | None = None       # load target graph override
    mode: str = "merge"            # load mode: append | merge | overwrite
    assertions: tuple = field(default_factory=tuple)
    fail_on_violations: bool = False


@dataclass
class Pipeline:
    name: str
    steps: list[Step]


class ValidationError(RuntimeError):
    pass


def pipeline_from_config(config: dict) -> Pipeline:
    """Build a Pipeline from a YAML/JSON-shaped dict — the sembench
    config-file IR (docs/components/sembench.md:150-223):

        name: nightly
        steps:
          - kind: query
            name: mentions
            sql: SELECT ...
          - kind: validate
            name: violations
            source: mentions
            assertions:
              - {kind: required, path: rdf:type, focus_type: kgap:WebPage}
            fail_on_violations: true
          - {kind: extract, name: out, source: mentions, path: /out, fmt: csv}

    ``transform`` steps need a Python callable and are registered via
    the ``transforms`` mapping: ``{step_name: fn}`` (the analog of the
    reference's script path, sembench.md:214-217).
    """
    from kgap_spark.validate import Assertion

    steps = []
    for raw in config.get("steps", []):
        raw = dict(raw)
        assertions = tuple(
            Assertion(**a) if isinstance(a, dict) else a
            for a in raw.pop("assertions", ())
        )
        steps.append(Step(**raw, assertions=assertions))
    return Pipeline(name=config.get("name", "unnamed"), steps=steps)


def pipeline_from_yaml(path: str, transforms: dict | None = None) -> Pipeline:
    """Load a workflow from a YAML file; bind transform callables by
    step name via ``transforms``."""
    import yaml

    with open(path) as f:
        config = yaml.safe_load(f)
    pipe = pipeline_from_config(config)
    if transforms:
        bound = [
            Step(**{**s.__dict__, "fn": transforms.get(s.name, s.fn)})
            for s in pipe.steps
        ]
        pipe = Pipeline(pipe.name, bound)
    return pipe


def run_pipeline(
    spark: SparkSession,
    pipeline: Pipeline,
    store=None,
    inputs: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Execute the workflow; returns the final name→DataFrame namespace.

    All steps build one lazy plan per output; actions happen only at
    sinks (extract/load) and validation gates — no driver-side row
    loops (J9 anti-pattern)."""
    from kgap_spark.io.rdf import export_results
    from kgap_spark.validate import validate

    ns: dict[str, DataFrame] = dict(inputs or {})
    for df_name, df in ns.items():
        df.createOrReplaceTempView(df_name)

    for step in pipeline.steps:
        if step.kind == "query":
            ns[step.name] = spark.sql(step.sql)
            ns[step.name].createOrReplaceTempView(step.name)
        elif step.kind == "transform":
            src = ns[step.source or step.name]
            ns[step.name] = step.fn(src)
            ns[step.name].createOrReplaceTempView(step.name)
        elif step.kind == "extract":
            export_results(ns[step.source or step.name], step.path, step.fmt)
        elif step.kind == "load":
            if store is None:
                raise ValueError("load step requires a TripleStore")
            df = ns[step.source or step.name]
            if step.graph is not None:
                from pyspark.sql import functions as F

                df = df.withColumn("graph", F.lit(step.graph))
            {"append": store.append,
             "merge": store.merge,
             "overwrite": store.overwrite_graphs}[step.mode](df)
        elif step.kind == "validate":
            violations = validate(ns[step.source or step.name],
                                  list(step.assertions))
            ns[step.name] = violations
            violations.createOrReplaceTempView(step.name)
            if step.fail_on_violations and violations.limit(1).count() > 0:
                raise ValidationError(
                    f"workflow {pipeline.name!r}: step {step.name!r} found violations"
                )
        else:
            raise ValueError(f"unknown step kind: {step.kind}")
    return ns
