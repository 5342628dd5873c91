"""spark-submit entry point for the KG-construction pipeline.

The north rule requires the pipeline to "run via spark-submit
--py-files on a multi-executor cluster"; this module is that entry:

    spark-submit --py-files kgap_spark.zip -m kgap_spark.job \\
        --pages s3://lake/web_pages \\
        --alias-dict s3://lake/alias_dict \\
        --store s3://lake/triples \\
        --lineage s3://lake/lineage \\
        [--run-id R] [--shuffle-partitions N]

(locally: ``python -m kgap_spark.job --pages ... --alias-dict ...``).

One invocation = one resumable run: graphs already 'ok' in lineage are
skipped, failures are isolated per graph and retried next run
(the reference's scheduled-rerun model, sembench/kgap/main.py:7-13 +
ldes-consumer /state semantics).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kgap_spark.job", description=__doc__)
    ap.add_argument("--pages", required=True, help="web_pages parquet/table path")
    ap.add_argument("--alias-dict", required=True, help="alias_dict parquet path")
    ap.add_argument("--store", required=True, help="triples store path")
    ap.add_argument("--lineage", required=True, help="lineage log path")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--master", default=None,
                    help="override master (default: spark-submit provides it)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--no-dict-graph", action="store_true",
                    help="skip the dictionary graph (labels/sameAs)")
    args = ap.parse_args(argv)

    from kgap_spark.lineage import LineageLog, run_pipeline_resumable
    from kgap_spark.session import get_spark
    from kgap_spark.triples import TripleStore

    spark = get_spark(
        "kgap-job", master=args.master, shuffle_partitions=args.shuffle_partitions
    )
    pages = spark.read.parquet(args.pages)
    alias = spark.read.parquet(args.alias_dict)
    store = TripleStore(spark, args.store)
    lineage = LineageLog(spark, args.lineage)

    result = run_pipeline_resumable(
        spark, pages, alias, store, lineage,
        run_id=args.run_id,
        include_dict_graph=not args.no_dict_graph,
    )
    print(json.dumps({
        "run_id": result["run_id"],
        "graphs_done": len(result["graphs_done"]),
        "graphs_failed": result["graphs_failed"],
        "triples_out": result["triples_out"],
        "wall_ms": result["wall_ms"],
    }))
    return 1 if result["graphs_failed"] else 0


if __name__ == "__main__":
    sys.exit(main())
