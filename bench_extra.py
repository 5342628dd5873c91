"""Round-7 optimization harness (guide §1): per-query isolation with
the noop sink, min-of-N timing, and `.explain("formatted")` capture.

NOT the graded bench — `bench.py` is frozen; this file exists so the
optimization work can (a) time the computation without the count()
short-circuit debate, (b) snapshot plan shapes into plans/r07/, and
(c) compare before/after per query without re-running the whole
headline suite.

Usage:
  python bench_extra.py plans <outdir>       # write explain() per query
  python bench_extra.py time [q ...]         # noop-timed, min-of-3
  python bench_extra.py count [q ...]        # bench.py-identical count() timing
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "kg_mentions",
    "tpch_q1",
    "tpch_q5",
    "bgp_chain",
    "left_join",
    "latest_version",
    "sessionize",
    "fts_search_indexed",
    "minhash_band",
    "simhash",
    "ngram_jaccard",
    "emb_cosine_topk",
    "emb_lsh_topk",
    "doc_lang_id",
    "dedup_exact",
    "multimodal_features",
]


def _session():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from kgap_spark.session import get_spark
    from kgap_spark.workload import EXTRA_QUERIES, QUERIES as CORE

    queries = {**CORE, **EXTRA_QUERIES}
    spark = get_spark(
        "kgap-bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    # same index warmup as bench.py so the timed path is the pruned one
    queries["fts_search_indexed"](spark, sf_dir).count()
    queries["emb_lsh_topk"](spark, sf_dir).count()
    return spark, queries, sf_dir


def cmd_plans(outdir: str, names: list[str]) -> None:
    spark, queries, sf_dir = _session()
    os.makedirs(outdir, exist_ok=True)
    for name in names or HEADLINE:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {outdir}/{name}.txt", file=sys.stderr)
    spark.stop()


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cmd_time(names: list[str], repeats: int = 3, sink: str = "noop") -> None:
    spark, queries, sf_dir = _session()
    names = names or HEADLINE
    # warmup pass (codegen/JIT), same spirit as bench.py
    for name in names:
        queries[name](spark, sf_dir).count()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"r07:{name}")
            df = queries[name](spark, sf_dir)
            t0 = time.monotonic()
            if sink == "noop":
                _noop(df)
            else:
                df.count()
            samples[name].append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {n: round(min(ts), 3) for n, ts in samples.items()}
    print(json.dumps({"sink": sink, "queries": out,
                      "total": round(sum(out.values()), 3),
                      "samples": {n: [round(t, 3) for t in ts]
                                  for n, ts in samples.items()}}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    rest = sys.argv[2:]
    if mode == "plans":
        cmd_plans(rest[0], rest[1:])
    elif mode == "time":
        cmd_time(rest)
    elif mode == "count":
        cmd_time(rest, sink="count")
    else:
        raise SystemExit(f"unknown mode {mode}")
