"""Two-parallelism-level scaling benchmark (BASELINE.json north rule).

No real multi-node cluster exists in this sandbox, so the N→4N
executor-scaling criterion is evidenced by running the SAME job on the
SAME input at local[N] and local[4N] (driver instructions): the full KG
pipeline (extract → mentions → link → canonicalize → materialize →
write) over a bench-scale fixture corpus, reporting triples/sec at both
levels and efficiency = T_N / (4 · T_4N).

Each measurement runs in its own subprocess (fresh JVM — no cross-level
JIT/cache contamination). Results are written to BENCH/BASELINE.md.

Usage:
    python tools/scaling_bench.py                 # orchestrate both levels
    python tools/scaling_bench.py --measure 8     # one level (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_DIR = os.path.join(REPO, ".bench")
PAGES = os.path.join(BENCH_DIR, "web_pages")
ALIAS = os.path.join(BENCH_DIR, "alias_dict.parquet")
N_LOW = int(os.environ.get("KGAP_SCALE_N", "8"))
N_HIGH = 4 * N_LOW


def prepare() -> None:
    """Generate the bench corpus once (distributed, order-independent)."""
    from kgap_spark.fixtures import FixtureConfig, alias_rows, generate_web_pages_distributed
    from kgap_spark.session import get_spark

    if os.path.isdir(PAGES) and os.path.isfile(ALIAS):
        return
    os.makedirs(BENCH_DIR, exist_ok=True)
    cfg = FixtureConfig.for_scale("bench")
    spark = get_spark("bench-gen", master="local[32]", shuffle_partitions=32)
    generate_web_pages_distributed(spark, cfg, PAGES)

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pylist(alias_rows(cfg)), ALIAS)
    spark.stop()


def measure(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from kgap_spark.session import get_spark
    from kgap_spark.triples import TripleStore, build_triples

    spark = get_spark(
        f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    pages = spark.read.parquet(PAGES)
    alias = spark.read.parquet(ALIAS)
    n_pages = pages.count()

    out_path = os.path.join(BENCH_DIR, f"triples_out_{cpus}")
    import shutil

    shutil.rmtree(out_path, ignore_errors=True)
    store = TripleStore(spark, out_path, files_per_graph=max(2, cpus // 4))

    t0 = time.monotonic()
    triples = build_triples(pages, alias)
    store.overwrite_graphs(triples)
    wall = time.monotonic() - t0
    n_triples = store.read().count()
    spark.stop()
    return {
        "cpus": cpus,
        "wall_sec": round(wall, 2),
        "n_pages": n_pages,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / wall, 1),
        "pages_per_sec": round(n_pages / wall, 1),
    }


def orchestrate() -> None:
    prepare()
    results = {}
    for cpus in (N_LOW, N_HIGH):
        out = subprocess.run(
            [sys.executable, __file__, "--measure", str(cpus)],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(f"local[{cpus}]: {results[cpus]}")

    t_n, t_4n = results[N_LOW]["wall_sec"], results[N_HIGH]["wall_sec"]
    speedup = t_n / t_4n
    efficiency = speedup / 4.0
    report = {
        "low": results[N_LOW],
        "high": results[N_HIGH],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(_markdown(report))


def _markdown(r: dict) -> str:
    lo, hi = r["low"], r["high"]
    return f"""# BENCH/BASELINE — KG pipeline throughput & scaling

Full pipeline (extract → mention detection → entity linking →
connected-components canonicalization → triple materialization →
partitioned write) over the deterministic bench corpus
({lo['n_pages']:,} web pages → {lo['n_triples']:,} triples), identical
input at two local parallelism levels (the sandbox substitute for the
N vs 4N executor-scaling criterion in BASELINE.json — no multi-node
cluster is available here).

| parallelism | wall (s) | triples/sec | pages/sec |
|---|---|---|---|
| local[{lo['cpus']}]  (N)  | {lo['wall_sec']} | {lo['triples_per_sec']:,} | {lo['pages_per_sec']:,} |
| local[{hi['cpus']}] (4N) | {hi['wall_sec']} | {hi['triples_per_sec']:,} | {hi['pages_per_sec']:,} |

- **Speedup N→4N:** {r['speedup']}×
- **Scaling efficiency** (speedup / 4): **{r['scaling_efficiency']}**
  (target ≥ 0.8 per BASELINE.json)

Reproduce: `python tools/scaling_bench.py` (corpus auto-generated,
seed 42, to `.bench/`). Per-level runs are separate JVMs.

Reference context: the reference publishes no throughput numbers
(BASELINE.md); its store is sized 4 CPUs / 8-16 GB heap
(docker-compose.yml:21,24), so any single-node figure here already
exceeds the reference's deployment envelope.
"""


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--measure":
        print(json.dumps(measure(int(sys.argv[2]))))
    else:
        orchestrate()
