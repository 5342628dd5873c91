"""Training-data selection ops: per-group top-k, deterministic splits,
distribution stats.

The curation stage between dedup and training: keep the best K docs
per domain, carve reproducible train/val/test splits, and monitor the
length distribution per language. All native Catalyst — and all
content-deterministic, so reruns and backfills produce byte-identical
selections (the property that matters for dataset versioning at
100 TB: a split must never depend on partitioning, row order, or RNG
state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_bucket(key_col: str, mod: int):
    """The content-hash bucket recipe shared by every selection op (and
    inlined into the SQL oracles): md5-prefix(key) as integer, mod N.
    One definition — a drift between split and mixing hashing would
    silently disagree with the oracle and with itself. NULL keys raise
    inside the scan: a NULL bucket would silently drop the row from
    every split/mixture."""
    c = F.col(key_col)
    guarded = F.when(
        c.isNull(),
        F.raise_error(F.lit(f"NULL {key_col} in content-hash bucketing"))
        .cast("string"),
    ).otherwise(c)
    return F.pmod(
        F.conv(F.substring(F.md5(guarded.cast("binary")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(mod),
    )


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    k: int,
) -> DataFrame:
    """Keep the top-k rows per group under a total order (pass a
    unique tie-break column last — determinism rule). Window
    row_number: one shuffle on the group key; with k ≪ group size the
    rank filter prunes before anything downstream."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, int]] = (("train", 80), ("val", 10), ("test", 10)),
) -> DataFrame:
    """Deterministic dataset split by CONTENT hash: bucket =
    md5-prefix(key) mod 100, assigned to named ranges. Stable across
    runs, partitionings, and engines (the md5-prefix integer is the
    same recipe the SQL oracle uses) — reruns never shuffle documents
    between train and test."""
    total = sum(w for _, w in splits)
    if total != 100:
        raise ValueError(f"split weights must sum to 100, got {total}")
    bucket = _hash_bucket(key_col, 100)
    expr = None
    lo = 0
    for name, w in splits:
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn("split", expr)


def weighted_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-source sampling to a target mixture: keep a
    row iff its content-hash bucket (md5-prefix mod 10000) falls under
    its source's fraction. The LLM-data mixing op (e.g. wiki ×2.0 caps
    at 1.0, crawl ×0.3): reproducible across runs/engines — no RNG —
    and a document's fate never depends on partitioning or row order.
    Pure filter: predicate-pushdown friendly, no shuffle."""
    bucket = _hash_bucket(key_col, 10000)
    frac = None
    for src, f in fractions.items():
        cond = F.col(source_col) == src
        frac = F.when(cond, f) if frac is None else frac.when(cond, f)
    frac = (frac.otherwise(default_fraction) if frac is not None
            else F.lit(default_fraction))
    return df.filter(bucket < frac * 10000)


def pack_documents(
    df: DataFrame,
    group_col: str,
    order_col: str,
    token_col: str,
    budget: int = 512,
) -> DataFrame:
    """Concatenate-then-chunk sequence packing (the pretraining data
    layout): within each group, documents are laid out in a
    deterministic order and the token stream is cut into
    ``budget``-token sequences; each doc is assigned the sequence its
    FIRST token falls in (docs may straddle a boundary and continue
    into the next sequence — standard concat-then-chunk semantics).

    One window cumsum per group — groups (e.g. source/domain) bound the
    window partition, so no global sort: the packing parallelizes
    across groups. Adds (start_offset, seq_id). ``order_col`` ties are
    broken by the column itself being unique OR by the secondary sort
    below — without it, tied rows could swap offsets between runs,
    breaking the byte-identical-rerun contract."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(order_col),
                 # deterministic tie-break: full-row fingerprint
                 F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                             for c in df.columns])))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).alias(
        "start_offset"
    )
    return df.withColumn("start_offset", start).withColumn(
        "seq_id", F.floor(F.col("start_offset") / F.lit(budget)).cast("long")
    )


def length_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group exact quantiles (linear interpolation — matches SQL
    percentile_cont/quantile_cont). Exact, not approx: distribution
    drift monitoring wants reproducible numbers; at true corpus scale
    swap in ``percentile_approx`` with a documented error bound."""
    aggs = [
        # round(), not int(): 0.29*100 is 28.999… in binary floating
        # point and int() would label the column p28
        F.round(F.percentile(F.col(value_col), F.lit(q)), 4).alias(
            f"p{round(q * 100)}"
        )
        for q in quantiles
    ]
    return df.groupBy(group_col).agg(*aggs)
