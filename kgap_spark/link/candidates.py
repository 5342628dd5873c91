"""Fuzzy candidate generation: MinHash/LSH blocking over alias strings.

The exact-match candidate path is the broadcast dictionary join in
``mentions.detect``; this module adds the *fuzzy* path the north star
calls for ("MinHash/LSH blocking"): surface forms that don't exactly
match an alias (typos, inflections) are blocked against the dictionary
with character-shingle MinHash, and only within-block pairs are scored.

Built on Spark ML's ``MinHashLSH`` (built-in, JVM-side) over a
``HashingTF`` of character 3-gram shingles — no Python in the join.
At 100 TB the ``approxSimilarityJoin`` is a bucket-join on hash bands:
cost scales with bucket collisions, not the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_LEN = 3
NUM_FEATURES = 1 << 18
NUM_HASH_TABLES = 5


def _shingle_col(col: str):
    """Character 3-gram shingles of a lowercased string, as an array.

    ``sequence`` + ``transform`` keeps it all in Catalyst.
    """
    s = F.lower(F.col(col))
    n = F.length(s)
    return F.when(
        n >= SHINGLE_LEN,
        F.expr(
            f"transform(sequence(1, length(lower({col})) - {SHINGLE_LEN - 1}), "
            f"i -> substring(lower({col}), i, {SHINGLE_LEN}))"
        ),
    ).otherwise(F.array(s))


def fuzzy_candidates(
    surfaces: DataFrame,
    alias_dict: DataFrame,
    surface_col: str = "surface",
    max_jaccard_dist: float = 0.4,
) -> DataFrame:
    """Block surface forms against dictionary aliases with MinHash LSH.

    surfaces: DataFrame with a string column ``surface_col``.
    Returns (surface, alias, entity_id, prior, jaccard_dist).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    # NULL/empty strings would shingle to array(NULL) and crash
    # HashingTF with a JVM NPE — drop them before vectorizing
    left = (
        surfaces.select(F.col(surface_col).alias("surface"))
        .filter(F.col("surface").isNotNull() & (F.col("surface") != ""))
        .distinct()
        .withColumn("shingles", _shingle_col("surface"))
        .filter(F.size("shingles") > 0)
    )
    right = (
        alias_dict.select(
            "alias", "entity_id", "prior",
            F.col("lang").alias("alias_lang"),
        )
        .filter(F.col("alias").isNotNull() & (F.col("alias") != ""))
        .withColumn("shingles", _shingle_col("alias"))
        .filter(F.size("shingles") > 0)
    )

    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=NUM_FEATURES
    )
    left_f = tf.transform(left)
    right_f = tf.transform(right)

    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=NUM_HASH_TABLES,
        seed=42,
    )
    model = lsh.fit(right_f)

    pairs = model.approxSimilarityJoin(
        left_f, right_f, max_jaccard_dist, distCol="jaccard_dist"
    )
    return pairs.select(
        F.col("datasetA.surface").alias("surface"),
        F.col("datasetB.alias").alias("alias"),
        F.col("datasetB.entity_id").alias("entity_id"),
        F.col("datasetB.prior").alias("prior"),
        F.col("datasetB.alias_lang").alias("alias_lang"),
        F.col("jaccard_dist"),
    )
