"""Deduplication operators: exact, n-gram Jaccard, MinHash banding,
Spark-ML MinHash LSH, SimHash.

Web-corpus dedup is the first heavy stage of any 100 TB training-data
pipeline. Design rules here: (1) everything shuffles on *shingle/band
keys*, never on document pairs — the candidate set is built by
bucket-join, so cost follows collisions, not |docs|²; (2) all hashes
are content-derived (md5 of the shingle text) so results are
deterministic, partition-invariant, and reproducible in the ANSI-SQL
oracle (DuckDB md5 == Spark md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgap_spark.functions.textstats import fingerprint, ws_tokens as _ws_tokens


def _shingles_from_toks(n: int):
    """Distinct word n-gram shingles from a ``_t`` token-array column."""
    parts = ", ".join(f"_t[i + {k}]" for k in range(n))
    return F.expr(
        f"CASE WHEN size(_t) >= {n} THEN "
        f"array_distinct(transform(slice(_t, 1, size(_t) - {n - 1}), "
        f"(x, i) -> concat_ws(' ', {parts}))) ELSE array() END"
    )


def with_shingle_array(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """docs → (doc, shingles: array<string>) with distinct word n-grams."""
    return (
        docs.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_txt"))
        .withColumn("_t", _ws_tokens(F.col("_txt")))
        .withColumn("shingles", _shingles_from_toks(n))
        .select("doc", "shingles")
    )


def _with_shingles(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return (
        with_shingle_array(docs, id_col, text_col, n)
        .withColumn("shingle", F.explode("shingles"))
        .select("doc", "shingle")
    )


def _pairs_from_sorted_docs(docs_col: str = "_docs"):
    """In-task (doc_a < doc_b) pair expansion from a sorted doc-id list
    — the posting-list formulation shared by the jaccard and banding
    paths (one definition: any fix to the expansion bound or slice
    offset applies to both)."""
    return F.flatten(
        F.transform(
            docs_col,
            lambda x, i: F.transform(
                F.slice(F.col(docs_col), i + 2, F.size(F.col(docs_col))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )


def exact_duplicates(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: normalize → md5 → group. Returns one
    row per duplicate *group* (fingerprint, n_docs, first/last doc id).
    One shuffle on the fingerprint; partial agg does the heavy lifting."""
    return (
        docs.select(F.col(id_col).alias("doc"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc").alias("first_doc"),
            F.max("doc").alias("last_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


MAX_SHINGLE_DF = 1000  # default document-frequency cap for the self-join


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard ≥ threshold.

    Inverted-index join: explode distinct shingles, self-join on the
    shingle (pairs only materialize where docs actually share one),
    then |A∩B| via count and |A∪B| via per-doc sizes.

    **Scale guard — document-frequency cap:** a boilerplate shingle
    shared by 10⁶ docs would alone create ~10¹² pairs in the self-join.
    Shingles with df > ``max_shingle_df`` are dropped *before* the join
    (the same hub-key cap as ``connected_components.MAX_ALIAS_GROUP``),
    bounding pair production at df² × |hot shingles|. Jaccard is then
    computed over the *filtered* shingle space (sizes from the filtered
    index too), so hot-boilerplate shingles don't dilute the score —
    genuinely near-duplicate docs keep their high jaccard. Pass
    ``max_shingle_df=None`` to disable (small fixtures only)."""
    sh = _with_shingles(docs, id_col, text_col, n)
    # Posting-list formulation: ONE groupBy(shingle) replaces the
    # exploded self-join (which shuffles the full shingle table twice
    # and materializes df² rows per shingle in the join). The df-cap
    # bounds every posting list, so the in-task pair expansion is
    # ≤ cap²/2 per shingle — and pair counts aggregate map-side before
    # the (doc_a, doc_b) shuffle.
    posting = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc")).alias("_docs"),
        F.count(F.lit(1)).alias("_df"),
    )
    if max_shingle_df is not None:
        posting = posting.filter(F.col("_df") <= max_shingle_df)
    # r07: the posting table feeds THREE consumers (sizes, and the two
    # size legs of the jaccard join); Spark re-plans and re-executes
    # the whole scan→shingle→shuffle subtree for each (exchange reuse
    # does not fire across the HOF-lambda shingle expressions). A lazy
    # local checkpoint truncates the plan so the corpus-scale pass runs
    # ONCE per invocation — nothing persists across calls, each fresh
    # ngram_jaccard_pairs() call recomputes from the inputs.
    posting = posting.localCheckpoint(eager=False)
    sizes = (
        posting.select(F.explode("_docs").alias("doc"))
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    pair_array = _pairs_from_sorted_docs()
    inter = (
        posting.select(F.explode(pair_array).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _jaccard_from_intersections(inter, sizes, threshold)


def _jaccard_from_intersections(
    inter: DataFrame, sizes: DataFrame, threshold: float,
    inclusive: bool = True,
) -> DataFrame:
    """(doc_a, doc_b, inter) + per-doc set sizes → thresholded
    (doc_a, doc_b, jaccard). The shared scoring tail of the jaccard
    and LSH-join paths — one definition, so any fix to the rounding or
    threshold semantics applies to both (same policy as
    ``_pairs_from_sorted_docs``). ``inclusive`` filters the ROUNDED
    jaccard at ``>= threshold`` (the ngram-pairs API); the strict mode
    filters the UNROUNDED value at ``> threshold`` — Spark ML
    ``approxSimilarityJoin``'s ``dist < max_dist`` boundary, where a
    4dp round-up must not admit a below-threshold pair."""
    raw = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    cond = (F.round(raw, 4) >= threshold) if inclusive \
        else (raw > threshold)
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a")
                   .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .filter(cond)
        .withColumn("jaccard", F.round(raw, 4))
        .select("doc_a", "doc_b", "jaccard")
    )


MAX_BUCKET_DOCS = MAX_SHINGLE_DF  # df-cap for LSH band buckets


def _cap_buckets(bucket: DataFrame, max_bucket_docs: int | None) -> DataFrame:
    """Drop band buckets larger than ``max_bucket_docs`` BEFORE pair
    expansion — the same hub-key guard as ``max_shingle_df`` and
    ``connected_components.MAX_ALIAS_GROUP``. A bucket of 10⁶ docs
    (boilerplate cluster, or exact dupes fed to LSH without exact
    dedup first) is a single-task 5·10¹¹-pair bomb; an over-cap bucket
    is an exact-/near-identical cluster that belongs to
    ``exact_duplicates``, not a candidate set. Use
    ``lsh_overflow_buckets`` to count/route what was dropped."""
    if max_bucket_docs is None:
        return bucket
    return bucket.filter(F.size("_docs") <= max_bucket_docs)


def lsh_overflow_buckets(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    bands: int = 4,
    max_bucket_docs: int = MAX_BUCKET_DOCS,
) -> DataFrame:
    """The band buckets ``minhash_band_candidates`` DROPS under its
    bucket cap — (band, band_sig, n_docs) per over-cap bucket, so a
    pipeline can surface the counts and route those documents to
    ``exact_duplicates`` (an over-cap bucket means a near-identical
    cluster, not a pairwise-candidate set)."""
    return (
        _band_signatures(docs, id_col, text_col, n, bands)
        .groupBy("band", "band_sig")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket_docs)
    )


def _band_signatures(docs, id_col, text_col, n, bands):
    """(doc, band, band_sig) — per-row array_min signatures (no
    shuffle); shared by the candidate and overflow paths."""
    sh = with_shingle_array(docs, id_col, text_col, n).filter(
        F.size("shingles") > 0
    )
    return sh.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.array_min(
                        F.transform(
                            "shingles",
                            lambda s: F.md5(
                                F.concat(F.lit(str(b) + ":"), s)
                                .cast("binary")
                            ),
                        )
                    ).alias("band_sig"),
                )
                for b in range(bands)
            ])
        ).alias("_bs"),
    ).select("doc", "_bs.band", "_bs.band_sig")


def minhash_band_candidates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    bands: int = 4,
    max_bucket_docs: int | None = MAX_BUCKET_DOCS,
) -> DataFrame:
    """MinHash + LSH banding, content-hash flavor: per band b, the
    document's signature is min(md5(b || shingle)); docs agreeing on any
    band's signature are candidate near-duplicates.

    shingle→minhash→band→bucket-join, all in native SQL functions. The
    band bucket-join is the only pair-producing step — candidate count
    scales with bucket collisions.

    r07 shuffle removal (guide §2.3/§2.4): the per-(doc, band) min used
    to be an explode + groupBy — a shuffle of |docs|·|shingles|·bands
    rows. But every doc's shingles sit in ONE row after shingling, so
    the band signature is a per-row ``array_min(transform(...))`` —
    zero shuffle, and the first exchange now carries only
    |docs|·bands signature rows (the 100 TB win: the shuffled bytes no
    longer scale with document length). (min(md5) over the multiset ==
    min over the distinct set, so no array_distinct needed; md5
    strings compare exactly like F.min over exploded rows did.)

    **Scale guard — bucket cap:** buckets with more than
    ``max_bucket_docs`` documents are dropped before pair expansion
    (see ``_cap_buckets``); ``lsh_overflow_buckets`` reports them.
    Pass ``None`` to disable (small fixtures only)."""
    sig = _band_signatures(docs, id_col, text_col, n, bands)
    # posting-list pair generation (see ngram_jaccard_pairs): one
    # groupBy on the bucket key instead of a self-join — candidates
    # expand in-task from each bucket's (bounded) doc list
    bucket = _cap_buckets(
        sig.groupBy("band", "band_sig").agg(
            F.sort_array(F.collect_list("doc")).alias("_docs")
        ),
        max_bucket_docs,
    )
    pair_array = _pairs_from_sorted_docs()
    return (
        bucket.select(F.explode(pair_array).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def minhash_lsh_approx_join(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_jaccard_dist: float = 0.5,
    num_perm: int = 16,
    bands: int = 4,
    max_bucket_docs: int | None = MAX_BUCKET_DOCS,
) -> DataFrame:
    """Deterministic MinHash-LSH approximate similarity join — the
    same API and semantics as ``minhash_lsh_near_duplicates`` (Spark
    ML's ``MinHashLSH.approxSimilarityJoin`` analog) but built on the
    repo's own seeded hash family (md5 of ``perm || ':' || shingle``),
    so every stage is reproducible in plain SQL; the ML variant's
    JVM-internal hash coefficients are not.

    Stages, each one shuffle: (1) signature — per permutation p the
    doc's minhash is min(md5(p:shingle)); (2) banding — the num_perm
    permutations split into ``bands`` groups of consecutive rows whose
    minhashes concatenate into a band signature; (3) candidates —
    docs agreeing on ANY band signature, generated by the
    posting-list bucket expansion (the ONLY pair-producing step:
    bucket-join, never all-pairs); (4) distance — EXACT jaccard over
    the candidate pairs' shingle sets (what approxSimilarityJoin
    computes via keyDistance), kept when jaccard > 1 − max_jaccard_dist
    unrounded — the strict ``dist < threshold`` boundary the ML join
    applies, so a swap between the two variants keeps boundary pairs
    identical (up to LSH banding recall).
    """
    if num_perm % bands != 0:
        raise ValueError("num_perm must be a multiple of bands")
    rows_per_band = num_perm // bands
    sh = _with_shingles(docs, id_col, text_col, n)

    # r07 shuffle removal (guide §2.3/§2.4, same as
    # minhash_band_candidates): the per-(doc, perm) minhash and the
    # per-(doc, band) signature used to be TWO explode+groupBy shuffles
    # of |docs|·|shingles|·num_perm rows; both are per-row array
    # expressions over the doc's shingle array — zero shuffles before
    # the bucket groupBy, whose input is now |docs|·bands rows.
    def _mh(p: int):
        return F.array_min(
            F.transform(
                "shingles",
                lambda s: F.md5(
                    F.concat(F.lit(str(p) + ":"), s).cast("binary")
                ),
            )
        )

    sharr = with_shingle_array(docs, id_col, text_col, n).filter(
        F.size("shingles") > 0
    )
    bandsig = sharr.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "|",
                        *[_mh(b * rows_per_band + r)
                          for r in range(rows_per_band)],
                    ).alias("sig"),
                )
                for b in range(bands)
            ])
        ).alias("_bs"),
    ).select("doc", "_bs.band", "_bs.sig")
    bucket = _cap_buckets(
        bandsig.groupBy("band", "sig").agg(
            F.sort_array(F.collect_list("doc")).alias("_docs")
        ),
        max_bucket_docs,
    )
    pair_array = _pairs_from_sorted_docs()
    cand = (
        bucket.select(F.explode(pair_array).alias("pr"))
        .select("pr.doc_a", "pr.doc_b")
        .distinct()
    )
    # |shingle set| per doc is the size of the (already-distinct)
    # per-row shingle array — no groupBy shuffle needed
    sizes = sharr.select("doc", F.size("shingles").alias("sz"))
    inter = (
        cand.join(sh.withColumnRenamed("doc", "doc_a"), "doc_a")
        .join(
            sh.withColumnRenamed("doc", "doc_b"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _jaccard_from_intersections(inter, sizes,
                                       1.0 - max_jaccard_dist,
                                       inclusive=False)


def minhash_lsh_near_duplicates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_jaccard_dist: float = 0.5,
    num_hash_tables: int = 5,
) -> DataFrame:
    """Spark-ML flavor: HashingTF over shingles → MinHashLSH
    approxSimilarityJoin. JVM-side end-to-end; the scale path when the
    corpus doesn't fit the pure-SQL banding above."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    base = with_shingle_array(docs, id_col, text_col, n).filter(
        F.size("shingles") > 0
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(base)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, max_jaccard_dist,
                                       distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc") < F.col("datasetB.doc"))
        .select(
            F.col("datasetA.doc").alias("doc_a"),
            F.col("datasetB.doc").alias("doc_b"),
            F.round(F.lit(1.0) - F.col("jaccard_dist"), 4).alias("jaccard"),
        )
    )


SIMHASH_BITS = 32


def simhash(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash over word tokens, content-hash flavor: token hash =
    first 8 hex chars of md5 (portable to the SQL oracle), bit votes
    weighted by term frequency, sign-aggregated natively (one shuffle on
    doc id, 32 conditional sums — all inside whole-stage codegen)."""
    toks = (
        docs.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_txt"))
        .select(
            "doc",
            F.explode(_ws_tokens(F.col("_txt"))).alias("tok"),
        )
        .groupBy("doc", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 8),
                                16, 10).cast("long"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc").agg(*votes)
    sim = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0)).cast("long")
        sim = bit if sim is None else (sim + bit)
    return agg.select("doc", sim.alias("simhash"))
