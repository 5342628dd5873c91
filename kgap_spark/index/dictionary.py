"""Entity dictionary encoding: IRI strings → compact long ids.

GraphDB dictionary-encodes entities into 32-bit ids sized for 10M
entities (reference: ``graphdb/kgap/template-repo-config.ttl:21-22``,
tuned to 40-bit for larger stores, ``docs/components/graphdb.md:
472-477``). At 10^12-triple scale, self-joining on long ids instead of
IRI strings cuts shuffle width and hash cost by ~an order of magnitude
(SURVEY §4 "entity dictionary encoding" lever).

Ids are ``xxhash64`` of the term — content-derived, so encoding is
embarrassingly parallel, stable across runs/partitions, and needs no
global sort or sequence. Collisions are detected (not silently
tolerated): ``build_term_dictionary`` fails fast if two distinct terms
hash to one id (probability ~n²/2⁶⁴; ~10⁻⁷ at 10⁸ terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IRI_RE = "^(https?|urn):"


def build_term_dictionary(triples: DataFrame) -> DataFrame:
    """All IRI terms (subjects + IRI objects + predicates) → (term,
    term_id long). One scan + one distinct."""
    terms = (
        triples.select(F.col("subj").alias("term"))
        .unionByName(triples.select(F.col("pred").alias("term")))
        .unionByName(
            triples.filter(F.col("obj").rlike(IRI_RE)).select(
                F.col("obj").alias("term")
            )
        )
        .distinct()
    )
    # materialize ONCE: the collision check is a full action over the
    # union+distinct pipeline, and returning the lazy plan would make
    # the caller's first action re-run that whole shuffle
    d = terms.withColumn("term_id", F.xxhash64("term")).localCheckpoint(
        eager=True
    )
    # fail fast on hash collision rather than silently merging entities
    collisions = (
        d.groupBy("term_id").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
    )
    if collisions.limit(1).count() > 0:  # pragma: no cover - ~2^-64 per pair
        raise RuntimeError("xxhash64 term collision — re-key with a salt")
    return d


def encode_triples(triples: DataFrame) -> DataFrame:
    """Quad table → id-encoded form:
    (subj_id, pred_id, obj_id | obj_literal, obj_lang, obj_datatype,
    graph). IRIs become ids; literals stay inline with a null obj_id.

    Encoding is pure column computation (xxhash64) — no dictionary join
    needed on the encode side; the dictionary is only for decoding.
    """
    obj_is_iri = F.col("obj").rlike(IRI_RE)
    return triples.select(
        F.xxhash64("subj").alias("subj_id"),
        F.xxhash64("pred").alias("pred_id"),
        F.when(obj_is_iri, F.xxhash64("obj")).alias("obj_id"),
        F.when(~obj_is_iri, F.col("obj")).alias("obj_literal"),
        "obj_lang",
        "obj_datatype",
        "graph",
    )


def decode_triples(encoded: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Id-encoded triples + dictionary → string form. Three hash joins
    against the (broadcastable at dictionary scale) term table."""
    def lookup(alias: str):
        return dictionary.select(
            F.col("term_id").alias(f"{alias}_key"), F.col("term").alias(f"{alias}_term")
        )

    out = (
        encoded.join(F.broadcast(lookup("s")),
                     encoded["subj_id"] == F.col("s_key"), "left")
        .join(F.broadcast(lookup("p")), encoded["pred_id"] == F.col("p_key"), "left")
        .join(F.broadcast(lookup("o")), encoded["obj_id"] == F.col("o_key"), "left")
    )
    return out.select(
        F.col("s_term").alias("subj"),
        F.col("p_term").alias("pred"),
        F.coalesce(F.col("o_term"), F.col("obj_literal")).alias("obj"),
        "obj_lang",
        "obj_datatype",
        "graph",
    )
