"""Dictionary encoding roundtrip (SURVEY §4 entity-id lever)."""

from __future__ import annotations

from kgap_spark.index.dictionary import (
    build_term_dictionary,
    decode_triples,
    encode_triples,
)
from kgap_spark.triples import build_triples


def test_encode_decode_roundtrip(spark, tiny):
    t = build_triples(tiny["web_pages"], tiny["alias_dict"]).localCheckpoint(True)
    d = build_term_dictionary(t)
    enc = encode_triples(t)
    # literals stay inline, IRIs become ids
    assert enc.filter(enc.obj_id.isNull() & enc.obj_literal.isNull()).count() == 0
    dec = decode_triples(enc, d)
    key = ["subj", "pred", "obj", "obj_lang", "graph"]
    assert dec.select(key).exceptAll(t.select(key)).count() == 0
    assert t.select(key).exceptAll(dec.select(key)).count() == 0


def test_encoding_stable_across_partitionings(spark, tiny):
    t = build_triples(tiny["web_pages"], tiny["alias_dict"]).localCheckpoint(True)
    a = encode_triples(t.repartition(1)).select("subj_id", "pred_id", "obj_id")
    b = encode_triples(t.repartition(7)).select("subj_id", "pred_id", "obj_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
