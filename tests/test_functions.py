"""Training-data ops: dedup, similarity, textstats, FTS, multimodal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),      # near-dup of 0
    (2, "The  quick brown fox jumps over the lazy dog "),    # exact dup of 0 (normalized)
    (3, "completely different content about marine sensors"),
    (4, "der schnelle braune fuchs und die katze ist hier"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    from kgap_spark.functions.dedup import exact_duplicates

    groups = exact_duplicates(docs, "doc_id", "text").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.n_docs == 2 and g.first_doc == 0 and g.last_doc == 2


def test_ngram_jaccard(spark, docs):
    from kgap_spark.functions.dedup import ngram_jaccard_pairs

    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                          threshold=0.3).collect()}
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0   # exact dup
    assert (0, 1) in pairs and 0.5 < pairs[(0, 1)] < 1.0  # near dup
    assert (0, 3) not in pairs


def test_ngram_jaccard_df_cap_bounds_hot_shingles(spark):
    """Scale guard: a boilerplate shingle shared by every doc must not
    produce quadratic pairs; true near-dups keep their high jaccard."""
    from kgap_spark.functions.dedup import ngram_jaccard_pairs

    boiler = "copyright acme corp all rights reserved"
    rows = [(i, f"unique text number {i} alpha beta {boiler}")
            for i in range(30)]
    # one genuine near-dup pair sharing real content
    rows += [(100, "marine sensor deployment in the north sea basin " + boiler),
             (101, "marine sensor deployment in the north sea harbour " + boiler)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # cap at 5: every boilerplate shingle (df=32) is dropped pre-join
    capped = ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                 threshold=0.25, max_shingle_df=5).collect()
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in capped}
    assert (100, 101) in pairs and pairs[(100, 101)] > 0.4
    # the 30 boilerplate-only docs share nothing after the cap: no pair blowup
    assert all(a >= 100 for (a, b) in pairs)

    # uncapped, the hot shingles materialize hundreds of candidate pairs
    uncapped = ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                   threshold=0.01, max_shingle_df=None).count()
    assert uncapped > 100


def test_ngram_jaccard_cap_sized_posting_list(spark):
    """Worst-case bounded expansion: ONE shingle whose df is EXACTLY
    max_shingle_df survives the cap, so the in-task flatten expands the
    full cap²/2 pair structs from a single posting row. Must complete
    (bounded executor memory), produce only sub-threshold candidates
    from the hot shingle, and leave the true near-dup result identical
    to a run where the hot shingle is dropped (cap-1)."""
    from kgap_spark.functions.dedup import ngram_jaccard_pairs

    cap = 200
    hot = "shared boilerplate footer"
    # `cap` docs: each contributes the hot shingle ONCE plus unique tail
    rows = [(i, f"{hot} unique{i} tail{i} end{i}") for i in range(cap)]
    # a genuine near-dup pair WITHOUT the hot shingle
    rows += [(900, "deep sea probe records salinity and temperature daily"),
             (901, "deep sea probe records salinity and temperature hourly")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    at_cap = ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                 threshold=0.5, max_shingle_df=cap)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in at_cap.collect()}
    # the hot shingle's 19 900 in-task pairs all score 1/(4+4-1) < 0.5:
    # only the genuine near-dup pair survives the threshold
    assert set(got) == {(900, 901)} and got[(900, 901)] > 0.6

    below = ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                threshold=0.5, max_shingle_df=cap - 1)
    assert {(r.doc_a, r.doc_b) for r in below.collect()} == {(900, 901)}

    # candidate volume sanity: at the cap the hot shingle contributes
    # cap·(cap-1)/2 intersection pairs before thresholding
    n_cand = ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                 threshold=0.0, max_shingle_df=cap).count()
    assert n_cand >= cap * (cap - 1) // 2


def test_minhash_band_candidates(spark, docs):
    from kgap_spark.functions.dedup import minhash_band_candidates

    cands = {(r.doc_a, r.doc_b)
             for r in minhash_band_candidates(docs, "doc_id", "text",
                                              n=3, bands=4).collect()}
    assert (0, 2) in cands          # identical shingle sets → all bands agree
    assert (0, 4) not in cands      # disjoint shingles


def test_minhash_lsh_approx_join_matches_exact_jaccard(spark, docs):
    """The deterministic seeded-md5 LSH join: candidate recall on true
    near-dups, exact-jaccard distances on the pairs it returns, and
    no pair below the similarity floor."""
    from kgap_spark.functions.dedup import (
        minhash_lsh_approx_join,
        ngram_jaccard_pairs,
    )

    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in minhash_lsh_approx_join(
               docs, "doc_id", "text", n=3, max_jaccard_dist=0.6,
           ).collect()}
    assert (0, 2) in got and (0, 1) in got
    assert got[(0, 2)] == 1.0  # identical shingle sets
    # distances agree with the exact all-candidate jaccard path
    exact = {(r.doc_a, r.doc_b): r.jaccard
             for r in ngram_jaccard_pairs(
                 docs, "doc_id", "text", n=3, threshold=0.4,
                 max_shingle_df=1 << 20,
             ).collect()}
    for pair, j in got.items():
        assert exact.get(pair) == j
    assert all(j >= 0.4 for j in got.values())


def test_minhash_lsh_ml_agrees_with_exact(spark, docs):
    from kgap_spark.functions.dedup import minhash_lsh_near_duplicates

    pairs = {(r.doc_a, r.doc_b)
             for r in minhash_lsh_near_duplicates(docs, "doc_id", "text", n=3,
                                                  max_jaccard_dist=0.6).collect()}
    assert (0, 2) in pairs and (0, 1) in pairs


def test_simhash_similarity_ordering(spark, docs):
    from kgap_spark.functions.dedup import simhash

    h = {r.doc: r.simhash for r in simhash(docs, "doc_id", "text").collect()}
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(h[0], h[2]) == 0              # normalized-identical docs
    assert ham(h[0], h[1]) < ham(h[0], h[3])  # near-dup closer than unrelated


def test_textstats(spark, docs):
    from kgap_spark.functions.textstats import with_text_stats

    stats = {r.doc_id: r for r in with_text_stats(docs).collect()}
    assert stats[0].n_tokens == 9
    assert stats[0].lang_pred == "en"
    assert stats[4].lang_pred == "de"
    assert stats[0].fingerprint == stats[2].fingerprint
    assert 0.0 <= stats[0].quality <= 1.0


def test_repetition_stats(spark):
    from kgap_spark.functions.textstats import repetition_stats

    rows = [(0, "spam spam spam spam spam spam"),     # 1 word repeated
            (1, "all words here are unique tokens"),
            (2, "ab cd ef ab cd ef ab cd ef")]        # repeated trigrams
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           repetition_stats(docs, "doc_id", "text").collect()}
    assert got[0].top_word_frac == 1.0
    assert got[0].dup_trigram_frac == 0.75  # 4 trigrams, 1 distinct
    assert got[1].top_word_frac == pytest.approx(1 / 6, abs=1e-6)
    assert got[1].dup_trigram_frac == 0.0
    # doc 2: 7 trigrams, 3 distinct → 4/7 duplicated
    assert got[2].dup_trigram_frac == pytest.approx(4 / 7, abs=1e-6)


def test_redact_pii(spark):
    from kgap_spark.functions.textstats import redact_pii

    rows = [(0, "mail me at jane.doe+x@lab.example.org or +32 468 123456 now"),
            (1, "no pii in this one")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(docs, "doc_id", "text").collect()}
    assert got[0].n_emails == 1 and got[0].n_phones == 1
    assert got[0].clean_text == "mail me at [EMAIL] or [PHONE] now"
    assert got[1].n_emails == 0 and got[1].n_phones == 0
    assert got[1].clean_text == "no pii in this one"


def test_fts(spark, docs):
    from kgap_spark.index.fts import build_posting_table, fts_search

    posting = build_posting_table(docs, "doc_id", "text")
    hits = fts_search(posting, "fox dog", k=10).collect()
    assert hits[0].subj in (0, 2) and hits[0].score == 2  # fox + dog
    subj_scores = {r.subj: r.score for r in hits}
    assert subj_scores[1] == 1  # fox only
    assert 3 not in subj_scores


def test_fts_tfidf_downweights_stopwords(spark, tmp_path):
    """tf·idf ranking: a corpus-wide token (df=N → idf≈ln(1)=0) must no
    longer drown a rare term — the doc with ONE 'rare' hit outranks the
    doc with many 'the' hits; under plain TF the order is reversed.
    Also: the query tokenizer uses the index's rule, so a punctuated
    query ('the-rare') still matches."""
    from kgap_spark.index.fts import (
        build_posting_table,
        fts_search,
        fts_search_indexed,
        write_posting_table,
    )

    # "the" is in EVERY doc (df=N → idf=ln((N+1)/(N+1))=0)
    rows = [(0, "the the the the the common words"),
            (1, "the rare treasure"),
            (2, "the ordinary text"),
            (3, "the filler the filler")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    posting = build_posting_table(docs, "doc_id", "text")

    tf_top = fts_search(posting, "the rare", k=4).collect()[0]
    assert tf_top.subj == 0  # TF: stopword spam wins

    idf_hits = fts_search(posting, "the-rare", k=4, scoring="tfidf").collect()
    assert idf_hits[0].subj == 1  # tf·idf: the rare term wins
    scores = {r.subj: r.score for r in idf_hits}
    assert scores[1] > scores[0]

    # indexed path agrees (sidecar carries N)
    idx = str(tmp_path / "idx")
    write_posting_table(posting, idx, n_docs=4)
    via_index = fts_search_indexed(spark, idx, "the-rare", k=4,
                                   scoring="tfidf").collect()
    assert [r.subj for r in via_index] == [r.subj for r in idf_hits]


def test_cosine_zero_norm_and_empty_corpus(spark, tmp_path):
    """A zero vector (padding/missing embedding) must not kill the job
    with ANSI DIVIDE_BY_ZERO; empty corpora return empty results."""
    from kgap_spark.functions.similarity import (
        build_signature_table,
        cosine_topk,
        embedding_near_dup_pairs,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = cosine_topk(emb, [1.0, 0.0], k=3).collect()
    assert rows[0].vec_id == 1 and rows[0].cosine == 1.0
    assert all(r.cosine is None for r in rows[1:])  # zero-norm → NULL, last

    # two zero vectors share a bucket: candidate pair must not crash,
    # and NULL cosine never passes the threshold
    pairs = embedding_near_dup_pairs(emb, threshold=0.5).collect()
    assert (2, 3) not in {(p.id_a, p.id_b) for p in pairs}

    empty = emb.filter("vec_id < 0")
    assert embedding_near_dup_pairs(empty).count() == 0
    build_signature_table(empty, str(tmp_path / "sig"))  # no crash


def test_cc_nonconvergence_raises(spark):
    """Partially-propagated labels are wrong canonicalization — the
    strict default must raise, not return a split component."""
    from kgap_spark.canonicalize.connected_components import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(30)], "src string, dst string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)
    # diagnostics mode still returns the partial result
    partial = connected_components(chain, max_iter=3, strict=False)
    assert partial.count() == 31


def test_length_quantile_labels():
    """p-labels round instead of truncating (0.29*100 is 28.999… in
    binary floating point)."""
    from kgap_spark.functions.selection import length_quantiles  # noqa: F401

    assert f"p{round(0.29 * 100)}" == "p29"
    assert f"p{int(0.29 * 100)}" == "p28"  # the old bug


def test_append_posting_table_incremental(spark, tmp_path):
    """Index maintenance: appending a new doc's postings (no rebuild)
    makes it searchable and bumps the corpus-size sidecar."""
    from kgap_spark.index.fts import (
        append_posting_table,
        build_posting_table,
        fts_search_indexed,
        read_doc_count,
        write_posting_table,
    )

    idx = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string"
    )
    write_posting_table(build_posting_table(base, "doc_id", "text"), idx,
                        n_docs=2)
    assert read_doc_count(spark, idx) == 2
    assert fts_search_indexed(spark, idx, "zeta", k=5).count() == 0

    newdocs = spark.createDataFrame([(2, "zeta beta")], "doc_id long, text string")
    append_posting_table(build_posting_table(newdocs, "doc_id", "text"), idx,
                         n_new_docs=1)
    assert read_doc_count(spark, idx) == 3
    hits = fts_search_indexed(spark, idx, "zeta", k=5).collect()
    assert [r.subj for r in hits] == [2]
    # old postings still intact, tfidf path works over the merged index
    beta = fts_search_indexed(spark, idx, "beta", k=5, scoring="tfidf")
    assert {r.subj for r in beta.collect()} == {0, 1, 2}

    # n_new_docs omitted → derived from the postings (never silently 0)
    more = spark.createDataFrame([(3, "delta")], "doc_id long, text string")
    append_posting_table(build_posting_table(more, "doc_id", "text"), idx)
    assert read_doc_count(spark, idx) == 4

    # a sidecar-less index refuses BEFORE any data lands
    import pytest

    bare = str(tmp_path / "bare")
    build_posting_table(base, "doc_id", "text").write.parquet(bare)
    files_before = set((tmp_path / "bare").rglob("*.parquet"))
    with pytest.raises(ValueError, match="_doc_count"):
        append_posting_table(
            build_posting_table(more, "doc_id", "text"), bare, n_new_docs=1
        )
    assert set((tmp_path / "bare").rglob("*.parquet")) == files_before


def test_cosine_topk_and_lsh_recall(spark):
    from kgap_spark.functions.similarity import cosine_topk, lsh_bucketed_topk

    import math
    vecs = [
        (i, [math.cos(i / 10.0 + d * 0.3) for d in range(8)]) for i in range(50)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = vecs[7][1]
    exact = [r.vec_id for r in cosine_topk(emb, q, k=5).collect()]
    assert exact[0] == 7  # the query vector itself ranks first
    approx = [r.vec_id for r in
              lsh_bucketed_topk(emb, q, k=5, n_planes=4).collect()]
    # LSH with multiprobe must recover most of the exact top-5
    assert len(set(exact) & set(approx)) >= 3


def test_multimodal_features_deterministic(spark):
    from kgap_spark.functions.multimodal import extract_features

    media = spark.createDataFrame(
        [("m1", "image", "image/png", b"\x89PNG fake", {}),
         ("m2", "audio", "audio/wav", b"RIFF fake", {}),
         ("m3", "image", "image/png", None, {})],
        "media_id string, kind string, mime string, payload binary, "
        "meta map<string,string>",
    )
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert len(rows["m1"].features) == 16
    assert rows["m1"].n_bytes == 9 and rows["m3"].n_bytes == 0
    # determinism across repartitioning
    rows2 = {r.media_id: r for r in
             extract_features(media.repartition(3)).collect()}
    assert rows["m1"].features == rows2["m1"].features
    # image vs audio decoders differ
    assert rows["m1"].features != rows["m2"].features


def test_fuzzy_candidates_blocking(spark):
    from kgap_spark.link.candidates import fuzzy_candidates

    alias_dict = spark.createDataFrame(
        [("marine sensor", "urn:e1", "en", 0.9),
         ("coastal buoy", "urn:e2", "en", 0.8)],
        "alias string, entity_id string, lang string, prior double",
    )
    surfaces = spark.createDataFrame(
        [("marine sensr",), ("coastal buoy",), ("unrelated words",)],
        "surface string",
    )
    got = fuzzy_candidates(surfaces, alias_dict, max_jaccard_dist=0.5)
    m = {(r.surface, r.entity_id) for r in got.collect()}
    assert ("marine sensr", "urn:e1") in m      # typo blocked to right entity
    assert ("coastal buoy", "urn:e2") in m      # exact
    assert ("unrelated words", "urn:e1") not in m


def test_embedding_near_dup_pairs_recall(spark):
    """LSH-bucketed cosine near-dup pairs: perturbed copies (cos ≈ .999)
    must be found via multiprobe; unrelated vectors must not pair."""
    import math

    from kgap_spark.functions.similarity import embedding_near_dup_pairs

    rows = []
    for i in range(40):
        v = [math.cos(i * 1.7 + d * 0.61) for d in range(16)]
        rows.append((i, v))
        if i < 8:  # near-dup twin: tiny perturbation, not identical
            rows.append((100 + i, [x + 0.003 * ((d % 3) - 1)
                                   for d, x in enumerate(v)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_dup_pairs(emb, threshold=0.995, n_planes=4).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    expected = {(i, 100 + i) for i in range(8)}
    assert expected & found == expected          # full recall on twins
    assert all(r.cosine >= 0.995 for r in pairs)  # no false positives


def test_detect_mentions_case_and_null_lang(spark):
    """Uppercase aliases ('Paris') and NULL-lang aliases must match —
    both previously produced zero mentions, silently."""
    from kgap_spark.mentions.detect import detect_mentions

    pages = spark.createDataFrame(
        [("u1", "en", "we visited Paris in june"),
         ("u2", "nl", "paris is mooi")],
        "url string, lang string, text string",
    )
    alias = spark.createDataFrame(
        [("Paris", "e:paris", None, 0.9)],
        "alias string, entity_id string, lang string, prior double",
    )
    got = {(r.url, r.entity_id) for r in
           detect_mentions(pages, alias).collect()}
    # case-insensitive match on both pages; NULL lang = no restriction
    assert got == {("u1", "e:paris"), ("u2", "e:paris")}


def test_detect_mentions_fuzzy_end_to_end(spark):
    """A typo'd surface form must link to the right entity via the
    fuzzy LSH path, with prior discounted below an exact match; clean
    pages are unaffected."""
    from kgap_spark.link.score import link_mentions
    from kgap_spark.mentions.detect import detect_mentions_fuzzy

    alias_dict = spark.createDataFrame(
        [("marine sensor", "urn:e1", "en", 0.9),
         ("coastal buoy", "urn:e2", "en", 0.8)],
        "alias string, entity_id string, lang string, prior double",
    )
    pages = spark.createDataFrame(
        [("u1", "en", "the marine sensr recorded data"),     # typo
         ("u2", "en", "a coastal buoy drifted")],            # exact
        "url string, lang string, text string",
    )
    cands = detect_mentions_fuzzy(pages, alias_dict, max_jaccard_dist=0.5)
    linked = {(r.url, r.entity_id): r.prior
              for r in link_mentions(cands).collect()}
    assert ("u1", "urn:e1") in linked        # typo recovered
    assert ("u2", "urn:e2") in linked        # exact path intact
    assert linked[("u1", "urn:e1")] < 0.9    # discounted prior
    assert linked[("u2", "urn:e2")] == 0.8   # exact prior undiscounted


def test_hash_split_deterministic_and_weighted(spark):
    """Split assignment is a pure function of content (repartition-
    invariant) and respects the weight ranges."""
    from kgap_spark.functions.selection import hash_split

    docs = spark.createDataFrame(
        [(i, f"document number {i} with content") for i in range(500)],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.split for r in hash_split(docs, "text").collect()}
    b = {r.doc_id: r.split
         for r in hash_split(docs.repartition(7), "text").collect()}
    assert a == b                                   # partition-invariant
    from collections import Counter
    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_topk_per_group(spark):
    from kgap_spark.functions.selection import topk_per_group
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", i, i * 1.0) for i in range(10)] + [("b", 99, 5.0)],
        "g string, id long, score double",
    )
    top = topk_per_group(df, "g", [F.desc("score"), F.asc("id")], k=2).collect()
    by_g = {}
    for r in top:
        by_g.setdefault(r.g, []).append(r.id)
    assert sorted(by_g["a"]) == [8, 9] and by_g["b"] == [99]


def _encode_png(width, height, pixels, color_type=2, filters=None):
    """Tiny test-side PNG encoder (zlib+struct): 8-bit, chooses the
    given per-row filter types so the decoder's filter arithmetic is
    exercised, not just filter 0."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = width * ch
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(pixels[y * stride:(y + 1) * stride])
        f = filters[y]
        enc = bytearray(line)
        if f == 1:  # Sub
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (line[i] - line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pr) & 0xFF
        raw += bytes([f]) + enc
        prev = line

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_decode_real_branch():
    """VERDICT r3 #6: real (not faked) PNG decode through pure stdlib.
    Round-trips pixels across all five scanline filters and both RGB
    and RGBA, including a 1-px image."""
    from kgap_spark.functions.multimodal import decode_png

    # 1×1 red RGB pixel
    png1 = _encode_png(1, 1, bytes([255, 0, 0]))
    assert decode_png(png1) == (1, 1, 3, bytes([255, 0, 0]))

    # 4×5 RGB gradient, one row per filter type 0..4
    import random

    rng = random.Random(7)
    px = bytes(rng.randrange(256) for _ in range(4 * 5 * 3))
    png = _encode_png(4, 5, px, color_type=2, filters=[0, 1, 2, 3, 4])
    assert decode_png(png) == (4, 5, 3, px)

    # RGBA with Paeth everywhere
    px4 = bytes(rng.randrange(256) for _ in range(3 * 3 * 4))
    png4 = _encode_png(3, 3, px4, color_type=6, filters=[4, 4, 4])
    assert decode_png(png4) == (3, 3, 4, px4)

    # grayscale
    pxg = bytes([0, 128, 255, 64])
    pngg = _encode_png(2, 2, pxg, color_type=0, filters=[2, 1])
    assert decode_png(pngg) == (2, 2, 1, pxg)


def test_png_features_through_distributed_path(spark):
    """A PNG payload flows through the mapInPandas pipeline via the
    REAL decode branch: features reflect actual pixel content."""
    from kgap_spark.functions.multimodal import extract_features

    red = _encode_png(2, 2, bytes([255, 0, 0] * 4))
    green = _encode_png(2, 2, bytes([0, 255, 0] * 4))
    media = spark.createDataFrame(
        [("m1", "image", "image/png", bytearray(red), {}),
         ("m2", "image", "image/png", bytearray(green), {})],
        "media_id string, kind string, mime string, payload binary, "
        "meta map<string,string>",
    )
    feats = {r.media_id: r.features
             for r in extract_features(media).collect()}
    # feature layout: [w, h, meanR, meanG, meanB, meanA, lumaStd, grid…]
    assert feats["m1"][2] == 1.0 and feats["m1"][3] == 0.0   # pure red
    assert feats["m2"][2] == 0.0 and feats["m2"][3] == 1.0   # pure green
    assert feats["m1"][5] == 1.0  # opaque


def test_png_decode_large_mixed_filters():
    """Round-5 vectorized unfilter: byte-exact on a 100x100 RGB image
    cycling through all five filter types (the BENCH/PNG_UNFILTER.md
    fixture shape)."""
    import random

    from kgap_spark.functions.multimodal import decode_png

    rng = random.Random(42)
    w = h = 100
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    png = _encode_png(w, h, px, color_type=2,
                      filters=[i % 5 for i in range(h)])
    assert decode_png(png) == (w, h, 3, px)
    # RGBA variant exercises the ch=4 lanes of the Sub accumulate
    px4 = bytes(rng.randrange(256) for _ in range(20 * 10 * 4))
    png4 = _encode_png(20, 10, px4, color_type=6,
                       filters=[(i * 3) % 5 for i in range(10)])
    assert decode_png(png4) == (20, 10, 4, px4)


# ---------------------------------------------------------------------------
# Round 5: real baseline JPEG decode (pure stdlib + numpy).

def _jpeg_tables():
    """Trivial-but-valid canonical Huffman tables: 12 DC categories at
    code length 4, all 162 AC (run,size) symbols at code length 8."""
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = bytes(range(12))
    ac_syms = [0x00, 0xF0]
    for r in range(16):
        for s in range(1, 11):
            ac_syms.append((r << 4) | s)
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_syms)  # all at length 8
    return dc_counts, dc_syms, ac_counts, bytes(ac_syms)


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value, count):
        for i in range(count - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.bits(1, 1)


def _encode_jpeg(width, height, planes, restart_interval=0):
    """Baseline 4:4:4 JPEG encoder (test-side): quant tables all-ones
    (near-lossless), the trivial Huffman tables above, optional
    restart markers. ``planes`` = list of 1 (gray) or 3 (YCbCr)
    numpy uint8 arrays (height, width)."""
    import struct

    import numpy as np

    from kgap_spark.functions.jpeg import ZIGZAG, _idct_matrix

    T = _idct_matrix()
    dc_counts, dc_syms, ac_counts, ac_syms = _jpeg_tables()

    def huff_codes(counts, syms):
        codes, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                codes[syms[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return codes

    dc_codes = huff_codes(dc_counts, dc_syms)
    ac_codes = huff_codes(ac_counts, ac_syms)
    nc = len(planes)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = []
    for p in planes:
        pp = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        pp[:height, :width] = p
        pp[height:, :width] = p[-1:, :]
        pp[:, width:] = pp[:, width - 1:width]
        padded.append(pp)

    w = _JpegBitWriter()
    pred = [0] * nc
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + ((mcu // restart_interval
                                               - 1) % 8)])
                pred = [0] * nc
            mcu += 1
            for ci in range(nc):
                blk = padded[ci][by * 8:by * 8 + 8,
                                 bx * 8:bx * 8 + 8] - 128.0
                F = T @ blk @ T.T
                zz = [int(round(F.reshape(64)[ZIGZAG[i]]))
                      for i in range(64)]
                diff = zz[0] - pred[ci]
                pred[ci] = zz[0]
                t = diff.bit_length() if diff >= 0 else (-diff).bit_length()
                w.bits(*reversed(dc_codes[t]))
                if t:
                    v = diff if diff >= 0 else diff + (1 << t) - 1
                    w.bits(v, t)
                run = 0
                last_nz = max((i for i in range(1, 64) if zz[i]),
                              default=0)
                for k in range(1, last_nz + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run >= 16:
                        w.bits(*reversed(ac_codes[0xF0]))
                        run -= 16
                    s = abs(zz[k]).bit_length()
                    w.bits(*reversed(ac_codes[(run << 4) | s]))
                    v = zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1
                    w.bits(v, s)
                    run = 0
                if last_nz < 63:
                    w.bits(*reversed(ac_codes[0x00]))
    w.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT id0, all ones
    comps_sof = b"".join(bytes([i + 1, 0x11, 0]) for i in range(nc))
    out += seg(0xC0, struct.pack(">BHHB", 8, height, width, nc)
               + comps_sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    comps_sos = b"".join(bytes([i + 1, 0x00]) for i in range(nc))
    out += seg(0xDA, bytes([nc]) + comps_sos + bytes([0, 63, 0]))
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_decode_grayscale_roundtrip():
    import numpy as np

    from kgap_spark.functions.jpeg import decode_jpeg

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 17)).astype(np.uint8)
    data = _encode_jpeg(17, 24, [img])
    w, h, ch, px = decode_jpeg(data)
    assert (w, h, ch) == (17, 24, 1)
    got = np.frombuffer(px, dtype=np.uint8).reshape(24, 17)
    err = np.abs(got.astype(int) - img.astype(int))
    # all-ones quant tables: only DCT coefficient rounding remains
    assert err.max() <= 6 and err.mean() < 1.5


def test_jpeg_decode_flat_block_exact():
    import numpy as np

    from kgap_spark.functions.jpeg import decode_jpeg

    img = np.full((8, 8), 200, dtype=np.uint8)
    w, h, ch, px = decode_jpeg(_encode_jpeg(8, 8, [img]))
    got = np.frombuffer(px, dtype=np.uint8)
    assert (w, h, ch) == (8, 8, 1)
    assert np.abs(got.astype(int) - 200).max() <= 1


def test_jpeg_decode_color_roundtrip():
    import numpy as np

    from kgap_spark.functions.jpeg import decode_jpeg

    rng = np.random.RandomState(9)
    rgb = rng.randint(0, 256, size=(16, 16, 3)).astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]
    data = _encode_jpeg(16, 16, planes)
    w, h, ch, px = decode_jpeg(data)
    assert (w, h, ch) == (16, 16, 3)
    got = np.frombuffer(px, dtype=np.uint8).reshape(16, 16, 3)
    err = np.abs(got.astype(int) - rgb.astype(int))
    # YCbCr forward/back conversion + DCT rounding
    assert err.max() <= 8 and err.mean() < 2.0


def test_jpeg_decode_restart_markers():
    import numpy as np

    from kgap_spark.functions.jpeg import decode_jpeg

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
    data = _encode_jpeg(24, 16, [img], restart_interval=2)
    w, h, ch, px = decode_jpeg(data)
    got = np.frombuffer(px, dtype=np.uint8).reshape(16, 24)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 6


def test_jpeg_unsupported_raises_cleanly():
    import pytest as _pytest

    from kgap_spark.functions.jpeg import decode_jpeg

    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"nope")
    # progressive (SOF2) rejected loudly
    prog = (b"\xff\xd8" + b"\xff\xc2" + b"\x00\x0b"
            + b"\x08\x00\x08\x00\x08\x01\x01\x11\x00")
    with _pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)


def test_jpeg_features_through_distributed_path(spark):
    """Real JPEG decode through the Arrow-batched mapInPandas extract,
    with a corrupt JPEG isolated to a NULL-feature row."""
    import numpy as np

    from kgap_spark.functions.multimodal import extract_features

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    good = _encode_jpeg(16, 16, [img])
    corrupt = good[:40]  # truncated mid-header
    media = spark.createDataFrame(
        [("j0", "image", "image/jpeg", bytearray(good), {}),
         ("j1", "image", "image/jpeg", bytearray(corrupt), {})],
        "media_id string, kind string, mime string, payload binary, "
        "meta map<string,string>",
    )
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert rows["j0"].features is not None
    assert len(rows["j0"].features) == 16
    # mean gray of a uniform-random image ≈ 0.5
    assert 0.4 < rows["j0"].features[2] < 0.6
    assert rows["j1"].features is None


def test_fts_boolean_query_parse():
    from kgap_spark.index.fts import parse_boolean_query

    assert parse_boolean_query("a b") == {
        "should": ["a", "b"], "must": [], "must_not": []}
    assert parse_boolean_query("a AND b") == {
        "should": [], "must": ["a", "b"], "must_not": []}
    assert parse_boolean_query("a AND b AND c") == {
        "should": [], "must": ["a", "b", "c"], "must_not": []}
    assert parse_boolean_query("a OR b") == {
        "should": ["a", "b"], "must": [], "must_not": []}
    assert parse_boolean_query("+a b -c") == {
        "should": ["b"], "must": ["a"], "must_not": ["c"]}
    assert parse_boolean_query("a NOT b") == {
        "should": ["a"], "must": [], "must_not": ["b"]}
    # query tokens normalize with the index rule (punctuation split)
    assert parse_boolean_query("+Data-Driven") == {
        "should": [], "must": ["data", "driven"], "must_not": []}


def test_fts_boolean_search(spark, docs):
    from kgap_spark.index.fts import build_posting_table, fts_search_boolean

    posting = build_posting_table(docs, "doc_id", "text")
    # must: docs 0,1,2 contain fox; dog optional scorer (0 and 2)
    hits = {r.subj: (r.score, r.n_terms)
            for r in fts_search_boolean(posting, "fox AND dog").collect()}
    assert set(hits) == {0, 2}
    assert hits[0] == (2, 2)
    # exclusion: fox docs without cat
    hits2 = {r.subj for r in
             fts_search_boolean(posting, "fox -cat").collect()}
    assert hits2 == {0, 2}
    # plain should with an exclusion keeps single-term matches
    hits3 = {r.subj for r in
             fts_search_boolean(posting, "fox katze -cat").collect()}
    assert hits3 == {0, 2, 4}
    # must term absent everywhere -> empty
    assert fts_search_boolean(posting, "+zzz fox").count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive term"):
        fts_search_boolean(posting, "-only -negatives")


def test_fts_boolean_and_promotes_whole_word():
    """Review regression: AND promotes the whole previous WORD (all
    its normalized tokens), and only when it went to should — a +term
    in between must not cause an earlier OR term to become required."""
    from kgap_spark.index.fts import parse_boolean_query

    assert parse_boolean_query("apple +banana AND cherry") == {
        "should": ["apple"], "must": ["banana", "cherry"],
        "must_not": []}
    assert parse_boolean_query("data-driven AND spark") == {
        "should": [], "must": ["data", "driven", "spark"],
        "must_not": []}
    # NOT resets the promotion anchor
    assert parse_boolean_query("a NOT b AND c") == {
        "should": ["a"], "must": ["c"], "must_not": ["b"]}


def test_jpeg_non_interleaved_scan_rejected():
    import struct

    import pytest as _pytest

    from kgap_spark.functions.jpeg import decode_jpeg

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    # 3-component SOF0 but a single-component scan (ns=1)
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(3))
    data = (b"\xff\xd8"
            + seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 3) + comps)
            + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])))
    with _pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(data)


def test_jpeg_truncated_sos_header_valueerror():
    import struct

    import pytest as _pytest

    from kgap_spark.functions.jpeg import decode_jpeg

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1)
              + bytes([1, 0x11, 0]))
    # empty SOS payload
    with _pytest.raises(ValueError, match="truncated SOS"):
        decode_jpeg(b"\xff\xd8" + sof + seg(0xDA, b""))
    # ns=3 but only one component descriptor
    with _pytest.raises(ValueError, match="truncated SOS"):
        decode_jpeg(b"\xff\xd8" + sof + seg(0xDA, bytes([3, 1, 0])))


# ---------------------------------------------------------------------------
# GIF decoder (round 6): real LZW branch, pure stdlib
# ---------------------------------------------------------------------------

def _lzw_encode(indices, min_code_size):
    """Test-side GIF LZW encoder, 'uncompressed' flavor: every pixel
    emitted as a literal code, a CLEAR inserted before the table
    would force a width increase — keeps code width at
    min_code_size+1 while remaining a fully spec-conformant stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    emit(clear)
    budget = (1 << width) - eoi - 2  # codes before width would grow
    for i, c in enumerate(indices):
        if i and i % budget == 0:
            emit(clear)
        emit(c)
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _encode_gif(width, height, indices, palette, interlace=False,
                transparent=None, animated_tail=False):
    import struct as st

    size_bits = max((len(palette) - 1).bit_length(), 1) - 1
    n = 2 << size_bits
    gct = bytearray()
    for r, g, b in palette:
        gct += bytes((r, g, b))
    gct += b"\x00" * (3 * n - len(gct))
    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", width, height, 0x80 | size_bits, 0, 0)
    out += gct
    if transparent is not None:
        out += b"\x21\xf9\x04" + bytes((1, 0, 0, transparent)) + b"\x00"
    mcs = max(size_bits + 1, 2)
    if interlace:
        rows = [indices[y * width:(y + 1) * width] for y in range(height)]
        order = [y for s, p in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for y in range(s, height, p)]
        indices = [c for y in order for c in rows[y]]
    out += b"\x2c" + st.pack("<HHHHB", 0, 0, width, height,
                              0x40 if interlace else 0)
    out += bytes((mcs,))
    lzw = _lzw_encode(indices, mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes((len(chunk),)) + chunk
    out += b"\x00"
    if animated_tail:  # a second (ignored) frame
        out += st.pack("<BHHHHB", 0x2C, 0, 0, 1, 1, 0)
        out += bytes((mcs,))
        tail = _lzw_encode([0], mcs)
        out += bytes((len(tail),)) + tail + b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_decode_roundtrip():
    from kgap_spark.functions.gif import decode_gif

    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    w, h = 7, 5
    idx = [(x + y) % 4 for y in range(h) for x in range(w)]
    data = _encode_gif(w, h, idx, palette)
    gw, gh, ch, rgb = decode_gif(data)
    assert (gw, gh, ch) == (w, h, 3)
    expected = b"".join(bytes(palette[c]) for c in idx)
    assert rgb == expected


def test_gif_decode_larger_palette_and_multi_subblock():
    from kgap_spark.functions.gif import decode_gif

    # 64-color palette, enough pixels to span several 255-byte
    # sub-blocks and several CLEAR resets
    palette = [(i * 4, 255 - i * 4, (i * 7) % 256) for i in range(64)]
    w, h = 101, 37
    idx = [(x * y + x) % 64 for y in range(h) for x in range(w)]
    gw, gh, ch, rgb = decode_gif(_encode_gif(w, h, idx, palette))
    assert (gw, gh, ch) == (w, h, 3)
    assert rgb == b"".join(bytes(palette[c]) for c in idx)


def test_gif_decode_interlaced():
    from kgap_spark.functions.gif import decode_gif

    palette = [(0, 0, 0), (10, 20, 30), (40, 50, 60), (70, 80, 90)]
    w, h = 6, 11
    idx = [(3 * y + x) % 4 for y in range(h) for x in range(w)]
    gw, gh, ch, rgb = decode_gif(
        _encode_gif(w, h, idx, palette, interlace=True)
    )
    assert rgb == b"".join(bytes(palette[c]) for c in idx)


def test_gif_transparency_and_first_frame_only():
    from kgap_spark.functions.gif import decode_gif

    palette = [(9, 9, 9), (255, 255, 255)]
    w, h = 4, 2
    idx = [0, 1, 0, 1, 1, 0, 1, 0]
    data = _encode_gif(w, h, idx, palette, transparent=0,
                       animated_tail=True)
    gw, gh, ch, rgb = decode_gif(data)
    # transparent index composites to black, not palette[0]
    exp = b"".join(b"\x00\x00\x00" if c == 0 else bytes(palette[c])
                   for c in idx)
    assert rgb == exp and (gw, gh) == (w, h)


def test_gif_malformed_raises_valueerror():
    import pytest as _pt

    from kgap_spark.functions.gif import decode_gif

    with _pt.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF")
    with _pt.raises(ValueError, match="truncated|image"):
        decode_gif(b"GIF89a" + b"\x00" * 7)
    # truncated LZW stream
    palette = [(0, 0, 0), (1, 1, 1)]
    good = _encode_gif(4, 4, [0, 1] * 8, palette)
    with _pt.raises(ValueError):
        decode_gif(good[:len(good) - 6] + b"\x00\x3b")


def test_gif_through_multimodal_features():
    from kgap_spark.functions.multimodal import _decode_image

    palette = [(i, i, i) for i in range(16)]
    idx = [(x + y) % 16 for y in range(8) for x in range(8)]
    feats = _decode_image(_encode_gif(8, 8, idx, palette))
    assert feats is not None and len(feats) == 16
    # corrupt GIF isolates to NULL features, never an exception
    assert _decode_image(b"GIF89a\xff\xff\xff") is None


# --- WAV audio decoder (real branch) ---------------------------------------

def test_wav_decode_roundtrip_16bit():
    import numpy as np

    from kgap_spark.functions.audio import decode_wav, encode_wav

    t = np.arange(800) / 8000.0
    stereo = np.stack(
        [np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 220 * t)], axis=1
    )
    sr, ch, frames = decode_wav(encode_wav(8000, stereo))
    assert (sr, ch) == (8000, 2)
    assert frames.shape == (800, 2)
    # 16-bit quantization: round-trip error ≤ 1/32768 scale mismatch
    # (encode scales by 32767, decode by 32768) + half-LSB rounding
    assert np.max(np.abs(frames - stereo)) < 1.0 / 16000


def test_wav_decode_float32_and_8bit_and_24bit():
    import struct

    import numpy as np

    from kgap_spark.functions.audio import decode_wav

    def riff(tag, bits, body):
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 0, 0, bits)
        inner = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                 + b"data" + struct.pack("<I", len(body)) + body)
        return b"RIFF" + struct.pack("<I", len(inner)) + inner

    # IEEE float32 (tag 3)
    src = np.linspace(-1, 1, 64)
    _, _, fr = decode_wav(riff(3, 32, src.astype("<f4").tobytes()))
    assert np.allclose(fr[:, 0], src, atol=1e-6)
    # 8-bit unsigned PCM: 128 is zero
    _, _, fr8 = decode_wav(riff(1, 8, bytes([0, 128, 255])))
    assert fr8[1, 0] == 0.0 and fr8[0, 0] == -1.0
    # 24-bit little-endian signed: 0x800000 = -1.0
    _, _, fr24 = decode_wav(riff(1, 24, b"\x00\x00\x80" + b"\x00\x00\x00"))
    assert fr24[0, 0] == -1.0 and fr24[1, 0] == 0.0


def test_wav_extensible_and_chunk_skip():
    """WAVE_FORMAT_EXTENSIBLE resolves via SubFormat; LIST chunks and
    odd-length word alignment are walked over."""
    import struct

    import numpy as np

    from kgap_spark.functions.audio import decode_wav

    # 16-byte header + cbSize(22) = validbits, channelmask, then the
    # 16-byte SubFormat GUID whose FIRST TWO bytes are the real tag
    ext = struct.pack("<HHIIHHHHI", 0xFFFE, 1, 8000, 0, 0, 16, 22, 16, 1) \
        + struct.pack("<H", 1) + b"\x00" * 14
    body = np.array([16384, -16384], dtype="<i2").tobytes()
    inner = (b"WAVE"
             + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd+pad
             + b"fmt " + struct.pack("<I", len(ext)) + ext
             + b"data" + struct.pack("<I", len(body)) + body)
    sr, ch, fr = decode_wav(b"RIFF" + struct.pack("<I", len(inner)) + inner)
    assert (sr, ch) == (8000, 1) and abs(fr[0, 0] - 0.5) < 1e-4


def test_wav_malformed_raises_valueerror():
    import pytest

    from kgap_spark.functions.audio import decode_wav

    for bad in (b"", b"RIFX1234WAVE", b"RIFF\x04\x00\x00\x00WAVE",
                b"RIFF\xff\x00\x00\x00WAVEdata\x02\x00\x00\x00ab"):
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_wav_through_multimodal_features():
    import numpy as np

    from kgap_spark.functions.audio import encode_wav
    from kgap_spark.functions.multimodal import _decode_audio

    t = np.arange(1600) / 16000.0
    wav = encode_wav(16000, np.sin(2 * np.pi * 440 * t)[:, None])
    feats = _decode_audio(wav)
    assert feats is not None and len(feats) == 16
    # sine RMS ≈ 1/sqrt(2); feature slots: [dur, sr, ch, rms, peak, zcr, ...]
    assert abs(feats[3] - 0.707) < 0.01 and abs(feats[4] - 1.0) < 0.01
    # corrupt RIFF isolates to NULL features; non-RIFF stays on the
    # deterministic-fake path (list, not None)
    assert _decode_audio(b"RIFF\x08\x00\x00\x00WAVEjunk") is None
    assert isinstance(_decode_audio(b"\x00mp3-ish"), list)


def test_wav_features_distributed(spark):
    """End-to-end through extract_features mapInPandas: mixed WAV and
    fake-path audio rows in one batch."""
    import numpy as np

    from kgap_spark.functions.audio import encode_wav
    from kgap_spark.functions.multimodal import MEDIA_SCHEMA, extract_features

    t = np.arange(400) / 8000.0
    wav = encode_wav(8000, np.sin(2 * np.pi * 100 * t)[:, None])
    rows = [
        ("m1", "audio", "audio/wav", bytearray(wav), {}),
        ("m2", "audio", "audio/mpeg", bytearray(b"\xffmp3"), {}),
    ]
    out = {r["media_id"]: r["features"]
           for r in extract_features(
               spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}
    assert len(out["m1"]) == 16 and abs(out["m1"][3] - 0.707) < 0.01
    assert len(out["m2"]) == 16  # deterministic fake path


# --- AVI video decoder (real branch) ---------------------------------------

def _mk_avi_mjpeg(n_frames=6, w=16, h=16):
    import numpy as np

    from kgap_spark.functions.video import encode_avi

    frames = []
    for i in range(n_frames):
        img = np.full((h, w), 20 + i * 40, dtype=np.uint8)
        frames.append(_encode_jpeg(w, h, [img]))
    return encode_avi(frames, w, h, codec="MJPG", fps=10)


def test_avi_mjpeg_decode_and_sampling():
    from kgap_spark.functions.video import decode_avi

    data = _mk_avi_mjpeg(n_frames=6)
    w, h, fps, n, frames = decode_avi(data, max_frames=4)
    assert (w, h, n) == (16, 16, 6) and abs(fps - 10.0) < 1e-6
    # 4 evenly-spaced samples of 6 frames: indices {0, 1, 3, 5}
    assert len(frames) == 4
    lumas = [px[0] for (_, _, _, px) in frames]
    assert lumas == sorted(lumas)  # brightness ramp preserved in order


def test_avi_rgb_dib_frames():
    import struct

    import numpy as np

    from kgap_spark.functions.video import decode_avi, encode_avi

    w, h = 5, 3  # stride 5*3=15 → padded to 16
    stride = (w * 3 + 3) & ~3
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    rgb[0, 0] = (255, 0, 0)   # top-left red
    rgb[2, 4] = (0, 0, 255)   # bottom-right blue
    dib = np.zeros((h, stride), dtype=np.uint8)
    dib[:, :w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = encode_avi([dib.tobytes()], w, h, codec="RGB", fps=5)
    _, _, fps, n, frames = decode_avi(data)
    assert n == 1 and abs(fps - 5.0) < 1e-6
    fw, fh, ch, px = frames[0]
    out = np.frombuffer(px, dtype=np.uint8).reshape(fh, fw, ch)
    assert tuple(out[0, 0]) == (255, 0, 0)
    assert tuple(out[2, 4]) == (0, 0, 255)


def test_avi_malformed_raises_valueerror():
    import pytest

    from kgap_spark.functions.video import decode_avi, encode_avi

    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")  # not AVI
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00AVI ")  # no streams
    # unsupported codec fourcc raises with the codec named
    bad = encode_avi([b"xxxx"], 4, 4, codec="H264")
    with pytest.raises(ValueError, match="H264"):
        decode_avi(bad)


def test_avi_through_multimodal_features():
    from kgap_spark.functions.multimodal import _decode_audio, _decode_video

    feats = _decode_video(_mk_avi_mjpeg())
    assert feats is not None and len(feats) == 16
    assert abs(feats[2] - 10.0 / 60.0) < 1e-6  # fps slot
    # luma ramp: temporal std is non-zero
    assert feats[5] > 0.05
    # corrupt AVI isolates to NULL; WAV payload routed to audio decoder
    # does not leak into the video branch (falls through to image/fake)
    assert _decode_video(b"RIFF\x08\x00\x00\x00AVI xxxx") is None
    assert isinstance(_decode_video(b"\x00notavideo"), list)
    # audio decoder no longer swallows AVI payloads as WAV
    assert isinstance(_decode_audio(b"RIFF\x08\x00\x00\x00AVI xxxx"), list)


def test_avi_features_distributed(spark):
    from kgap_spark.functions.multimodal import MEDIA_SCHEMA, extract_features

    rows = [
        ("v1", "video", "video/x-msvideo", bytearray(_mk_avi_mjpeg()), {}),
        ("v2", "video", "video/mp4", bytearray(b"\x00mp4-ish"), {}),
    ]
    out = {r["media_id"]: r["features"]
           for r in extract_features(
               spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}
    assert len(out["v1"]) == 16 and abs(out["v1"][2] - 10.0 / 60.0) < 1e-6
    assert len(out["v2"]) == 16  # deterministic fake path
