"""Unigram-LM tokenizer (operators/unigram.py, VERDICT r9 #3):
train→encode round trip, segmentation determinism, pruning shrink,
and UNK totality."""

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.unigram import (
    unigram_encode,
    unigram_seed,
    unigram_train,
    viterbi_segment,
)
from ksql_streams_from_schema_converter_spark.operators.bpe import (
    word_frequencies,
)


def _docs(spark):
    rows = [
        (0, "the swift brown fox jumps over the lazy dog"),
        (1, "the swift brown foxes jump over lazy dogs daily"),
        (2, "swift thinking wins the day the dog naps"),
        (3, "brown dogs and lazy foxes play daily in the sun"),
    ] * 3
    return spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows)], "doc_id long, text string"
    )


def test_train_encode_round_trip(spark):
    """The trained scoring table segments every training word into
    pieces that CONCATENATE BACK to the word (lossless round trip),
    and the encoder fingerprint is deterministic."""
    docs = _docs(spark)
    trained = unigram_train(docs).collect()
    scores = {r.piece: r.score for r in trained}
    words = [
        r.word
        for r in word_frequencies(docs).select("word").collect()
    ]
    assert words
    for w in words:
        pieces = viterbi_segment(w, scores)
        assert "".join(pieces) == w  # lossless
        assert all(p in scores for p in pieces)  # in-vocab encode
    enc1 = sorted(map(tuple, unigram_encode(docs, scores).collect()))
    enc2 = sorted(map(tuple, unigram_encode(docs, scores).collect()))
    assert enc1 == enc2 and len(enc1) == docs.count()
    # every doc tokenizes to at least its word count (pieces >= words)
    n_words = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.lower("text"), "[^a-z]+"), lambda w: w != ""
                )
            ).alias("n"),
        ).collect()
    }
    for doc_id, n_tokens, _ in enc1:
        assert n_tokens >= n_words[doc_id]


def test_em_prunes_seed_vocab(spark):
    """The unigram trainer SHRINKS: pieces of length > 1 that win no
    Viterbi segmentation leave the vocabulary, while every single
    character survives (required-character floor)."""
    docs = _docs(spark)
    wf = word_frequencies(docs).where(F.length("word") <= 12)
    seed_n = unigram_seed(wf).count()
    trained = unigram_train(docs).collect()
    assert len(trained) < seed_n  # the shrink happened
    chars = {
        r.piece
        for r in unigram_seed(wf).where(F.length("piece") == 1).collect()
    }
    kept_chars = {r.piece for r in trained if len(r.piece) == 1}
    assert chars == kept_chars
    assert all(r.cnt >= 1 and r.score >= 1 for r in trained)


def test_encode_is_total_under_unk(spark):
    """A document containing characters the training never saw still
    encodes (singleton UNK fallback) — the encoder is total."""
    docs = _docs(spark)
    trained = unigram_train(docs).collect()
    scores = {r.piece: r.score for r in trained}
    assert not {"c", "q"} & {p for p in scores if len(p) == 1}
    weird = spark.createDataFrame(
        [(99, "cqcq swift")], "doc_id long, text string"
    )
    out = unigram_encode(weird, scores).collect()
    assert len(out) == 1 and out[0].n_tokens >= 5  # 4 UNK chars + pieces
    assert viterbi_segment("cqcq", scores) == ["c", "q", "c", "q"]


def test_viterbi_tiebreak_prefers_smallest_predecessor():
    """Equal-cost splits elect the smallest predecessor index — the
    min(struct(cost, i)) election the SQL oracle replays."""
    scores = {"a": 2, "b": 2, "ab": 4, "ba": 4, "aba": 9}
    # "aba": (a)(ba)=6, (ab)(a)=6, (a)(b)(a)=6, (aba)=9 — all min-cost
    # paths cost 6; backwalk from j=3 picks bp=min i with cost 6 -> the
    # last piece is word[i:3] with smallest i reachable at cost 6
    assert viterbi_segment("aba", scores) == ["a", "ba"]


def test_unigram_vocab_store_lifecycle(spark, tmp_path):
    """Persistence discipline for the unigram-LM family (VERDICT r10
    #5): torn saves invisible, replay idempotent, seq-addressed loads,
    missing versions a hard error."""
    import os

    import pytest as _pytest

    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        ingest_paths,
    )
    from ksql_streams_from_schema_converter_spark.operators.unigram import (
        UNIGRAM_SUB,
        load_unigram_vocab,
        save_unigram_vocab,
    )

    store = str(tmp_path / "uni")
    vocab = {"a": 5, "b": 7, "ab": 3}
    save_unigram_vocab(spark, store, vocab, seq=0)
    assert load_unigram_vocab(spark, store) == (vocab, "u0")
    # torn save: data lands for u1 but no manifest commit -> invisible
    torn = ingest_paths(store, UNIGRAM_SUB, ["u1"])[0]
    spark.createDataFrame([("zz", 1)], "piece string, score long").write.mode(
        "overwrite"
    ).parquet(torn)
    assert os.path.exists(torn)
    assert load_unigram_vocab(spark, store) == (vocab, "u0")
    # committed u1 becomes latest; seq=0 still addressable
    save_unigram_vocab(spark, store, {"a": 5}, seq=1)
    assert load_unigram_vocab(spark, store) == ({"a": 5}, "u1")
    assert load_unigram_vocab(spark, store, seq=0) == (vocab, "u0")
    # replay idempotence: re-saving seq=1 replaces it
    save_unigram_vocab(spark, store, {"a": 5, "b": 7}, seq=1)
    assert load_unigram_vocab(spark, store) == ({"a": 5, "b": 7}, "u1")
    with _pytest.raises(ValueError):
        load_unigram_vocab(spark, store, seq=7)


def test_bigram_lm_store_lifecycle_and_frozen_scoring(spark, tmp_path):
    """Bigram-LM persistence (r11 — the tokenizer-store discipline on
    the LM family): scoring under the LOADED count table is
    value-identical to scoring with the reference corpus itself; torn
    saves invisible; seq-addressed loads; missing versions raise."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        ingest_paths,
    )
    from ksql_streams_from_schema_converter_spark.operators.text import (
        BIGRAM_LM_SUB,
        bigram_backoff_surprisal,
        bigram_lm_counts,
        load_bigram_lm,
        save_bigram_lm,
    )

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat on the log"),
            (2, "a cat and a dog met"),
            (3, "entirely novel zebra words here"),
        ],
        "doc_id long, text string",
    )
    ref = docs.where(F.col("doc_id") % 2 == 0)
    store = str(tmp_path / "lm")
    save_bigram_lm(spark, store, bigram_lm_counts(ref), seq=0)
    loaded, label = load_bigram_lm(spark, store, seq=0)
    assert label == "lm0"
    got = sorted(
        map(tuple, bigram_backoff_surprisal(docs, lm=loaded).collect())
    )
    want = sorted(
        map(tuple, bigram_backoff_surprisal(docs, ref_docs=ref).collect())
    )
    assert got == want
    # and both equal the default even-id path (ref IS the even half)
    dflt = sorted(map(tuple, bigram_backoff_surprisal(docs).collect()))
    assert got == dflt
    # torn save invisible
    torn = ingest_paths(store, BIGRAM_LM_SUB, ["lm1"])[0]
    spark.createDataFrame(
        [("c2", "x", "y", 1)], "kind string, w1 string, w2 string, c long"
    ).write.mode("overwrite").parquet(torn)
    assert os.path.exists(torn)
    assert load_bigram_lm(spark, store)[1] == "lm0"
    # committed lm1 becomes latest; seq=0 still addressable
    save_bigram_lm(spark, store, bigram_lm_counts(docs), seq=1)
    assert load_bigram_lm(spark, store)[1] == "lm1"
    assert load_bigram_lm(spark, store, seq=0)[1] == "lm0"
    with _pytest.raises(ValueError):
        load_bigram_lm(spark, store, seq=7)
