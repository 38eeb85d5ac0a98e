"""BPE tokenizer training (operators/bpe.py): hand-computed merges on
the classic toy corpus, the documented self-repeat variant, and the
tie-break rule."""

from ksql_streams_from_schema_converter_spark.operators.bpe import (
    bpe_train,
    word_frequencies,
)


def _docs(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_word_frequencies_cap_and_order(spark):
    docs = _docs(spark, "b b b a a c X9 d-d")
    rows = {r.word: r.freq for r in word_frequencies(docs, vocab_cap=3).collect()}
    # lower + [a-z]+ runs: "X9" -> "x", "d-d" -> two "d"s; cap keeps the
    # 3 most frequent (ties by word): b(3), a(2), d(2)
    assert rows == {"b": 3, "a": 2, "d": 2}


def test_classic_corpus_merges_hand_computed(spark):
    """Sennrich-style toy corpus low/lower/newest/widest with known
    frequencies — the first three merges are hand-derivable:
    round 1: (e,s) and (s,t) tie at 9, 'e s' wins lexicographically;
    round 2: (es,t) at 9; round 3: (l,o) and (o,w) tie at 7, 'l o'
    wins."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    got = [
        (r.merge_rank, r.pair, r.merged, r.cnt)
        for r in bpe_train(_docs(spark, text), n_merges=3).orderBy("merge_rank").collect()
    ]
    assert got == [
        (1, "e s", "es", 9),
        (2, "es t", "est", 9),
        (3, "l o", "lo", 7),
    ]


def test_self_repeating_pair_variant_is_deterministic(spark):
    """The documented two-pass-replace variant on a run of a repeated
    symbol: 'aaaaa' segments aa·a·aa after merging 'a a' (leftmost
    greedy would give aa·aa·a — same token multiset), so round 2's top
    pair is 'a aa' (count 3 = one per word), won over 'aa a' by the
    space-anchored string order."""
    text = " ".join(["aaaaa"] * 3)
    got = [
        (r.merge_rank, r.pair, r.cnt)
        for r in bpe_train(_docs(spark, text), n_merges=2).orderBy("merge_rank").collect()
    ]
    # round 1: 4 adjacent (a,a) pairs per word x freq 3 = 12
    assert got == [(1, "a a", 12), (2, "a aa", 3)]


def test_segment_docs_round_trip_and_boundaries(spark):
    """Encode with trained merges: segmentation equals the training
    segmentation per word, merges never cross the '|' word boundary,
    and out-of-vocab words still get the learned merges."""
    from ksql_streams_from_schema_converter_spark.operators.bpe import (
        bpe_segment_docs,
    )

    train_text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    merges = [
        r.pair
        for r in bpe_train(_docs(spark, train_text), n_merges=3)
        .orderBy("merge_rank")
        .collect()
    ]
    assert merges == ["e s", "es t", "l o"]
    # apply to a doc with a trained word, an out-of-vocab word that
    # contains trained merges (bestest -> b est est), and a boundary
    # case: 'files test' must NOT merge the cross-word 's t'
    out = bpe_segment_docs(
        _docs(spark, "newest bestest, files test!"), merges
    ).head()
    # newest -> n e w est (4), bestest -> b est est (3),
    # files -> f i l e s? 'e s'->es: f i l es (4), test -> t est (2)
    assert out.n_base_symbols == 22  # letters only (6+7+5+4)
    assert out.n_tokens == 4 + 3 + 4 + 2
    assert len(out.seg_fp) == 32


def test_bpe_merge_store_lifecycle(spark, tmp_path):
    """Persistence discipline for the BPE family (VERDICT r10 #5 —
    the wordpiece store contract): torn saves are invisible, replay
    overwrites idempotently, load without seq returns the highest
    committed version, and ORDER round-trips (BPE's artifact is the
    ordered merge list)."""
    import os

    from ksql_streams_from_schema_converter_spark.operators.bpe import (
        BPE_SUB,
        load_bpe_merges,
        save_bpe_merges,
    )
    from ksql_streams_from_schema_converter_spark.operators.indexstore import (
        ingest_paths,
    )

    store = str(tmp_path / "bpe")
    merges = ["t h", "th e", "a n"]  # order is the artifact
    save_bpe_merges(spark, store, merges, seq=0)
    assert load_bpe_merges(spark, store) == (merges, "b0")
    # torn save: data lands for b1 but no manifest commit -> invisible
    torn = ingest_paths(store, BPE_SUB, ["b1"])[0]
    spark.createDataFrame(
        [(1, "zz zz")], "merge_rank long, pair string"
    ).write.mode("overwrite").parquet(torn)
    assert os.path.exists(torn)
    assert load_bpe_merges(spark, store) == (merges, "b0")
    # committed b1 becomes latest; seq=0 still addressable
    save_bpe_merges(spark, store, merges[:1], seq=1)
    assert load_bpe_merges(spark, store) == (merges[:1], "b1")
    assert load_bpe_merges(spark, store, seq=0) == (merges, "b0")
    # replay idempotence: re-saving seq=1 replaces it
    save_bpe_merges(spark, store, merges[:2], seq=1)
    assert load_bpe_merges(spark, store) == (merges[:2], "b1")
    # missing version is a hard error, not a silent empty tokenizer
    import pytest as _pytest

    with _pytest.raises(ValueError):
        load_bpe_merges(spark, store, seq=7)
