"""Learned language-ID (VERDICT r11 #6, operators/langid.py): the
multiclass pocket perceptron genuinely learns the weak rule on a
separable planted corpus, the persisted round trip is lossless and
seq-addressed, and the all-zero state predicts the smallest class."""

import pytest
from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.langid import (
    apply_langid_classifier,
    langid_weights_table,
    load_langid_weights,
    save_langid_weights,
    train_langid_perceptron,
)
from ksql_streams_from_schema_converter_spark.operators.text import lang_id

#: tiny separable corpus: pure-stopword documents per language
_DOCS = (
    [(i, "the a and of to in is it that was") for i in range(8)]
    + [(10 + i, "der die das und ist nicht ein zu mit von") for i in range(8)]
    + [(20 + i, "le la les et est un une des que pour") for i in range(8)]
)


def _corpus(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_langid_learns_separable_rule(spark):
    """On pure-stopword documents the weak rule is linearly separable
    over hashed unigrams, so the pocket reaches ZERO training errors:
    every prediction equals the heuristic's label."""
    docs = _corpus(spark)
    w = train_langid_perceptron(docs, lang_id("text"), n_rounds=6)
    assert set(w) == {"de", "en", "fr"}
    pred = {
        r.doc_id: r.lang_pred
        for r in apply_langid_classifier(docs, w).collect()
    }
    want = {
        r.doc_id: r.lid
        for r in docs.select("doc_id", lang_id("text").alias("lid")).collect()
    }
    assert pred == want


def test_langid_roundtrip_seq_and_degenerate(spark, tmp_path):
    docs = _corpus(spark)
    w = train_langid_perceptron(docs, lang_id("text"), n_rounds=4)
    store = str(tmp_path / "lid")
    save_langid_weights(spark, store, w, seq=0)
    zeros = {lg: {b: 0 for b in wb} for lg, wb in w.items()}
    save_langid_weights(spark, store, zeros, seq=1)
    loaded, label = load_langid_weights(spark, store, seq=0)
    assert label == "lid0"
    assert loaded == w
    latest, latest_label = load_langid_weights(spark, store)
    assert latest_label == "lid1"
    # the all-zero state ties every score at 0 -> election picks the
    # lexicographically smallest class for every document
    degen = apply_langid_classifier(docs, latest)
    assert {r.lang_pred for r in degen.collect()} == {"de"}
    # frozen scoring equality: loaded == in-memory
    a = sorted(map(tuple, apply_langid_classifier(docs, loaded).collect()))
    b = sorted(map(tuple, apply_langid_classifier(docs, w).collect()))
    assert a == b


def test_langid_empty_store_and_guards(spark, tmp_path):
    with pytest.raises(ValueError):
        load_langid_weights(spark, str(tmp_path / "none"))
    with pytest.raises(ValueError):
        train_langid_perceptron(_corpus(spark), lang_id("text"), n_rounds=0)


def test_langid_weights_table_shape(spark):
    w = {"en": {0: 1, 1: -2}, "de": {0: 0, 1: 3}}
    rows = sorted(map(tuple, langid_weights_table(spark, w).collect()))
    assert rows == [("de", 0, 0), ("de", 1, 3), ("en", 0, 1), ("en", 1, -2)]


def test_char_ngrams_generalize_where_unigrams_fail(spark):
    """The VERDICT r12 #8 discriminating fixture: on the planted
    morphological corpus (every word a UNIQUE nonce base + a language
    suffix), a model trained on the even-id half and applied to the
    held-out odd half shows the fastText rationale structurally —
    hashed word unigrams of unseen words carry no learned signal
    (accuracy collapses to ~chance over 3 classes), while character
    n-grams ride the shared suffix morphology to perfect held-out
    accuracy.  Same training recurrence, only the feature family
    swapped."""
    from pyspark.sql import functions as F

    from ksql_streams_from_schema_converter_spark.operators.langid import (
        char_ngram_features,
    )
    from ksql_streams_from_schema_converter_spark.workload import (
        _cng_corpus,
        _cng_label,
    )

    corpus = _cng_corpus(spark, "/root/testdata/sf0.001").localCheckpoint()
    train = corpus.where(F.col("doc_id") % 2 == 0)
    hold = corpus.where(F.col("doc_id") % 2 == 1).localCheckpoint()
    lab = _cng_label()

    def _acc(w, feats):
        pred = apply_langid_classifier(hold, w, features=feats)
        j = pred.join(hold.select("doc_id", lab.alias("y")), "doc_id")
        return j.where("lang_pred = y").count() / j.count()

    w_uni = train_langid_perceptron(train, lab, n_rounds=6)
    w_chr = train_langid_perceptron(
        train, lab, n_rounds=6, features=char_ngram_features
    )
    assert _acc(w_chr, char_ngram_features) >= 0.95
    assert _acc(w_uni, None) <= 0.5
