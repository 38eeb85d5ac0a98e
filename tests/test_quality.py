"""Learned quality classifier (operators/quality.py): the batch
perceptron learns the weak-label rule from text features, integer
arithmetic stays exact, and the filter stage behaves."""

from pyspark.sql import functions as F

from ksql_streams_from_schema_converter_spark.operators.quality import (
    apply_quality_classifier,
    hashed_features,
    train_quality_perceptron,
    weights_table,
)


def _docs(spark, n=200):
    """Separable-by-content corpus: 'good' docs share a vocabulary of
    quality tokens, 'bad' docs a disjoint junk vocabulary; the weak
    label column mirrors the split (as metadata rules do, noisily at
    worst — here exactly, so learnability is provable)."""
    rows = []
    for i in range(n):
        good = i % 2 == 0
        vocab = (
            [f"signal{(i + k) % 7}" for k in range(8)]
            if good
            else [f"junk{(i + k) % 7}" for k in range(8)]
        )
        rows.append((i, " ".join(vocab), "en" if good else "xx", 300))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )


def test_perceptron_learns_a_separable_rule(spark):
    docs = _docs(spark)
    label = (F.col("lang") == "en") & (F.col("n_chars") >= 200)
    w = train_quality_perceptron(docs, label, n_rounds=3)
    out = {r.doc_id: r.keep for r in apply_quality_classifier(docs, w).collect()}
    # the learned gate reproduces the weak label from TEXT features
    # (the label columns never reach apply) on a separable corpus
    acc = sum(out[i] == (i % 2 == 0) for i in range(200)) / 200
    assert acc >= 0.95, acc
    # and it is not a degenerate always-keep / always-drop gate
    kept = sum(out.values())
    assert 0 < kept < 200, kept


def test_perceptron_generalizes_to_held_out_docs(spark):
    """Train on half the corpus, apply to the other half — the hashed
    features carry the signal, not the doc ids."""
    docs = _docs(spark, n=400)
    train = docs.where(F.col("doc_id") < 200)
    test = docs.where(F.col("doc_id") >= 200)
    label = (F.col("lang") == "en") & (F.col("n_chars") >= 200)
    w = train_quality_perceptron(train, label, n_rounds=3)
    out = {r.doc_id: r.keep for r in apply_quality_classifier(test, w).collect()}
    acc = sum(out[i] == (i % 2 == 0) for i in range(200, 400)) / 200
    assert acc >= 0.95, acc


def test_weights_are_bounded_integer_state(spark):
    """The collected state is n_buckets + 1 integers — the k-means-
    centroid shape, never corpus-sized — and every weight is an exact
    int (no float drift to diverge from the SQL oracle)."""
    docs = _docs(spark, n=60)
    w = train_quality_perceptron(
        docs, F.col("lang") == "en", n_rounds=2, n_buckets=64
    )
    assert set(w) == set(range(65))
    assert all(isinstance(v, int) for v in w.values())
    wt = weights_table(spark, w)
    assert wt.count() == 65 and dict(wt.dtypes) == {"b": "bigint", "w": "bigint"}


def test_bias_bucket_covers_empty_documents(spark):
    """Every document — even an empty text — has the bias feature, so
    apply() scores it instead of silently dropping it."""
    docs = spark.createDataFrame(
        [(0, "signal good text", "en", 300), (1, "", "xx", 0)],
        "doc_id long, text string, lang string, n_chars long",
    )
    feats = hashed_features(docs, n_buckets=16)
    per_doc = {r.doc_id: r.n for r in feats.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert per_doc[1] == 1  # bias only
    w = train_quality_perceptron(docs, F.col("lang") == "en", n_rounds=2, n_buckets=16)
    out = apply_quality_classifier(docs, w, n_buckets=16)
    assert out.count() == 2
