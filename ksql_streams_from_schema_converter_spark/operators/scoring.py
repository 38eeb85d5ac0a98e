"""Model-inference scoring stage: the batch-inference layout every
training-data pipeline needs (quality classifiers, teacher scoring,
reward models) expressed the way it runs at 100 TB.

The execution shape is the real one — Arrow-batched ``mapInPandas``
with the model shipped once per task as a closure constant, one
vectorized forward pass per batch (numpy here; a real deployment swaps
in an ONNX/torch session initialized per partition, NOT per row).
The bundled model is a deterministic logistic regression over exact
integer text features, so the whole stage stays oracle-checkable: the
same features and the same closed-form sigmoid are expressible in SQL,
and the score rounds to a stable value on both engines.

Feature extraction happens in Spark expressions BEFORE the Python
boundary — only the (tiny) numeric feature columns cross into Arrow,
never the text. At 100 TB that is the difference between shipping
~10 bytes/row and shipping the corpus into Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import stopword_count, token_count

#: Deterministic "quality classifier" weights: (bias, w_tokens, w_stop).
#: Frozen constants — the point is the inference shape, not the model.
QUALITY_WEIGHTS = (-2.0, 0.03, 0.5)


def extract_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact integer features, computed JVM-side (scan→project only)."""
    return docs.select(
        F.col(id_col),
        token_count(text_col).alias("f_tokens"),
        stopword_count(text_col).alias("f_stopwords"),
    )


def batch_score(
    features: DataFrame,
    weights: tuple[float, float, float] = QUALITY_WEIGHTS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score feature rows with a vectorized model forward pass per
    Arrow batch. Output: (id, score) with ``score`` rounded to 6
    decimals — sigmoid is closed-form, so cross-engine float agreement
    holds far beyond 6 places."""
    import numpy as np
    from pyspark.sql import types as T

    b, w1, w2 = weights
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def forward(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            z = b + w1 * pdf["f_tokens"].to_numpy(dtype="float64") + w2 * pdf[
                "f_stopwords"
            ].to_numpy(dtype="float64")
            yield pdf[[id_col]].assign(score=np.round(1.0 / (1.0 + np.exp(-z)), 6))

    return features.mapInPandas(forward, schema=out_schema)


def score_documents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """extract_features → batch_score, the standard two-stage layout."""
    return batch_score(extract_features(docs, text_col, id_col), id_col=id_col)
