"""Learned quality filtering: a fasttext-style linear classifier over
hashed token features, trained and applied with Spark ML.

The heuristic quality signals (operators/text.py: quality_flags,
gopher_flags) are rule banks; production corpus curation typically adds
a LEARNED filter — a cheap linear model over hashed bag-of-words,
scored per document at full corpus scale (the CCNet/fasttext pattern:
"looks like Wikipedia" vs "looks like raw crawl"). This module is that
path on Spark:

- featurize: tokens -> HashingTF (2^18-dim sparse vectors, feature
  hashing needs no vocabulary pass — one scan, no shuffle).
- train_quality_model: LogisticRegression on a labeled (or
  weak-labeled) sample. Training happens on a SAMPLE; scoring is the
  corpus-scale pass.
- weak_labels: distant supervision from the heuristic rule banks, so a
  model can bootstrap with zero hand labels (label = passes all
  structural rules).
- score_quality: adds p(good) to every document — one narrow ML
  transform, broadcastable model coefficients.

At 100 TB: featurize+score is a map-only pipeline (no shuffle, model
broadcast by Spark ML); training reads only the labeled sample.
No reference analogue (corpus-curation addition); not SQL-expressible,
so covered by pytest (AUC floor, determinism, schema) rather than a
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_wrap_spark.operators.text import quality_flags, tokens

FEATURE_DIM = 1 << 18


def featurize(df: DataFrame, text_col: str = "text", dim: int = FEATURE_DIM) -> DataFrame:
    """Add a `features` sparse vector: hashed unigram counts (feature
    hashing — stateless, so train/score featurization cannot drift)."""
    from pyspark.ml.feature import HashingTF

    toks = df.withColumn("__toks", tokens(text_col))
    tf = HashingTF(inputCol="__toks", outputCol="features", numFeatures=dim)
    return tf.transform(toks).drop("__toks")


def weak_labels(df: DataFrame, text_col: str = "text", out_col: str = "label") -> DataFrame:
    """Distant supervision: label 1.0 iff the document passes every
    structural quality rule (quality_flags empty), else 0.0."""
    return df.withColumn(
        out_col, F.when(quality_flags(text_col) == "", F.lit(1.0)).otherwise(F.lit(0.0))
    )


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = FEATURE_DIM,
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit the linear quality model on a labeled sample → LR model
    (coefficients broadcast at scoring time)."""
    from pyspark.ml.classification import LogisticRegression

    feats = featurize(labeled, text_col, dim)
    lr = LogisticRegression(
        featuresCol="features", labelCol=label_col, regParam=reg_param, maxIter=max_iter
    )
    return lr.fit(feats)


def score_quality(
    df: DataFrame, model, text_col: str = "text", out_col: str = "quality_score", dim: int | None = None
) -> DataFrame:
    """Corpus-scale scoring pass: adds p(good) in [0,1]. Map-only — the
    model rides to executors as a broadcast; no shuffle."""
    from pyspark.ml.functions import vector_to_array

    d = dim or model.numFeatures
    feats = featurize(df, text_col, d)
    scored = model.transform(feats)
    return scored.withColumn(
        out_col, vector_to_array("probability").getItem(1)
    ).drop("features", "rawPrediction", "probability", "prediction")
