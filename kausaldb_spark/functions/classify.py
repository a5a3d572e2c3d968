"""Trained quality classification — the learned counterpart of
``text.quality_columns``'s heuristics. Modern curation pipelines pair rule
filters with a lightweight linear classifier over hashed token features
(the fasttext-style "looks like reference text" model used to select
pretraining data); this is that component on Spark MLlib.

Scale shape: featurization is HashingTF over the token array (fixed-width
sparse vectors, no vocabulary shuffle — the same hashed-feature trick DSIR
uses), LBFGS logistic regression trains in a handful of distributed passes,
and scoring is a single model.transform projection. Training labels come
from whatever weak supervision is available — by default the repo's own
heuristic ``quality_flag`` (bootstrap), or a caller-provided labeled frame
(e.g. "wikipedia vs crawl" source labels, the common practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kausaldb_spark.functions import text as tx

N_FEATURES = 16_384


def _featurize(docs: DataFrame, text_col: str):
    from pyspark.ml.feature import HashingTF

    toks = docs.withColumn("_toks", tx.tokens(F.col(text_col)))
    tf = HashingTF(
        inputCol="_toks", outputCol="_features", numFeatures=N_FEATURES
    )
    return tf.transform(toks)


def train_quality_classifier(
    docs: DataFrame, label_col: str | None = None,
    text_col: str = "text", max_iter: int = 20, reg_param: float = 1e-3,
):
    """Fit the linear quality model. ``label_col`` names a 0/1 column on
    ``docs``; when None, the heuristic ``text.quality_flag`` provides weak
    labels (self-training bootstrap). Returns the fitted MLlib model."""
    from pyspark.ml.classification import LogisticRegression

    if label_col is None:
        qc = tx.quality_columns(F.col(text_col))
        docs = docs.withColumn("_label", tx.quality_flag(qc).cast("double"))
        label_col = "_label"
    else:
        docs = docs.withColumn("_label", F.col(label_col).cast("double"))
        label_col = "_label"
    feats = _featurize(docs, text_col)
    lr = LogisticRegression(
        featuresCol="_features", labelCol=label_col,
        maxIter=max_iter, regParam=reg_param, standardization=False,
    )
    model = lr.fit(feats)
    # A freshly-fit model carries a training summary that references the
    # SparkSession; if that object reaches a scoring task closure, the job
    # dies with "Task not serializable: ObservationManager" (observed
    # intermittently under full-suite load). Persist+reload strips the
    # summary — and matches reality: at scale the classifier is always a
    # saved artifact, not an in-memory fit.
    import shutil
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel

    path = tempfile.mkdtemp(prefix="kdb_quality_lr_")
    try:
        model.write().overwrite().save(path)
        return LogisticRegressionModel.load(path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def score_quality(
    model, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Score docs with a fitted model: (id, p_good double, pred int).
    One projection — vectorized JVM-side, no Python boundary."""
    from pyspark.ml.functions import vector_to_array

    feats = _featurize(docs, text_col)
    out = model.transform(feats)
    return out.select(
        F.col(id_col),
        vector_to_array(F.col("probability")).getItem(1).alias("p_good"),
        F.col("prediction").cast("int").alias("pred"),
    )
