"""Model-based corpus quality scoring — the fasttext-style hashed
n-gram linear classifier of the CCNet / C4 / GPT-3 data pipelines
(r14 verdict ask #3): train a logistic model over hashed word uni+bigram
counts on a labeled slice ("looks like the reference corpus" vs "looks
like crawl junk"), then score the whole corpus scan-side.

Spark-first shape:
- Featurization is pure JVM: tokenization and bigram construction are
  Catalyst higher-order functions; the hashed bag-of-ngrams is
  `pyspark.ml.feature.HashingTF` (a Scala transformer — the hashing
  trick caps the feature space at `n_features` regardless of
  vocabulary, which is what makes the model shippable to 100 TB).
- The fit is `spark.ml` LogisticRegression: one distributed L-BFGS
  loop whose per-iteration cost is a treeAggregate over the TRAINING
  slice only — and the training slice is hard-capped (`train_cap`,
  deterministic hash-mod downsample, the same discipline as the
  KMeans fits in `similarity.py`): quality classifiers are trained on
  thousands-to-millions of labels, never the corpus.
- Scoring is `model.transform` — a JVM map-side projection (sparse
  dot product + sigmoid) that fuses into the scan; no Python touches
  the hot path, no shuffle is introduced.

The heuristic gate (`text.quality_filter`) and this model compose:
the heuristic is the label bootstrap and the fallback; the model
generalizes beyond hand rules. No reference analog — north-star
surface (the reference's 432-line ETL has no scoring;
fetch_and_post.py has no text features at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N_FEATURES = 1 << 18


def text_feature_tokens(col: Column) -> Column:
    """Lowercased word unigrams + joined bigrams, all Catalyst HOFs
    (no Python): the fasttext feature recipe. Empty/short texts yield
    what they can (0 or 1 tokens -> no bigrams)."""
    toks = F.filter(
        F.split(F.lower(col), "[^a-z0-9']+"), lambda t: t != F.lit("")
    )
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def hashed_text_features(
    docs: DataFrame,
    text_col: str = "text",
    n_features: int = DEFAULT_N_FEATURES,
    out_col: str = "features",
) -> DataFrame:
    """Append the hashed bag-of-ngrams vector column. Kept as a
    separate step so fit and score share one featurizer (a train/serve
    skew here silently destroys the model)."""
    from pyspark.ml.feature import HashingTF

    with_toks = docs.withColumn(
        "__qm_toks", text_feature_tokens(F.col(text_col))
    )
    tf = HashingTF(
        inputCol="__qm_toks", outputCol=out_col, numFeatures=n_features
    )
    return tf.transform(with_toks).drop("__qm_toks")


def fit_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    n_features: int = DEFAULT_N_FEATURES,
    train_cap: int = 200_000,
    max_iter: int = 50,
    reg_param: float = 1e-4,
):
    """Fit the hashed-ngram logistic quality model on `labeled`
    (id, text, label in {0,1}). The training slice is capped at
    `train_cap` rows by a deterministic xxhash64-mod downsample (seed-
    free, replayable) BEFORE the iterative fit, so fit cost is bounded
    no matter how many labels exist. Returns the fitted
    LogisticRegressionModel."""
    from pyspark.ml.classification import LogisticRegression

    n = labeled.count()
    if n > train_cap:
        m = -(-n // train_cap)  # ceil
        labeled = labeled.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(m)) == 0
        )
    feats = hashed_text_features(labeled, text_col, n_features)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    return lr.fit(feats.select("features", label_col))


def score_quality(
    model,
    docs: DataFrame,
    text_col: str = "text",
    n_features: int = DEFAULT_N_FEATURES,
    prob_col: str = "quality_prob",
) -> DataFrame:
    """Corpus scoring: append P(label=1 | text) as `prob_col`. The
    whole path (hashing, dot product, sigmoid, vector_to_array) is
    JVM-side and map-only — it fuses into the scan and adds no
    shuffle."""
    from pyspark.ml.functions import vector_to_array

    feats = hashed_text_features(docs, text_col, n_features)
    scored = model.transform(feats)
    return scored.withColumn(
        prob_col, vector_to_array(F.col("probability")).getItem(1)
    ).drop("features", "rawPrediction", "probability", "prediction")


def quality_model_auc(
    model,
    held_out: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = DEFAULT_N_FEATURES,
) -> float:
    """Held-out ROC AUC — the acceptance gate a production scorer
    ships against."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    feats = hashed_text_features(held_out, text_col, n_features)
    pred = model.transform(feats)
    ev = BinaryClassificationEvaluator(
        labelCol=label_col, rawPredictionCol="rawPrediction",
        metricName="areaUnderROC",
    )
    return float(ev.evaluate(pred))
