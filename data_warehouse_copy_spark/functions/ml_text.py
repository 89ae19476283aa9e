"""Spark ML text-classification pipeline (extension surface).

The EDBT'16 Spark-Twitter-sentiment pattern (see PAPERS.md) applied to the
fixtures: tokenize → HashingTF → IDF → LogisticRegression, trained to
predict a document label (the fixtures carry a ``lang`` label; the same
pipeline shape serves sentiment/quality/topic given other labels).

All stages are stock ``pyspark.ml`` — distributed fit (gradient updates via
treeAggregate) and a transform that is a pure projection, so scoring 100 TB
is embarrassingly parallel. Contrast with :mod:`text`'s marker heuristic:
that one is SQL-oracle-checkable; this one is the learned path.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer, StringIndexer
from pyspark.sql import DataFrame


def build_text_classifier(
    text_col: str = "text",
    label_col: str = "lang",
    num_features: int = 1 << 14,
) -> Pipeline:
    return Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="_tokens", pattern=r"\s+"
            ),
            HashingTF(
                inputCol="_tokens", outputCol="_tf", numFeatures=num_features
            ),
            IDF(inputCol="_tf", outputCol="_features"),
            StringIndexer(inputCol=label_col, outputCol="_label"),
            LogisticRegression(
                featuresCol="_features", labelCol="_label", maxIter=20, regParam=0.01
            ),
        ]
    )


def train_language_classifier(docs: DataFrame) -> PipelineModel:
    """Fit the TF-IDF + logistic-regression language classifier on the
    documents table (label column ``lang``)."""
    return build_text_classifier().fit(docs)


def predicted_labels(model: PipelineModel, docs: DataFrame) -> DataFrame:
    """Score documents; returns (doc_id, lang, predicted_lang)."""
    indexer = next(
        s for s in model.stages if s.__class__.__name__ == "StringIndexerModel"
    )
    labels = indexer.labels
    scored = model.transform(docs)
    from pyspark.sql import functions as F

    label_arr = F.array(*[F.lit(x) for x in labels])
    return scored.select(
        "doc_id",
        "lang",
        F.element_at(label_arr, F.col("prediction").cast("int") + 1).alias(
            "predicted_lang"
        ),
    )
