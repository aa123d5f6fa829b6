"""Pairwise evaluation (G6): precision / recall / F1 on labeled pairs.

The reference's only transferable correctness artifact is this protocol:
predictions vs gold labels on held-out pairs. Two prediction modes:
  - classifier: pred = score >= tau on the pair's features
  - cluster:    pred = (cluster_id_l == cluster_id_r) after transitive closure
The north rule's F1 >= 0.99 gate is asserted in tests/test_pipeline_e2e.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PairMetrics:
    tp: int
    fp: int
    fn: int
    tn: int

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if (self.tp + self.fp) else 0.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if (self.tp + self.fn) else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0


def confusion(labeled_preds: DataFrame, pred_col: str = "pred", label_col: str = "label") -> PairMetrics:
    row = labeled_preds.agg(
        F.sum(((F.col(pred_col) == 1) & (F.col(label_col) == 1)).cast("long")).alias("tp"),
        F.sum(((F.col(pred_col) == 1) & (F.col(label_col) == 0)).cast("long")).alias("fp"),
        F.sum(((F.col(pred_col) == 0) & (F.col(label_col) == 1)).cast("long")).alias("fn"),
        F.sum(((F.col(pred_col) == 0) & (F.col(label_col) == 0)).cast("long")).alias("tn"),
    ).first()
    return PairMetrics(
        tp=int(row["tp"] or 0), fp=int(row["fp"] or 0),
        fn=int(row["fn"] or 0), tn=int(row["tn"] or 0),
    )


def cluster_predictions(labeled_ids: DataFrame, clusters: DataFrame) -> DataFrame:
    """labeled_ids(id_l, id_r, label) x clusters(record_id, cluster_id) ->
    (id_l, id_r, label, pred) with pred = same-cluster."""
    cl = clusters.select(
        F.col("record_id").alias("id_l"), F.col("cluster_id").alias("c_l")
    )
    cr = clusters.select(
        F.col("record_id").alias("id_r"), F.col("cluster_id").alias("c_r")
    )
    out = labeled_ids.join(cl, "id_l", "left").join(cr, "id_r", "left")
    return out.withColumn(
        "pred",
        (
            F.col("c_l").isNotNull()
            & F.col("c_r").isNotNull()
            & (F.col("c_l") == F.col("c_r"))
        ).cast("int"),
    ).select("id_l", "id_r", "label", "pred")


def labeled_pairs_to_ids(labeled_urls: DataFrame, offers: DataFrame) -> DataFrame:
    """(url_l, url_r, label) -> (id_l, id_r, label) via the offers url->id map.
    Pairs whose urls were filtered out of offers (lang gate) are dropped."""
    ids = offers.select("url", "record_id")
    out = (
        labeled_urls.join(ids.withColumnRenamed("url", "url_l"), "url_l")
        .withColumnRenamed("record_id", "_idl")
        .join(ids.withColumnRenamed("url", "url_r"), "url_r")
        .withColumnRenamed("record_id", "_idr")
    )
    return out.select(
        F.least("_idl", "_idr").alias("id_l"),
        F.greatest("_idl", "_idr").alias("id_r"),
        F.col("label").cast("int").alias("label"),
    ).dropDuplicates(["id_l", "id_r"])
