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
    (id_l, id_r, label, pred) with pred = same-cluster.

    Round 6: both sides fetch from the SAME unaliased clusters subtree
    (alias after selection) so runtime exchange reuse builds the broadcast
    once — the per-side aliased selects defeated reuse (see
    features.pair_features for the measured rationale)."""
    cl = clusters.alias("_cl")
    cr = clusters.alias("_cr")
    out = labeled_ids.join(
        cl, labeled_ids.id_l == F.col("_cl.record_id"), "left"
    ).join(cr, labeled_ids.id_r == F.col("_cr.record_id"), "left")
    return out.withColumn(
        "pred",
        (
            F.col("_cl.cluster_id").isNotNull()
            & F.col("_cr.cluster_id").isNotNull()
            & (F.col("_cl.cluster_id") == F.col("_cr.cluster_id"))
        ).cast("int"),
    ).select("id_l", "id_r", "label", "pred")


def labeled_pairs_to_ids(labeled_urls: DataFrame, offers: DataFrame) -> DataFrame:
    """(url_l, url_r, label) -> (id_l, id_r, label) via the offers url->id map.
    Pairs whose urls were filtered out of offers (lang gate) are dropped."""
    # Shared subtree for both url fetches (one broadcast build, see
    # cluster_predictions / features.pair_features).
    ids = offers.select("url", "record_id")
    il, ir = ids.alias("_il"), ids.alias("_ir")
    out = labeled_urls.join(il, labeled_urls.url_l == F.col("_il.url")).join(
        ir, labeled_urls.url_r == F.col("_ir.url")
    )
    return out.select(
        F.least(F.col("_il.record_id"), F.col("_ir.record_id")).alias("id_l"),
        F.greatest(F.col("_il.record_id"), F.col("_ir.record_id")).alias("id_r"),
        F.col("label").cast("int").alias("label"),
    ).dropDuplicates(["id_l", "id_r"])
