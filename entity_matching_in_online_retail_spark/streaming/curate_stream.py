"""Continuous corpus curation: a documents file stream curated micro-batch
by micro-batch through the SAME funnel the batch path uses
(plans/curate.py), with a cross-batch exact-dedup store.

Stage semantics across batch boundaries:

- lang / quality / repetition / contamination / sampling are pure
  per-document functions — batch boundaries cannot change their verdicts.
- exact-dedup is the one cross-batch-stateful stage. The store records the
  md5 of every document that REACHED the dedup stage and won its group
  within its batch (the batch keepers) — NOT merely the kept documents.
  This is what keeps streaming label-equivalent to one-shot: in the batch
  funnel a duplicate of a keeper is 'exact_dup' even when the keeper
  itself is later sampled out; recording only kept md5s would let a later
  copy of a sampled-out keeper resurrect.
- near-dedup is out of scope for the stream (cross-batch near-dup needs
  the incremental-ER machinery, not a hash store); a config with
  near_dup_threshold set is rejected.

Keeper identity: one-shot keeps min(doc_id) per md5 group; the stream
keeps the first-arriving batch's within-batch minimum. When files land in
id order (the normal append-only producer), the two coincide exactly
(tested); under arbitrary arrival order the kept SET still contains
exactly one representative per group (tested), just not always the
globally-minimal id.

Crash/redelivery contract (same shape as plans/append.py): every applied
micro-batch persists

    <workdir>/kept/batch-NNNN/     the batch's curated output
    <workdir>/seen/batch-NNNN/     md5s of the batch's new keepers
    <workdir>/kept/batch-NNNN/_COMMITTED   (strictly last)

foreachBatch re-delivers a batch id after a crash; a marker-bearing batch
is skipped wholesale, and because the marker is written only after both
stores, a half-written batch re-runs from its inputs (overwrite mode) to
the identical result — re-delivery is a no-op on state (tested).

The seen store grows one directory per batch; fold it the way
plans/append.py compacts increments if batch counts grow unbounded.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import curate as CUR


def _batch_dir(workdir: str, store: str, batch_id: int) -> str:
    return os.path.join(workdir, store, f"batch-{batch_id:04d}")


def _marker(workdir: str, batch_id: int) -> str:
    return os.path.join(_batch_dir(workdir, "kept", batch_id), "_COMMITTED")


def _read_seen(spark: SparkSession, workdir: str) -> DataFrame | None:
    seen_root = os.path.join(workdir, "seen")
    if not os.path.isdir(seen_root):
        return None
    dirs = [
        os.path.join(seen_root, d)
        for d in sorted(os.listdir(seen_root))
        if d.startswith("batch-")
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs).select("md5").distinct()


def apply_curate_batch(
    spark: SparkSession,
    workdir: str,
    batch_df: DataFrame,
    batch_id: int,
    cfg: CUR.CurateConfig = CUR.CurateConfig(),
    benchmark: DataFrame | None = None,
) -> None:
    """Curate one micro-batch against the workdir's cross-batch state.

    Callable directly (tests, backfills) or via stream_curate's
    foreachBatch. Idempotent per batch_id.
    """
    if cfg.near_dup_threshold is not None:
        raise ValueError(
            "streaming curation does not support the near-dup stage; "
            "run near_dup_groups over the accumulated kept corpus instead"
        )
    if os.path.exists(_marker(workdir, batch_id)):
        return  # redelivered batch: already fully applied

    id_c, txt = cfg.id_col, cfg.text_col
    labels = CUR.funnel_labels(batch_df, benchmark, cfg)
    joined = batch_df.join(labels, id_c).withColumn("_md5", F.md5(F.col(txt)))

    # Batch keepers: reached the dedup stage and won their within-batch
    # group — drop_stage is NULL (kept) or 'sampled_out' (keeper that lost
    # only the final per-doc coin flip; its md5 still blocks later copies).
    keepers = joined.where(
        F.col("drop_stage").isNull() | (F.col("drop_stage") == "sampled_out")
    )
    seen = _read_seen(spark, workdir)
    if seen is not None:
        keepers = keepers.join(
            F.broadcast(seen), keepers["_md5"] == seen["md5"], "left_anti"
        )
    keepers = keepers.localCheckpoint(eager=True)  # two sinks, one compute

    kept = keepers.where(F.col("drop_stage").isNull()).select(
        *CUR._output_cols(keepers.drop("_md5"), cfg)
    )
    kept.write.mode("overwrite").parquet(_batch_dir(workdir, "kept", batch_id))
    keepers.select(F.col("_md5").alias("md5")).distinct().write.mode(
        "overwrite"
    ).parquet(_batch_dir(workdir, "seen", batch_id))

    report = {
        r["stage"]: r["n_docs"]
        for r in CUR.funnel_metrics(labels, id_col=id_c).collect()
    }
    with open(
        os.path.join(_batch_dir(workdir, "kept", batch_id), "_report.json"), "w"
    ) as f:
        json.dump({"batch_id": batch_id, "stages": report}, f)
    with open(_marker(workdir, batch_id), "w") as f:
        f.write("ok")


def read_kept(spark: SparkSession, workdir: str) -> DataFrame:
    """The accumulated curated corpus across all committed batches."""
    kept_root = os.path.join(workdir, "kept")
    dirs = [
        os.path.join(kept_root, d)
        for d in sorted(os.listdir(kept_root))
        if d.startswith("batch-")
        and os.path.exists(os.path.join(kept_root, d, "_COMMITTED"))
    ]
    return spark.read.parquet(*dirs)


def stream_curate(
    spark: SparkSession,
    input_dir: str,
    workdir: str,
    checkpoint_dir: str,
    schema: str,
    cfg: CUR.CurateConfig = CUR.CurateConfig(),
    benchmark: DataFrame | None = None,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
):
    """Stream document files from `input_dir` through the curation funnel.

    Returns the started StreamingQuery. availableNow by default: drain the
    directory then stop (deterministic for tests / nightly-crawl cron);
    swap for processingTime on a live feed.
    """
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _apply(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_curate_batch(spark, workdir, batch_df, batch_id, cfg, benchmark)

    writer = docs.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
