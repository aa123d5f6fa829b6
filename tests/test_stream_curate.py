"""Streaming curation (streaming/curate_stream.py): drained-stream ==
one-shot funnel equivalence on id-ordered arrival, one-representative-per-
group invariant under arbitrary arrival, and foreachBatch redelivery
idempotence."""

import os
import time

import pytest
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark.plans import curate as CUR
from entity_matching_in_online_retail_spark.streaming import curate_stream as CS

CFG = CUR.CurateConfig(sample_permille=800)
DOCS_DDL = "doc_id bigint, text string"


def _corpus(spark):
    """sf0.001 documents + planted exact dups at higher ids (cross-batch
    groups once split by id): doc 10000+i duplicates doc i for i % 11 == 0."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    dups = docs.where(F.pmod("doc_id", F.lit(11)) == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    return docs.unionAll(dups)


def _write_batches(spark, corpus, tmp_path, splits):
    """Write corpus slices as separate files in a landing dir, in order."""
    landing = os.path.join(str(tmp_path), "landing")
    os.makedirs(landing)
    for i, (lo, hi) in enumerate(splits):
        part = corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        part.coalesce(1).write.parquet(os.path.join(landing, f"b{i}"))
    # file source reads subdirs' files via glob
    return os.path.join(landing, "*")


def _drain(spark, pattern, workdir, tmp_path):
    q = CS.stream_curate(
        spark,
        pattern,
        workdir,
        os.path.join(str(tmp_path), "ckpt"),
        schema=DOCS_DDL,
        cfg=CFG,
        max_files_per_trigger=1,  # force multiple micro-batches
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_equals_oneshot_on_ordered_arrival(spark, tmp_path):
    corpus = _corpus(spark)
    pattern = _write_batches(
        spark, corpus, tmp_path, [(0, 20), (20, 50), (50, 20000)]
    )
    wd = os.path.join(str(tmp_path), "wd")
    _drain(spark, pattern, wd, tmp_path)
    streamed = {r["doc_id"] for r in CS.read_kept(spark, wd).collect()}
    oneshot = {r["doc_id"] for r in CUR.curate(corpus, None, CFG).collect()}
    assert streamed == oneshot and streamed


def test_one_representative_per_group_any_order(spark, tmp_path):
    corpus = _corpus(spark)
    # Reverse-ordered batches: the dup (id+10000) arrives BEFORE the
    # original, so the stream keeps the dup as the group representative.
    pattern = _write_batches(
        spark, corpus, tmp_path, [(10000, 20000), (0, 10000)]
    )
    wd = os.path.join(str(tmp_path), "wd")
    _drain(spark, pattern, wd, tmp_path)
    kept = CS.read_kept(spark, wd)
    kept_with_md5 = kept.withColumn("m", F.md5("text"))
    per_group = kept_with_md5.groupBy("m").count().where(F.col("count") > 1)
    assert per_group.isEmpty()
    # The kept GROUP SET matches one-shot even though representatives differ.
    oneshot = CUR.curate(corpus, None, CFG)
    # Sampling is id-deterministic, so representative choice changes which
    # groups pass the sample; compare pre-sampling group sets instead.
    no_sample = CUR.CurateConfig(sample_permille=1000)
    wd2 = os.path.join(str(tmp_path), "wd2")
    pattern2 = _write_batches(
        spark, corpus, tmp_path / "second", [(10000, 20000), (0, 10000)]
    )
    q = CS.stream_curate(
        spark, pattern2, wd2, os.path.join(str(tmp_path), "ckpt2"),
        schema=DOCS_DDL, cfg=no_sample, max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    streamed_groups = {
        r["m"]
        for r in CS.read_kept(spark, wd2).withColumn("m", F.md5("text")).select("m").distinct().collect()
    }
    oneshot_groups = {
        r["m"]
        for r in CUR.curate(corpus, None, no_sample)
        .withColumn("m", F.md5("text")).select("m").distinct().collect()
    }
    assert streamed_groups == oneshot_groups


def test_redelivery_is_noop(spark, tmp_path):
    corpus = _corpus(spark).where(F.col("doc_id") < 100)
    wd = os.path.join(str(tmp_path), "wd")
    CS.apply_curate_batch(spark, wd, corpus, 0, CFG)
    kept1 = sorted(r["doc_id"] for r in CS.read_kept(spark, wd).collect())
    seen1 = sorted(
        r["md5"] for r in CS._read_seen(spark, wd).collect()
    )
    mtime = os.path.getmtime(CS._marker(wd, 0))
    CS.apply_curate_batch(spark, wd, corpus, 0, CFG)  # redelivery
    kept2 = sorted(r["doc_id"] for r in CS.read_kept(spark, wd).collect())
    seen2 = sorted(r["md5"] for r in CS._read_seen(spark, wd).collect())
    assert kept1 == kept2 and seen1 == seen2
    assert os.path.getmtime(CS._marker(wd, 0)) == mtime  # skipped wholesale


def test_crash_window_redelivery_recovers(spark, tmp_path):
    # Crash AFTER the kept/seen writes but BEFORE the marker: the seen
    # store must not include the uncommitted batch's own md5s, or the
    # redelivery anti-joins its own keepers away and commits an EMPTY
    # batch (the reproduced data-loss bug this pins).
    b0 = _corpus(spark).where(F.col("doc_id") < 20)
    b1 = _corpus(spark).where((F.col("doc_id") >= 20) & (F.col("doc_id") < 60))
    wd = os.path.join(str(tmp_path), "wd")
    CS.apply_curate_batch(spark, wd, b0, 0, CFG)
    CS.apply_curate_batch(spark, wd, b1, 1, CFG)
    kept_before = sorted(r["doc_id"] for r in CS.read_kept(spark, wd).collect())
    os.remove(CS._marker(wd, 1))  # simulate the crash window
    CS.apply_curate_batch(spark, wd, b1, 1, CFG)  # redelivery
    kept_after = sorted(r["doc_id"] for r in CS.read_kept(spark, wd).collect())
    assert kept_after == kept_before and kept_before


def test_report_counts_cross_batch_dups(spark, tmp_path):
    import json

    docs = _corpus(spark).where(F.col("doc_id") < 20)
    dup = docs.select((F.col("doc_id") + 500).alias("doc_id"), "text")
    wd = os.path.join(str(tmp_path), "wd")
    no_sample = CUR.CurateConfig(sample_permille=1000)
    CS.apply_curate_batch(spark, wd, docs, 0, no_sample)
    CS.apply_curate_batch(spark, wd, dup, 1, no_sample)
    with open(os.path.join(CS._batch_dir(wd, "kept", 1), "_report.json")) as f:
        rep = json.load(f)["stages"]
    # every batch-1 doc that reached dedup is a cross-batch exact_dup
    assert rep.get("kept", 0) == 0 and rep.get("exact_dup", 0) > 0
    # summed per-batch 'kept' agrees with the accumulated corpus
    with open(os.path.join(CS._batch_dir(wd, "kept", 0), "_report.json")) as f:
        rep0 = json.load(f)["stages"]
    assert rep0.get("kept", 0) == CS.read_kept(spark, wd).count()


def test_read_kept_before_first_commit_raises(spark, tmp_path):
    import pytest as _pt

    with _pt.raises(ValueError, match="no committed"):
        CS.read_kept(spark, os.path.join(str(tmp_path), "fresh_wd"))


def test_near_dup_config_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="near-dup"):
        CS.apply_curate_batch(
            spark,
            os.path.join(str(tmp_path), "wd"),
            _corpus(spark).limit(1),
            0,
            CUR.with_near_dup(CFG, 0.8),
        )
